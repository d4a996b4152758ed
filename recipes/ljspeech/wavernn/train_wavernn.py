"""WaveRNN LJSpeech recipe
(reference recipes/ljspeech/wavernn/train_wavernn.py): autoregressive
sample-level RNN vocoder with mixture-of-logistics output."""

import os

from tts_tpu.trainer.trainer import Trainer, TrainerArgs
from tts_tpu.vocoder.configs import WavernnConfig
from tts_tpu.vocoder.dataset import load_wav_data
from tts_tpu.vocoder.models import setup_model

output_path = os.path.dirname(os.path.abspath(__file__))

config = WavernnConfig(
    batch_size=64,
    eval_batch_size=16,
    run_eval=True,
    epochs=10000,
    seq_len=1280,
    pad_short=2000,
    use_noise_augment=False,
    eval_split_size=10,
    print_step=25,
    print_eval=True,
    data_path=os.path.join(output_path, "../LJSpeech-1.1/wavs/"),
    output_path=output_path,
)

if __name__ == "__main__":
    eval_samples, train_samples = load_wav_data(config.data_path, config.eval_split_size)
    model = setup_model(config)
    trainer = Trainer(
        TrainerArgs(), config, output_path, model, train_samples, eval_samples
    )
    trainer.fit()
