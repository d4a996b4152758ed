"""WaveGrad LJSpeech recipe
(reference recipes/ljspeech/wavegrad/train_wavegrad.py): score-based
diffusion vocoder; tune the inference noise schedule afterwards with
``python -m tts_tpu.bin.tune_wavegrad``."""

import os

from tts_tpu.trainer.trainer import Trainer, TrainerArgs
from tts_tpu.vocoder.configs import WavegradConfig
from tts_tpu.vocoder.dataset import load_wav_data
from tts_tpu.vocoder.models import setup_model

output_path = os.path.dirname(os.path.abspath(__file__))

config = WavegradConfig(
    batch_size=32,
    eval_batch_size=16,
    run_eval=True,
    epochs=1000,
    seq_len=6144,
    pad_short=2000,
    use_noise_augment=True,
    eval_split_size=50,
    print_step=50,
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
