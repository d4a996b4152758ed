"""HiFiGAN Thorsten-DE recipe
(reference recipes/thorsten_DE/hifigan/train_hifigan.py)."""

import os

from tts_tpu.trainer.trainer import Trainer, TrainerArgs
from tts_tpu.vocoder.configs import HifiganConfig
from tts_tpu.vocoder.dataset import load_wav_data
from tts_tpu.vocoder.models.gan import GAN

output_path = os.path.dirname(os.path.abspath(__file__))

config = HifiganConfig(
    batch_size=32,
    eval_batch_size=16,
    run_eval=True,
    epochs=1000,
    seq_len=8192,
    pad_short=2000,
    use_noise_augment=True,
    eval_split_size=10,
    print_step=25,
    lr_gen=1e-4,
    lr_disc=1e-4,
    data_path=os.path.join(output_path, "../thorsten-de/wavs/"),
    output_path=output_path,
)

if __name__ == "__main__":
    eval_samples, train_samples = load_wav_data(config.data_path, config.eval_split_size)
    model = GAN(config)
    trainer = Trainer(
        TrainerArgs(), config, output_path, model, train_samples, eval_samples
    )
    trainer.fit()
