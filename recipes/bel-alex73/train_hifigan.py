"""Belarusian HiFiGAN recipe (reference recipes/bel-alex73/train_hifigan.py):
vocoder for the bel-alex73 GlowTTS, sharing its audio normalisation stats."""

import os

from tts_tpu.trainer.trainer import Trainer, TrainerArgs
from tts_tpu.vocoder.configs import HifiganConfig
from tts_tpu.vocoder.dataset import load_wav_data
from tts_tpu.vocoder.models.gan import GAN

output_path = os.environ.get("BEL_OUTPUT_PATH", os.path.dirname(os.path.abspath(__file__)))
dataset_path = os.environ.get("BEL_DATASET_PATH", os.path.join(output_path, "filtered_dataset"))

config = HifiganConfig(
    batch_size=74,
    eval_batch_size=16,
    run_eval=True,
    epochs=1000,
    seq_len=8192,
    pad_short=2000,
    use_noise_augment=False,
    eval_split_size=30,
    print_step=25,
    print_eval=True,
    data_path=os.path.join(dataset_path, "wavs"),
    output_path=output_path,
)
config.audio.mel_fmin = 50
config.audio.mel_fmax = 8000
config.audio.hop_length = 256
config.audio.stats_path = os.path.join(dataset_path, "scale_stats.npy")

if __name__ == "__main__":
    eval_samples, train_samples = load_wav_data(config.data_path, config.eval_split_size)
    model = GAN(config)
    trainer = Trainer(
        TrainerArgs(), config, output_path, model, train_samples, eval_samples
    )
    trainer.fit()
