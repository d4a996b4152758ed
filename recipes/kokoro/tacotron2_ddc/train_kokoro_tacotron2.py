"""Tacotron2-DDC Kokoro (Japanese) recipe
(reference recipes/kokoro/tacotron2-DDC/tacotron2-DDC.json): double
decoder consistency with differential spectral loss on the Kokoro
single-speaker corpus; Japanese text goes through the kana frontend
(``text/japanese.py``) instead of espeak."""

import os

from tts_tpu.config.shared import BaseAudioConfig, BaseDatasetConfig
from tts_tpu.data import load_tts_samples
from tts_tpu.models import setup_model
from tts_tpu.models.tacotron2 import Tacotron2Config
from tts_tpu.trainer.trainer import Trainer, TrainerArgs

output_path = os.path.dirname(os.path.abspath(__file__))

dataset_config = BaseDatasetConfig(
    formatter="kokoro",
    dataset_name="kokoro",
    meta_file_train="metadata.csv",
    path=os.path.join(output_path, "../kokoro-speech-v1_1-small/"),
    language="ja",
)

audio_config = BaseAudioConfig(
    sample_rate=22050,
    ref_level_db=20,
    trim_db=60,
    mel_fmin=50.0,
    mel_fmax=7600.0,
    spec_gain=1.0,
)

config = Tacotron2Config(
    audio=audio_config,
    batch_size=32,
    eval_batch_size=16,
    run_eval=True,
    r=6,
    gradual_training=[[0, 6, 32], [10000, 4, 32], [50000, 3, 32], [100000, 2, 32]],
    double_decoder_consistency=True,
    ddc_r=6,
    loss_masking=True,
    decoder_loss_alpha=0.5,
    postnet_loss_alpha=0.25,
    postnet_diff_spec_alpha=0.25,
    decoder_diff_spec_alpha=0.25,
    decoder_ssim_alpha=0.5,
    postnet_ssim_alpha=0.25,
    epochs=1000,
    text_cleaner="basic_cleaners",
    use_phonemes=True,
    phoneme_language="ja-jp",
    print_step=25,
    output_path=output_path,
    datasets=[dataset_config],
)

if __name__ == "__main__":
    train_samples, eval_samples = load_tts_samples(
        [dataset_config.to_dict()], eval_split=True, eval_split_size=config.eval_split_size
    )
    model = setup_model(config)
    trainer = Trainer(TrainerArgs(), config, output_path, model, train_samples, eval_samples)
    trainer.fit()
