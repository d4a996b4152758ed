"""Tacotron2 + Capacitron VAE Blizzard2013 recipe
(reference recipes/blizzard2013/tacotron2-Capacitron/train_capacitron_t2.py)."""

import os

from tts_tpu.config.shared import BaseAudioConfig, BaseDatasetConfig
from tts_tpu.data import load_tts_samples
from tts_tpu.models import setup_model
from tts_tpu.models.tacotron2 import Tacotron2Config
from tts_tpu.trainer.trainer import Trainer, TrainerArgs

output_path = os.path.dirname(os.path.abspath(__file__))
data_path = os.environ.get("BLIZZARD_PATH", os.path.join(output_path, "../blizzard2013/"))

dataset_config = BaseDatasetConfig(
    formatter="ljspeech",
    dataset_name="blizzard2013",
    meta_file_train="metadata.csv",
    path=data_path,
    language="en",
)

audio_config = BaseAudioConfig(
    sample_rate=24000,
    do_trim_silence=True,
    trim_db=60.0,
    signal_norm=True,
    mel_fmin=80.0,
    mel_fmax=12000,
    spec_gain=25.0,
    log_func="np.log10",
    ref_level_db=20,
    preemphasis=0.0,
    min_level_db=-100,
)

config = Tacotron2Config(
    run_name="Blizzard-Capacitron-T2",
    audio=audio_config,
    use_capacitron_vae=True,
    capacitron_vae={
        "capacitron_VAE_loss_alpha": 1.0,
        "capacitron_capacity": 150,
        "capacitron_VAE_embedding_dim": 128,
    },
    batch_size=128,
    max_audio_len=6 * 24000,
    min_audio_len=int(0.5 * 24000),
    eval_batch_size=16,
    run_eval=True,
    test_delay_epochs=5,
    r=2,
    optimizer="radam",
    optimizer_params={"betas": [0.9, 0.998], "weight_decay": 1e-6},
    attention_type="dynamic_convolution",
    grad_clip=0.0,
    epochs=1000,
    text_cleaner="phoneme_cleaners",
    use_phonemes=True,
    phoneme_language="en-us",
    stopnet_pos_weight=15,
    print_step=50,
    print_eval=True,
    output_path=output_path,
    datasets=[dataset_config],
    lr=1e-3,
    lr_scheduler="StepwiseGradualLR",
    lr_scheduler_params={
        "gradual_learning_rates": [[0, 1e-3], [2e4, 5e-4], [4e4, 3e-4], [6e4, 1e-4], [8e4, 5e-5]]
    },
    scheduler_after_epoch=False,
    loss_masking=False,
    decoder_loss_alpha=1.0,
    postnet_loss_alpha=1.0,
    postnet_diff_spec_alpha=0.0,
    decoder_diff_spec_alpha=0.0,
    decoder_ssim_alpha=0.0,
    postnet_ssim_alpha=0.0,
)

if __name__ == "__main__":
    train_samples, eval_samples = load_tts_samples(
        [dataset_config.to_dict()], eval_split=True, eval_split_size=config.eval_split_size
    )
    model = setup_model(config)
    trainer = Trainer(TrainerArgs(), config, output_path, model, train_samples, eval_samples)
    trainer.fit()
