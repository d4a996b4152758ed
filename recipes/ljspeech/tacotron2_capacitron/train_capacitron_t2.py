"""Tacotron2 + Capacitron VAE LJSpeech recipe
(reference recipes/ljspeech/tacotron2-Capacitron/train_capacitron_t2.py):
prosody-transfer VAE with the jointly-trained beta (the JAX equivalent of
the reference's dual-group CapacitronOptimizer)."""

import os

from tts_tpu.config.shared import BaseAudioConfig, BaseDatasetConfig
from tts_tpu.data import load_tts_samples
from tts_tpu.models import setup_model
from tts_tpu.models.tacotron2 import Tacotron2Config
from tts_tpu.trainer.trainer import Trainer, TrainerArgs

output_path = os.path.dirname(os.path.abspath(__file__))

dataset_config = BaseDatasetConfig(
    formatter="ljspeech",
    dataset_name="ljspeech",
    meta_file_train="metadata.csv",
    path=os.path.join(output_path, "../LJSpeech-1.1/"),
    language="en",
)

audio_config = BaseAudioConfig(
    sample_rate=22050,
    do_trim_silence=True,
    trim_db=60.0,
    signal_norm=False,
    mel_fmin=0.0,
    mel_fmax=11025,
    spec_gain=1.0,
    log_func="np.log",
    ref_level_db=20,
    preemphasis=0.0,
)

config = Tacotron2Config(
    run_name="Capacitron-Tacotron2",
    audio=audio_config,
    use_capacitron_vae=True,
    capacitron_vae={
        "capacitron_VAE_loss_alpha": 1.0,
        "capacitron_capacity": 50,
        "capacitron_VAE_embedding_dim": 128,
    },
    batch_size=128,
    max_audio_len=8 * 22050,
    min_audio_len=1 * 22050,
    eval_batch_size=16,
    run_eval=True,
    test_delay_epochs=25,
    ga_alpha=0.0,
    r=2,
    optimizer="radam",
    optimizer_params={"betas": [0.9, 0.998], "weight_decay": 1e-6},
    attention_type="dynamic_convolution",
    grad_clip=0.0,
    double_decoder_consistency=False,
    epochs=1000,
    text_cleaner="phoneme_cleaners",
    use_phonemes=True,
    phoneme_language="en-us",
    stopnet_pos_weight=15,
    print_step=25,
    print_eval=True,
    seq_len_norm=True,
    output_path=output_path,
    datasets=[dataset_config],
    lr=1e-3,
    lr_scheduler="StepwiseGradualLR",
    lr_scheduler_params={
        "gradual_learning_rates": [
            [0, 1e-3],
            [2e4, 5e-4],
            [4e5, 3e-4],
            [6e4, 1e-4],
            [8e4, 5e-5],
        ]
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
