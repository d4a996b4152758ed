"""Vocoder tests (reference model: tests/vocoder_tests/)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tts_tpu.vocoder.configs import HifiganConfig, MelganConfig, MultibandMelganConfig
from tts_tpu.vocoder.models.gan import GAN
from tts_tpu.vocoder.models.hifigan_generator import HifiganGenerator
from tts_tpu.vocoder.models.melgan_generator import (
    MelganGenerator,
    MultibandMelganGenerator,
    PQMF,
)


def test_hifigan_generator_shapes():
    gen = HifiganGenerator(
        in_channels=80,
        upsample_factors=(4, 4),
        upsample_kernel_sizes=(8, 8),
        upsample_initial_channel=32,
        resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),),
    )
    c = jnp.asarray(np.random.RandomState(0).randn(2, 20, 80).astype(np.float32))
    params = gen.init(jax.random.PRNGKey(0), c)
    y = gen.apply(params, c)
    assert y.shape == (2, 20 * 16, 1)
    assert np.abs(np.asarray(y)).max() <= 1.0


def test_melgan_generator_shapes():
    gen = MelganGenerator(base_channels=64, upsample_factors=(4, 4), num_res_blocks=2)
    c = jnp.asarray(np.random.RandomState(0).randn(1, 16, 80).astype(np.float32))
    params = gen.init(jax.random.PRNGKey(0), c)
    y = gen.apply(params, c)
    assert y.shape == (1, 16 * 16, 1)


def test_pqmf_reconstruction():
    """PQMF analysis→synthesis should reconstruct within tolerance."""
    pqmf = PQMF(N=4)
    t = np.linspace(0, 1, 4096, endpoint=False)
    x = (0.5 * np.sin(2 * np.pi * 220 * t) + 0.3 * np.sin(2 * np.pi * 700 * t)).astype(np.float32)
    x = jnp.asarray(x)[None, :, None]
    sub = pqmf.analysis(x)
    assert sub.shape == (1, 1024, 4)
    x_rec = np.asarray(pqmf.synthesis(sub))[0, :, 0]
    x_np = np.asarray(x)[0, :, 0]
    # analysis+synthesis has a ~taps-sample group delay; align then compare
    corr = np.correlate(x_rec, x_np, mode="full")
    shift = int(np.argmax(corr)) - (len(x_np) - 1)
    assert 0 <= shift <= 80, shift
    a = x_rec[shift : shift + len(x_np) - shift]
    b = x_np[: len(a)]
    # 0.059 matches the torch reference exactly (its filter phase quirk,
    # pqmf.py "TODO: (taps - 1) -> taps"); verified subbands are identical
    err = np.abs(a[100:-100] - b[100:-100]).max()
    assert err < 0.07, err


def test_multiband_melgan_inference_path():
    gen = MultibandMelganGenerator(
        base_channels=32, upsample_factors=(2, 2, 2), num_res_blocks=2, out_channels=4
    )
    c = jnp.asarray(np.random.RandomState(0).randn(1, 16, 80).astype(np.float32))
    params = gen.init(jax.random.PRNGKey(0), c)
    sub = gen.apply(params, c)
    assert sub.shape == (1, 16 * 8, 4)
    wav = gen.pqmf.synthesis(sub)
    assert wav.shape == (1, 16 * 8 * 4, 1)


@pytest.mark.parametrize("cfg_cls", [HifiganConfig, MultibandMelganConfig])
def test_gan_train_step(cfg_cls):
    cfg = cfg_cls()
    cfg.audio.num_mels = 20
    cfg.audio.fft_size = 256
    cfg.audio.win_length = 256
    cfg.audio.hop_length = 64
    cfg.seq_len = 1024
    cfg.steps_to_start_discriminator = 0
    # shrink nets
    if cfg_cls is HifiganConfig:
        cfg.generator_model_params = {
            "in_channels": 20,
            "upsample_factors": [8, 8],
            "upsample_kernel_sizes": [16, 16],
            "upsample_initial_channel": 32,
            "resblock_kernel_sizes": [3],
            "resblock_dilation_sizes": [[1, 3]],
            "resblock_type": "1",
        }
        cfg.discriminator_model_params = {"periods": [2, 3], "n_scales": 1, "width_mult": 0.125}
    else:
        cfg.generator_model_params = {
            "in_channels": 20,
            "base_channels": 32,
            "upsample_factors": [8, 2],
            "num_res_blocks": 2,
        }
        cfg.discriminator_model_params = {
            "base_channels": 8,
            "max_channels": 32,
            "downsample_factors": [4, 4],
        }
        cfg.stft_loss_params = {"n_ffts": [256], "hop_lengths": [64], "win_lengths": [128]}
        cfg.subband_stft_loss_params = {"n_ffts": [128], "hop_lengths": [16], "win_lengths": [64]}

    model = GAN(cfg)
    train_step, optimizers, state = model.make_train_step(cfg, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    batch = {
        "waveform": jnp.asarray(rng.randn(2, cfg.seq_len, 1).astype(np.float32) * 0.1),
        "mel": jnp.asarray(rng.randn(2, cfg.seq_len // 64, 20).astype(np.float32)),
    }
    step = jax.jit(train_step)
    state2, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["D_loss"]))
    # params actually changed
    diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), state.params, state2.params)
    assert max(jax.tree.leaves(diff)) > 0


def test_gan_eval_log_figures_and_audio():
    """eval_log (reference gan.py eval_log → plot_results) returns dashboard
    figures (real/fake/diff spectrograms + waveform comparison) and audio."""
    cfg = HifiganConfig()
    cfg.audio.num_mels = 20
    cfg.audio.fft_size = 256
    cfg.audio.win_length = 256
    cfg.audio.hop_length = 64
    cfg.seq_len = 1024
    cfg.steps_to_start_discriminator = 0
    cfg.generator_model_params = {
        "in_channels": 20,
        "upsample_factors": [8, 8],
        "upsample_kernel_sizes": [16, 16],
        "upsample_initial_channel": 32,
        "resblock_kernel_sizes": [3],
        "resblock_dilation_sizes": [[1, 3]],
        "resblock_type": "1",
    }
    cfg.discriminator_model_params = {"periods": [2, 3], "n_scales": 1, "width_mult": 0.125}
    model = GAN(cfg)
    _, _, state = model.make_train_step(cfg, jax.random.PRNGKey(0))
    rng = np.random.RandomState(1)
    batch = {
        "waveform": jnp.asarray(rng.randn(2, cfg.seq_len, 1).astype(np.float32) * 0.1),
        "mel": jnp.asarray(rng.randn(2, cfg.seq_len // 64, 20).astype(np.float32)),
    }
    figures, audios = model.eval_log(batch, state)
    # unprefixed keys: the Trainer's dashboard scopes them under "eval"
    assert {
        "spectrogram/fake",
        "spectrogram/real",
        "spectrogram/diff",
        "speech_comparison",
    } <= set(figures)
    assert audios["audio"].ndim == 1 and len(audios["audio"]) == cfg.seq_len
