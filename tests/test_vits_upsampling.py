"""VITS encoder_sample_rate / upsampling_z variant (reference
``vits.py:809-812,944-960,1495-1516``): the posterior/flow/text stack runs at
a lower sample rate and the latent is linearly interpolated before the
waveform decoder."""

import jax
import numpy as np
import pytest
from helpers import fast_params, fast_vits_train_state

from tts_tpu.models.vits import Vits, VitsArgs, VitsConfig


def _cfg(interpolate_z=True, factor=2):
    rates = [4, 4] if interpolate_z else [4, 4, factor]
    ksz = [8, 8] if interpolate_z else [8, 8, 2 * factor]
    args = VitsArgs(
        num_chars=40,
        out_channels=65,
        spec_segment_size=8,
        hidden_channels=16,
        hidden_channels_ffn_text_encoder=32,
        num_layers_text_encoder=1,
        num_layers_posterior_encoder=1,
        num_layers_flow=1,
        upsample_rates_decoder=rates,
        upsample_kernel_sizes_decoder=ksz,
        upsample_initial_channel_decoder=32,
        resblock_kernel_sizes_decoder=[3],
        resblock_dilation_sizes_decoder=[[1, 3]],
        periods_multi_period_discriminator=[2],
        encoder_sample_rate=None,
        interpolate_z=interpolate_z,
    )
    cfg = VitsConfig(model_args=args)
    cfg.audio.fft_size = 128
    cfg.audio.win_length = 128
    cfg.audio.hop_length = 16
    cfg.audio.num_mels = 20
    cfg.audio.sample_rate = 16000
    args.encoder_sample_rate = cfg.audio.sample_rate // factor
    return cfg


def test_inference_upsamples_latent():
    cfg = _cfg(interpolate_z=True, factor=2)
    model = Vits(cfg)
    assert model.module.interpolate_factor == 2.0
    gp, _ = fast_params(model.init_params, jax.random.PRNGKey(0))
    out = model.inference(
        gp, np.zeros((1, 12), np.int32), np.asarray([12], np.int32), max_frames=24
    )
    wav = np.asarray(out["model_outputs"])
    # 24 encoder frames × hop 16 × factor 2 samples at the output rate
    assert wav.shape == (1, 24 * 16 * 2, 1)
    assert np.isfinite(wav).all()


@pytest.mark.slow
def test_train_step_slices_output_rate_waveform():
    cfg = _cfg(interpolate_z=True, factor=2)
    model = Vits(cfg)
    state = fast_vits_train_state(model, cfg, jax.random.PRNGKey(1))
    from tts_tpu.models.vits.train import make_train_step

    step, _, _ = make_train_step(model, cfg)
    B, T_de = 2, 16
    rng = np.random.RandomState(0)
    batch = {
        "text_input": rng.randint(0, 40, (B, 9)).astype(np.int32),
        "text_lengths": np.full((B,), 9, np.int32),
        "spec": np.abs(rng.randn(B, T_de, 65)).astype(np.float32),
        "spec_lengths": np.full((B,), T_de, np.int32),
        # output-rate waveform: factor× more samples per spec frame
        "waveform": (0.1 * rng.randn(B, T_de * 16 * 2, 1)).astype(np.float32),
    }
    state, metrics = jax.jit(step)(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))


def test_format_batch_recomputes_encoder_rate_spec():
    cfg = _cfg(interpolate_z=True, factor=2)
    model = Vits(cfg)
    B, n_mel_frames = 2, 20
    wav = 0.1 * np.random.RandomState(3).randn(B, n_mel_frames * 16 * 2, 1)
    batch = {
        "waveform": wav.astype(np.float32),
        "mel_lengths": np.asarray([n_mel_frames * 2, n_mel_frames], np.int32),
    }
    out = model.format_batch(batch)
    assert out["spec"].shape[-1] == 65  # fft_size//2+1
    # encoder-rate frames ≈ output-rate mel frames / factor
    assert abs(out["spec"].shape[1] - n_mel_frames) <= 2
    assert out["spec_lengths"][0] == min(n_mel_frames, out["spec"].shape[1])
    assert out["spec_lengths"][1] == n_mel_frames // 2


def test_decoder_rate_consistency_validated():
    cfg = _cfg(interpolate_z=True, factor=2)
    cfg.model_args.upsample_rates_decoder = [4, 8]  # 32 != hop 16
    with pytest.raises(ValueError, match="decoder upsampling"):
        Vits(cfg)


def test_non_interpolating_variant_uses_decoder_rates():
    cfg = _cfg(interpolate_z=False, factor=2)
    model = Vits(cfg)  # prod(rates)=32 == hop*factor — accepted
    gp, _ = fast_params(model.init_params, jax.random.PRNGKey(0))
    out = model.inference(
        gp, np.zeros((1, 8), np.int32), np.asarray([8], np.int32), max_frames=16
    )
    assert np.asarray(out["model_outputs"]).shape == (1, 16 * 16 * 2, 1)


def test_voice_conversion_upsamples_latent():
    """VC must emit output-rate audio (intentional divergence: the reference
    omits upsampling_z in voice_conversion and would emit factor× too-short
    audio)."""
    cfg = _cfg(interpolate_z=True, factor=2)
    cfg.model_args.use_speaker_embedding = True
    cfg.model_args.num_speakers = 4
    model = Vits(cfg)
    gp, _ = fast_params(model.init_params, jax.random.PRNGKey(0))
    T = 12
    y = np.abs(np.random.RandomState(0).randn(1, T, 65)).astype(np.float32)
    # through the host wrapper the Synthesizer's transfer path dispatches to
    out = model.voice_conversion(
        gp, y, np.asarray([T], np.int32),
        np.asarray([0], np.int32), np.asarray([1], np.int32),
    )
    # T encoder frames × hop 16 × factor 2 output samples
    assert np.asarray(out).shape[1] == T * 16 * 2


# slow tier: 24s compile-bound (full multispeaker+multilingual train graph);
# the fast tier covers each variant's forward/infer separately
@pytest.mark.slow
def test_multispeaker_multilingual_train_step():
    """Init must create emb_g/emb_l and the g-projection layers so a
    multi-speaker multilingual VITS trains from scratch (reference
    test_vits_multilingual_speaker_emb_train.py analogue)."""
    from tts_tpu.models.vits.train import make_train_step

    cfg = _cfg(interpolate_z=True, factor=1)
    cfg.model_args.encoder_sample_rate = None
    cfg.model_args.use_speaker_embedding = True
    cfg.model_args.num_speakers = 4
    cfg.model_args.use_language_embedding = True
    cfg.model_args.num_languages = 3
    cfg.model_args.embedded_language_dim = 4
    model = Vits(cfg)
    state = fast_vits_train_state(model, cfg, jax.random.PRNGKey(0))
    assert "emb_g" in state.params["gen"]["params"]
    assert "emb_l" in state.params["gen"]["params"]
    step, _, _ = make_train_step(model, cfg)
    B, T_de = 2, 16
    rng = np.random.RandomState(0)
    batch = {
        "text_input": rng.randint(0, 40, (B, 9)).astype(np.int32),
        "text_lengths": np.full((B,), 9, np.int32),
        "spec": np.abs(rng.randn(B, T_de, 65)).astype(np.float32),
        "spec_lengths": np.full((B,), T_de, np.int32),
        "waveform": (0.1 * rng.randn(B, T_de * 16, 1)).astype(np.float32),
        "speaker_ids": np.asarray([0, 3], np.int32),
        "language_ids": np.asarray([1, 2], np.int32),
    }
    state, metrics = jax.jit(step)(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
