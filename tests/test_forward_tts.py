"""ForwardTTS family tests (reference model: tests/tts_tests2/test_forward_tts.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tts_tpu.models.forward_tts import (
    FastSpeechConfig,
    Fastspeech2Config,
    ForwardTTS,
    ForwardTTSArgs,
    ForwardTTSConfig,
    SpeedySpeechConfig,
    forward_tts_loss,
)
from helpers import fast_params


def _small_args(**kw):
    base = dict(
        num_chars=32,
        hidden_channels=64,
        encoder_params={"hidden_channels_ffn": 64, "num_heads": 2, "num_layers": 2, "dropout_p": 0.1},
        decoder_params={"hidden_channels_ffn": 64, "num_heads": 2, "num_layers": 2, "dropout_p": 0.1},
        duration_predictor_hidden_channels=32,
        pitch_predictor_hidden_channels=32,
        energy_predictor_hidden_channels=32,
    )
    base.update(kw)
    return ForwardTTSArgs(**base)


def _batch(B=2, T_en=9, T_de=40, use_pitch=True, use_energy=False):
    rng = np.random.RandomState(0)
    batch = {
        "text_input": jnp.asarray(rng.randint(0, 32, (B, T_en))),
        "text_lengths": jnp.asarray([T_en, T_en - 2]),
        "mel_input": jnp.asarray(rng.randn(B, T_de, 80).astype(np.float32)),
        "mel_lengths": jnp.asarray([T_de, T_de - 8]),
    }
    if use_pitch:
        batch["pitch"] = jnp.asarray(np.abs(rng.randn(B, T_de, 1)).astype(np.float32))
    if use_energy:
        batch["energy"] = jnp.asarray(np.abs(rng.randn(B, T_de, 1)).astype(np.float32))
    return batch


@pytest.mark.parametrize(
    "cfg_cls,use_pitch,use_energy",
    [
        (ForwardTTSConfig, True, False),  # FastPitch-like default
        (FastSpeechConfig, False, False),
        (Fastspeech2Config, True, True),
    ],
)
def test_forward_and_loss(cfg_cls, use_pitch, use_energy):
    cfg = cfg_cls()
    cfg.model_args = _small_args(use_pitch=use_pitch, use_energy=use_energy)
    model = ForwardTTS(cfg)
    params = fast_params(model.init_params, jax.random.PRNGKey(0))
    batch = _batch(use_pitch=use_pitch, use_energy=use_energy)
    out = model.forward(params, batch, train=True, rngs={"dropout": jax.random.PRNGKey(1)})
    assert out["model_outputs"].shape == (2, 40, 80)
    assert np.isfinite(np.asarray(out["model_outputs"])).all()
    losses = forward_tts_loss(cfg, out, batch)
    assert np.isfinite(float(losses["loss"])), losses
    assert float(losses["loss_aligner"]) > 0


def test_speedy_speech_variant():
    cfg = SpeedySpeechConfig()
    cfg.model_args.num_chars = 32
    cfg.model_args.hidden_channels = 64
    model = ForwardTTS(cfg)
    params = fast_params(model.init_params, jax.random.PRNGKey(0))
    batch = _batch(use_pitch=False)
    out = model.forward(params, batch, train=False)
    assert out["model_outputs"].shape == (2, 40, 80)
    losses = forward_tts_loss(cfg, out, batch)
    assert np.isfinite(float(losses["loss"]))


def test_inference():
    cfg = ForwardTTSConfig()
    cfg.model_args = _small_args()
    model = ForwardTTS(cfg)
    params = fast_params(model.init_params, jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(0).randint(0, 32, (1, 12)))
    out = model.inference(params, x, jnp.asarray([12]), max_frames=64)
    assert out["model_outputs"].shape == (1, 64, 80)
    assert np.isfinite(np.asarray(out["model_outputs"])).all()
    assert int(out["y_lengths"][0]) >= 12  # at least 1 frame per token


def test_forward_sum_loss_sanity():
    """CTC loss should prefer a diagonal alignment over a uniform one."""
    from tts_tpu.layers.losses import forward_sum_loss

    B, T_de, T_en = 1, 12, 4
    diag = np.full((B, T_de, T_en), -5.0, np.float32)
    for t in range(T_de):
        diag[0, t, min(t // 3, T_en - 1)] = 5.0
    uniform = np.zeros((B, T_de, T_en), np.float32)
    in_lens = jnp.asarray([T_en])
    out_lens = jnp.asarray([T_de])
    l_diag = float(forward_sum_loss(jnp.asarray(diag), in_lens, out_lens))
    l_unif = float(forward_sum_loss(jnp.asarray(uniform), in_lens, out_lens))
    assert np.isfinite(l_diag) and np.isfinite(l_unif)
    assert l_diag < l_unif
