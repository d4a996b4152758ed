"""AlignTTS tests (reference model: tests/tts_tests2/test_align_tts_train.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from tts_tpu.models.align_tts import AlignTTS, AlignTTSArgs, AlignTTSConfig, align_tts_loss, mdn_loss
from helpers import fast_params


def _model():
    cfg = AlignTTSConfig()
    cfg.model_args = AlignTTSArgs(
        num_chars=24,
        hidden_channels=32,
        hidden_channels_dp=16,
        encoder_params={"hidden_channels_ffn": 32, "num_heads": 2, "num_layers": 1, "dropout_p": 0.1},
        decoder_params={"hidden_channels_ffn": 32, "num_heads": 2, "num_layers": 1, "dropout_p": 0.1},
    )
    model = AlignTTS(cfg)
    params = fast_params(model.init_params, jax.random.PRNGKey(0))
    return model, params, cfg


def _batch(B=2, T_en=7, T_de=20):
    rng = np.random.RandomState(0)
    return {
        "text_input": jnp.asarray(rng.randint(0, 24, (B, T_en))),
        "text_lengths": jnp.asarray([T_en, T_en - 2]),
        "mel_input": jnp.asarray(rng.randn(B, T_de, 80).astype(np.float32)),
        "mel_lengths": jnp.asarray([T_de, T_de - 5]),
    }


def test_forward_and_phases():
    model, params, cfg = _model()
    batch = _batch()
    for phase in (-1, 0, 1, 2, 3):
        out = model.forward(
            params, batch, train=True, rngs={"dropout": jax.random.PRNGKey(1)}, phase=phase
        )
        losses = align_tts_loss(cfg, out, batch, phase=phase)
        assert np.isfinite(float(losses["loss"])), phase
    assert out["model_outputs"].shape == (2, 20, 80)


def test_mdn_loss_prefers_matching():
    """MDN loss lower when logp has a clear monotonic ridge."""
    B, T_en, T_de = 1, 4, 12
    good = np.full((B, T_en, T_de), -8.0, np.float32)
    for t in range(T_de):
        good[0, min(t // 3, 3), t] = 0.0
    bad = np.full((B, T_en, T_de), -4.0, np.float32)
    tl = jnp.asarray([T_en])
    ml = jnp.asarray([T_de])
    l_good = float(mdn_loss(jnp.asarray(good), tl, ml))
    l_bad = float(mdn_loss(jnp.asarray(bad), tl, ml))
    assert l_good < l_bad


def test_inference():
    model, params, _ = _model()
    batch = _batch()
    out = model.inference(params, batch["text_input"], batch["text_lengths"], max_frames=32)
    assert out["model_outputs"].shape == (2, 32, 80)
    assert np.isfinite(np.asarray(out["model_outputs"])).all()
