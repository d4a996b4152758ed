"""Tacotron2 tests (reference model: tests/tts_tests/test_tacotron2_model.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tts_tpu.models.tacotron2 import Tacotron2, Tacotron2Config, tacotron_loss


def _small_config(**kw):
    return Tacotron2Config(
        num_chars=24,
        r=2,
        out_channels=80,
        encoder_in_features=64,
        decoder_in_features=64,
        max_decoder_steps=20,
        **kw,
    )


@pytest.fixture(scope="module")
def t2():
    model = Tacotron2(_small_config())
    params = model.init_params(jax.random.PRNGKey(0))
    return model, params


def _batch(B=2, T_en=8, T_de=12):
    rng = np.random.RandomState(0)
    stop = np.zeros((B, T_de), np.float32)
    stop[:, -1] = 1
    return {
        "text_input": jnp.asarray(rng.randint(0, 24, (B, T_en))),
        "text_lengths": jnp.asarray([T_en, T_en - 3]),
        "mel_input": jnp.asarray(rng.randn(B, T_de, 80).astype(np.float32)),
        "mel_lengths": jnp.asarray([T_de, T_de - 4]),
        "stop_targets": jnp.asarray(stop),
    }


def test_forward_shapes(t2):
    model, params = t2
    batch = _batch()
    out = model.forward(params, batch, train=True, rngs={"dropout": jax.random.PRNGKey(1)})
    assert out["model_outputs"].shape == (2, 12, 80)
    assert out["decoder_outputs"].shape == (2, 12, 80)
    assert out["alignments"].shape == (2, 6, 8)  # T_de/r steps
    assert out["stop_tokens"].shape == (2, 12)
    assert np.isfinite(np.asarray(out["model_outputs"])).all()
    # attention rows are distributions over valid tokens
    attn = np.asarray(out["alignments"])
    np.testing.assert_allclose(attn.sum(-1), 1.0, atol=1e-5)
    assert attn[1, :, 6:].sum() == 0  # masked tokens get no attention


def test_loss(t2):
    model, params = t2
    batch = _batch()
    loss, aux = model.train_step(params, batch, rngs={"dropout": jax.random.PRNGKey(1)})
    assert np.isfinite(float(loss))
    for k in ("decoder_loss", "postnet_loss", "stopnet_loss", "ga_loss"):
        assert np.isfinite(float(aux[k])), k


def test_inference(t2):
    model, params = t2
    batch = _batch()
    out = model.inference(params, batch["text_input"], batch["text_lengths"], max_steps=10)
    assert out["model_outputs"].shape == (2, 20, 80)  # max_steps * r
    assert np.isfinite(np.asarray(out["model_outputs"])).all()
    assert (np.asarray(out["mel_lengths"]) <= 20).all()


def test_gradients_flow(t2):
    model, params = t2
    batch = _batch()

    def loss_fn(p):
        loss, _ = model.train_step(p, batch, rngs={"dropout": jax.random.PRNGKey(1)})
        return loss

    grads = jax.grad(loss_fn)(params)
    gnorm = float(
        jnp.sqrt(sum(jnp.sum(g**2) for g in jax.tree.leaves(grads)))
    )
    assert np.isfinite(gnorm) and gnorm > 0
