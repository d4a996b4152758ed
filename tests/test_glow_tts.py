"""GlowTTS model tests (reference model: tests/tts_tests2/test_glow_tts.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tts_tpu.models.glow_tts import GlowTTS, GlowTTSConfig, glow_tts_loss
from helpers import fast_params


def _small_config(**kw):
    return GlowTTSConfig(
        num_chars=32,
        out_channels=80,
        hidden_channels_enc=48,
        hidden_channels_dec=48,
        hidden_channels_dp=32,
        encoder_params={
            "kernel_size": 3,
            "dropout_p": 0.1,
            "num_layers": 2,
            "num_heads": 2,
            "hidden_channels_ffn": 64,
            "rel_attn_window_size": 4,
        },
        num_flow_blocks_dec=2,
        num_block_layers=2,
        **kw,
    )


@pytest.fixture(scope="module")
def model_and_params():
    model = GlowTTS(_small_config())
    params = fast_params(model.init_params, jax.random.PRNGKey(0))
    return model, params


def _batch(B=2, T_en=11, T_de=30):
    rng = np.random.RandomState(0)
    return {
        "text_input": jnp.asarray(rng.randint(0, 32, (B, T_en))),
        "text_lengths": jnp.asarray([T_en, T_en - 3]),
        "mel_input": jnp.asarray(rng.randn(B, T_de, 80).astype(np.float32)),
        "mel_lengths": jnp.asarray([T_de, T_de - 6]),
    }


def test_forward_shapes(model_and_params):
    model, params = model_and_params
    batch = _batch()
    out = model.forward(params, batch)
    T_de_crop = 30  # already multiple of num_squeeze=2
    assert out["z"].shape == (2, T_de_crop, 80)
    assert out["y_mean"].shape == (2, T_de_crop, 80)
    assert out["alignments"].shape == (2, T_de_crop, 11)
    assert out["logdet"].shape == (2,)
    assert np.isfinite(np.asarray(out["z"])).all()
    # alignment rows (valid frames) sum to one token each
    attn = np.asarray(out["alignments"])
    assert np.allclose(attn[0].sum(-1), 1.0)


def test_loss_finite(model_and_params):
    model, params = model_and_params
    batch = _batch()
    loss, aux = model.train_step(params, batch, rngs={"dropout": jax.random.PRNGKey(1)})
    assert np.isfinite(float(loss))
    assert float(aux["loss_dur"]) >= 0


def test_inference_shapes(model_and_params):
    model, params = model_and_params
    batch = _batch()
    out = model.inference(params, batch["text_input"], batch["text_lengths"], max_frames=100)
    assert out["model_outputs"].shape == (2, 100, 80)
    assert np.isfinite(np.asarray(out["model_outputs"])).all()
    y_lengths = np.asarray(out["y_lengths"])
    assert (y_lengths >= 1).all() and (y_lengths <= 100).all()


def test_flow_invertibility(model_and_params):
    """decoder(decoder(y, fwd), reverse) == y on valid frames."""
    model, params = model_and_params
    y = jnp.asarray(np.random.RandomState(3).randn(1, 24, 80).astype(np.float32))
    y_mask = jnp.ones((1, 24, 1), jnp.float32)

    from tts_tpu.layers.glow import GlowDecoder

    cfg = model.config
    dec = GlowDecoder(
        in_channels=cfg.out_channels,
        hidden_channels=cfg.hidden_channels_dec,
        kernel_size=cfg.kernel_size_dec,
        dilation_rate=cfg.dilation_rate,
        num_flow_blocks=cfg.num_flow_blocks_dec,
        num_coupling_layers=cfg.num_block_layers,
        num_splits=cfg.num_splits,
        num_squeeze=cfg.num_squeeze,
    )
    dec_params = {"params": params["params"]["dec"]}
    z, logdet, _ = dec.apply(dec_params, y, y_mask, reverse=False)
    y_rec, _, _ = dec.apply(dec_params, z, y_mask, reverse=True)
    np.testing.assert_allclose(np.asarray(y_rec), np.asarray(y), atol=1e-4)
    assert np.isfinite(np.asarray(logdet)).all()


def test_overfit_step_decreases_loss(model_and_params):
    """A couple of gradient steps on one batch should reduce the loss."""
    model, params = model_and_params
    batch = _batch()
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, key):
        def loss_fn(p):
            loss, _ = model.train_step(p, batch, rngs={"dropout": key})
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    key = jax.random.PRNGKey(0)
    for i in range(5):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sub)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
