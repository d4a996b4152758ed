"""Tacotron v1 + GST tests (reference model: tests/tts_tests/test_tacotron_model.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from tts_tpu.models.tacotron2.config import TacotronConfig
from tts_tpu.models.tacotron2.tacotron_v1 import Tacotron


def _setup(use_gst=False):
    cfg = TacotronConfig(
        num_chars=24, r=2, decoder_output_dim=20, out_channels=65,
        use_gst=use_gst, max_decoder_steps=8,
        embedding_dim=64, cbhg_K=4, post_cbhg_K=4, cbhg_features=32,
        query_dim=64, decoder_rnn_dim=64, prenet_dim=32, attn_dim=32,
    )
    model = Tacotron(cfg)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randint(0, 24, (2, 6)))
    xl = jnp.asarray([6, 4])
    mel = jnp.asarray(rng.randn(2, 8, 20).astype(np.float32))
    ml = jnp.asarray([8, 6])
    params = model.module.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, x, xl, mel, ml
    )
    stop = np.zeros((2, 8), np.float32)
    stop[:, -1] = 1
    batch = {
        "text_input": x, "text_lengths": xl, "mel_input": mel, "mel_lengths": ml,
        "linear_input": jnp.asarray(rng.randn(2, 8, 65).astype(np.float32)),
        "stop_targets": jnp.asarray(stop),
    }
    return model, params, batch


def test_tacotron_v1_train_and_inference():
    model, params, batch = _setup()
    loss, aux = model.train_step(params, batch, rngs={"dropout": jax.random.PRNGKey(2)})
    assert np.isfinite(float(loss))
    assert aux["outputs"]["model_outputs"].shape == (2, 8, 65)  # linear spec
    assert aux["outputs"]["decoder_outputs"].shape == (2, 8, 20)  # mel
    out = model.module.apply(
        params, batch["text_input"], batch["text_lengths"], max_steps=6,
        method=model.module.inference, rngs={"dropout": jax.random.PRNGKey(3)},
    )
    assert out["model_outputs"].shape == (2, 12, 65)


def test_gst_style_conditioning():
    model, params, batch = _setup(use_gst=True)
    kw = dict(method=model.module.inference, rngs={"dropout": jax.random.PRNGKey(3)})
    neutral = model.module.apply(params, batch["text_input"], batch["text_lengths"], max_steps=6, **kw)
    styled = model.module.apply(
        params, batch["text_input"], batch["text_lengths"], max_steps=6,
        style_mel=batch["mel_input"], **kw,
    )
    diff = np.abs(np.asarray(styled["model_outputs"]) - np.asarray(neutral["model_outputs"])).max()
    assert diff > 1e-6  # style actually conditions the output
