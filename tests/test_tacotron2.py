"""Tacotron2 tests (reference model: tests/tts_tests/test_tacotron2_model.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tts_tpu.models.tacotron2 import Tacotron2, Tacotron2Config, tacotron_loss
from helpers import fast_params


def _small_config(**kw):
    kw.setdefault("r", 2)
    return Tacotron2Config(
        num_chars=24,
        out_channels=80,
        encoder_in_features=64,
        decoder_in_features=64,
        embedding_dim=64,
        query_dim=64,
        decoder_rnn_dim=64,
        prenet_dim=32,
        attn_dim=32,
        max_decoder_steps=20,
        **kw,
    )


@pytest.fixture(scope="module")
def t2():
    model = Tacotron2(_small_config())
    params = fast_params(model.init_params, jax.random.PRNGKey(0))
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


def test_ddc(t2):
    """Double decoder consistency: coarse decoder + DDC losses
    (reference base_tacotron.py:199-215, losses.py:463-472)."""
    model = Tacotron2(_small_config(double_decoder_consistency=True, ddc_r=3))
    params = fast_params(model.init_params, jax.random.PRNGKey(0))
    batch = _batch()
    out = model.forward(params, batch, train=True, rngs={"dropout": jax.random.PRNGKey(1)})
    assert out["decoder_outputs_backward"].shape == (2, 12, 80)
    assert out["alignments_backward"].shape == out["alignments"].shape
    loss, aux = model.train_step(params, batch, rngs={"dropout": jax.random.PRNGKey(1)})
    assert np.isfinite(float(loss))
    for k in ("decoder_coarse_loss", "decoder_ddc_loss"):
        assert np.isfinite(float(aux[k])), k

    def loss_fn(p):
        l, _ = model.train_step(p, batch, rngs={"dropout": jax.random.PRNGKey(1)})
        return l

    grads = jax.grad(loss_fn)(params)
    coarse = [g for path, g in jax.tree_util.tree_leaves_with_path(grads) if "coarse" in str(path)]
    assert coarse and all(np.isfinite(np.asarray(g)).all() for g in coarse)


def test_gradual_training_set_r():
    """set_r changes the reduction factor without changing param shapes
    (reference Decoder.set_r tacotron2.py:211, base_tacotron.py:293)."""
    model = Tacotron2(_small_config(r=3))
    params = fast_params(model.init_params, jax.random.PRNGKey(0))
    model.set_r(1)
    assert model.module.r == 1 and model.module.r_init == 3
    batch = _batch(T_de=12)
    out = model.forward(params, batch, train=True, rngs={"dropout": jax.random.PRNGKey(1)})
    assert out["model_outputs"].shape == (2, 12, 80)
    assert out["alignments"].shape == (2, 12, 8)  # T_de/r = 12 steps now
    assert np.isfinite(np.asarray(out["model_outputs"])).all()
    with pytest.raises(ValueError):
        model.set_r(5)  # cannot exceed r_init

    # schedule hook drives r + batch_size off the trainer step
    class _T:
        global_step = 10_000
        mesh = None

        class config:
            batch_size = 0

    model.config.gradual_training = [[0, 3, 8], [5_000, 2, 16], [50_000, 1, 32]]
    trainer = _T()
    trainer.config = _T.config
    model.set_r(3)
    assert model.on_epoch_start(trainer) is True
    assert model.module.r == 2 and trainer.config.batch_size == 16
    assert model.on_epoch_start(trainer) is False  # unchanged → no re-jit


def test_gst_and_capacitron():
    """Tacotron2 + GST + Capacitron VAE (reference base_tacotron.py
    compute_gst/compute_capacitron_VAE_embedding, zoo blizzard2013 entries)."""
    model = Tacotron2(_small_config(
        use_gst=True, gst={"gst_num_heads": 2, "gst_num_style_tokens": 4, "gst_embedding_dim": 16},
        use_capacitron_vae=True, capacitron_vae={"capacitron_VAE_embedding_dim": 8,
                                                 "capacitron_capacity": 5.0},
    ))
    params = fast_params(lambda r: model.init_params(r, t_de=16), jax.random.PRNGKey(0))
    batch = _batch(T_de=16)
    loss, aux = model.train_step(params, batch, rngs={"dropout": jax.random.PRNGKey(1)})
    assert np.isfinite(float(loss))
    assert np.isfinite(float(aux["capacitron_loss"]))
    assert np.isfinite(float(aux["capacitron_kl"]))
    # inference without reference audio: prior sample + zero GST style
    out = model.inference(params, batch["text_input"], batch["text_lengths"], max_steps=5)
    assert np.isfinite(np.asarray(out["model_outputs"])).all()
    # style transfer via a reference mel
    out2 = model.inference(
        params, batch["text_input"], batch["text_lengths"], max_steps=5,
        aux_input={"style_mel": batch["mel_input"]},
    )
    assert np.isfinite(np.asarray(out2["model_outputs"])).all()


def test_synthesis_path(t2):
    """Tacotron2 through the generic synthesis() user path (regression:
    the AR inference signature takes max_steps, not max_frames)."""
    from tts_tpu.utils.synthesis import synthesis

    model, params = t2

    class Tok:
        def text_to_ids(self, t):
            return [min(ord(c), 23) for c in t[:8]]

    model.tokenizer = Tok()
    out = synthesis(model, "hello", params, use_griffin_lim=False)
    assert out["model_outputs"].shape[-1] == 80
    assert np.isfinite(out["model_outputs"]).all()


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
