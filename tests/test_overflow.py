"""Overflow/NeuralHMM tests (reference model: tests/tts_tests2/test_overflow*)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tts_tpu.models.overflow import NeuralhmmTTS, NeuralhmmTTSConfig, Overflow, OverflowConfig
from helpers import fast_params


def _small(cfg):
    cfg.num_chars = 24
    cfg.out_channels = 20
    cfg.encoder_in_out_features = 32
    cfg.memory_rnn_dim = 32
    cfg.prenet_dim = 16
    cfg.outputnet_size = [32]
    if hasattr(cfg, "hidden_channels_dec"):
        cfg.hidden_channels_dec = 24
        cfg.num_flow_blocks_dec = 2
        cfg.num_block_layers = 1
    return cfg


def _batch(B=2, T_en=5, T_de=14, C=20):
    rng = np.random.RandomState(0)
    return {
        "text_input": jnp.asarray(rng.randint(0, 24, (B, T_en))),
        "text_lengths": jnp.asarray([T_en, T_en - 2]),
        "mel_input": jnp.asarray(rng.randn(B, T_de, C).astype(np.float32)),
        "mel_lengths": jnp.asarray([T_de, T_de - 4]),
    }


@pytest.mark.parametrize("model_cls,cfg_cls", [(NeuralhmmTTS, NeuralhmmTTSConfig), (Overflow, OverflowConfig)])
def test_forward_loss(model_cls, cfg_cls):
    cfg = _small(cfg_cls())
    model = model_cls(cfg)
    params = fast_params(model.init_params, jax.random.PRNGKey(0))
    batch = _batch()
    loss, aux = model.train_step(params, batch, rngs={"dropout": jax.random.PRNGKey(1)})
    assert np.isfinite(float(loss)), model_cls.__name__
    # alignments are probabilities over states per frame
    align = np.asarray(aux["outputs"]["alignments"])
    assert align.shape[0] == 2
    sums = align[0].sum(-1)
    np.testing.assert_allclose(sums, 1.0, atol=1e-3)


# slow tier: training-behavior check (loss decreases over steps) —
# forward/inference contracts above stay fast
@pytest.mark.slow
def test_nll_decreases_with_matching_emissions():
    """Flat-start model: loss should decrease when training on one batch."""
    import optax

    cfg = _small(NeuralhmmTTSConfig())
    model = NeuralhmmTTS(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    batch = _batch()
    opt = optax.adam(1e-3)
    st = opt.init(params)

    @jax.jit
    def step(p, s, k):
        (l, _), g = jax.value_and_grad(
            lambda p: model.train_step(p, batch, rngs={"dropout": k}), has_aux=True
        )(p)
        u, s = opt.update(g, s)
        return optax.apply_updates(p, u), s, l

    losses = []
    k = jax.random.PRNGKey(0)
    for i in range(8):
        k, sub = jax.random.split(k)
        params, st, l = step(params, st, sub)
        losses.append(float(l))
    assert losses[-1] < losses[0]


@pytest.mark.parametrize("model_cls,cfg_cls", [(NeuralhmmTTS, NeuralhmmTTSConfig), (Overflow, OverflowConfig)])
def test_inference(model_cls, cfg_cls):
    cfg = _small(cfg_cls())
    model = model_cls(cfg)
    params = fast_params(model.init_params, jax.random.PRNGKey(0))
    batch = _batch()
    out = model.inference(params, batch["text_input"], batch["text_lengths"], max_frames=20)
    assert out["model_outputs"].shape[0] == 2
    assert out["model_outputs"].shape[2] == 20
    assert np.isfinite(np.asarray(out["model_outputs"])).all()
    assert (np.asarray(out["y_lengths"]) >= 1).all()
