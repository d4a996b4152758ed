"""XTTS DVAE + GPT fine-tuning tests
(reference model: tests/xtts_tests/test_xtts_gpt_train.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import optax

from tts_tpu.models.xtts import XttsArgs, XttsConfig
from tts_tpu.models.xtts.dvae import DiscreteVAE
from tts_tpu.models.xtts.trainer import GPTTrainer


def _tiny_config():
    cfg = XttsConfig()
    cfg.model_args = XttsArgs(
        gpt_layers=1, gpt_n_model_channels=32, gpt_n_heads=2,
        gpt_number_text_tokens=40, gpt_num_audio_tokens=18,
        gpt_start_audio_token=16, gpt_stop_audio_token=17,
        gpt_start_text_token=38, gpt_stop_text_token=0,
        gpt_max_text_tokens=24, gpt_max_audio_tokens=32,
        decoder_input_dim=32,
    )
    return cfg


def test_dvae_roundtrip_shapes_and_training():
    dvae = DiscreteVAE(channels=20, num_tokens=16, codebook_dim=16, hidden_dim=16,
                       num_resnet_blocks=1)
    mel = jnp.asarray(np.random.RandomState(0).randn(2, 32, 20).astype(np.float32))
    params = dvae.init(jax.random.PRNGKey(0), mel)
    out = dvae.apply(params, mel)
    assert out["reconstruction"].shape == (2, 32, 20)
    assert out["codes"].shape == (2, 8)  # /4 downsample
    assert (np.asarray(out["codes"]) < 16).all()

    # a few steps reduce reconstruction loss
    opt = optax.adam(3e-3)
    st = opt.init(params)

    @jax.jit
    def step(p, s):
        (l, aux), g = jax.value_and_grad(
            lambda p: (dvae.apply(p, mel)["loss"], dvae.apply(p, mel)), has_aux=True
        )(p)
        u, s = opt.update(g, s)
        return optax.apply_updates(p, u), s, aux["recon_loss"]

    losses = []
    for _ in range(12):
        params, st, l = step(params, st)
        losses.append(float(l))
    assert losses[-1] < losses[0]


# slow tier: ~28s 1-core compile of the GPT train step; the fast tier keeps
# test_gpt_train_forward (loss math) and DVAE training, and the slow tier
# still runs this overfit check + the remat-equivalence step
@pytest.mark.slow
def test_gpt_trainer_step():
    cfg = _tiny_config()
    trainer = GPTTrainer(cfg)
    train_step, _, state = trainer.make_train_step(cfg, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    batch = {
        "text_input": jnp.asarray(rng.randint(1, 38, (2, 10))),
        "text_lengths": jnp.asarray([10, 7]),
        "mel_input": jnp.asarray(rng.randn(2, 48, 80).astype(np.float32)),
        "mel_lengths": jnp.asarray([48, 32]),
        "cond_mels": jnp.asarray(rng.randn(2, 32, 80).astype(np.float32)),
    }
    step = jax.jit(train_step)
    losses = []
    for i in range(4):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss_mel_ce"]))
        assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0]  # overfits one batch


# slow tier: ~20s — compiles the GPT train step twice (remat and plain)
# purely to assert value equivalence
@pytest.mark.slow
def test_gpt_remat_matches_plain():
    """gpt_use_remat only changes memory scheduling, not values: one train
    step produces the same loss with and without rematerialization."""
    losses = {}
    for remat in (False, True):
        cfg = _tiny_config()
        cfg.model_args.gpt_use_remat = remat
        trainer = GPTTrainer(cfg)
        train_step, _, state = trainer.make_train_step(cfg, jax.random.PRNGKey(0))
        rng = np.random.RandomState(0)
        batch = {
            "text_input": jnp.asarray(rng.randint(1, 38, (2, 10))),
            "text_lengths": jnp.asarray([10, 7]),
            "mel_input": jnp.asarray(rng.randn(2, 48, 80).astype(np.float32)),
            "mel_lengths": jnp.asarray([48, 32]),
            "cond_mels": jnp.asarray(rng.randn(2, 32, 80).astype(np.float32)),
        }
        _, metrics = jax.jit(train_step)(state, batch, jax.random.PRNGKey(1))
        losses[remat] = float(metrics["loss"])
    assert np.isclose(losses[False], losses[True], rtol=1e-5), losses
