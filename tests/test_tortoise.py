"""Tortoise tests (reference model: tests/zoo_tests tortoise)."""

import jax
import jax.numpy as jnp
import numpy as np

from tts_tpu.models.tortoise import Tortoise, TortoiseConfig
from tts_tpu.models.tortoise.config import TortoiseArgs


def test_tortoise_pipeline():
    cfg = TortoiseConfig()
    cfg.model_args = TortoiseArgs(
        ar_layers=1, ar_model_dim=32, ar_heads=2,
        ar_number_text_tokens=30, ar_number_mel_codes=20,
        ar_start_mel_token=18, ar_stop_mel_token=19, ar_start_text_token=29,
        ar_max_text_tokens=24, ar_max_mel_tokens=32,
        diff_model_channels=32, diff_num_layers=3, diff_in_channels=20,
        diff_in_latent_channels=32, diff_num_heads=2, diffusion_iterations=4,
    )
    model = Tortoise(cfg)
    model.init_params(jax.random.PRNGKey(0))
    text = jnp.asarray(np.random.RandomState(0).randint(1, 29, (1, 8)))
    cond = jnp.asarray(np.random.RandomState(1).randn(1, 32, 80).astype(np.float32))
    out = model.inference(text, cond, rng=jax.random.PRNGKey(2), max_mel_tokens=10)
    assert out["codes"].shape == (1, 10)
    assert out["mel"].shape == (1, 40, 20)
    assert np.isfinite(np.asarray(out["mel"])).all()
    codes = np.asarray(out["codes"])
    assert ((codes >= 0) & (codes < 20)).all()
