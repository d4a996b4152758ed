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


def test_dpm_solver_matches_ddim_ode_limit():
    """DPM-Solver++(2M) integrates the same probability-flow ODE as DDIM
    and converges faster: with a bounded synthetic denoiser (implied x0 in
    [-0.5, 0.5], the regime a trained model operates in), the 2nd-order
    solver tracks the fine-step solution better at equal budgets."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tts_tpu.models.tortoise.model import ddim_sample, dpm_solver_sample

    trained = 4000
    scale = 1000.0 / trained
    betas = jnp.linspace(1e-4 * scale, 2e-2 * scale, trained)
    abar = jnp.cumprod(1 - betas)

    class DenoiserNet:
        def apply(self, params, x, t_vec, precomputed_embeddings=None,
                  conditioning_free=False):
            a = abar[t_vec][:, None, None]
            al, sg = jnp.sqrt(a), jnp.sqrt(1 - a)
            x0 = 0.5 * jnp.tanh(x @ params["w"])
            eps = (x - al * x0) / sg
            return jnp.concatenate([eps, eps], axis=-1)

    C = 8
    net = DenoiserNet()
    params = {"w": jnp.asarray(
        np.random.RandomState(0).randn(C, C).astype(np.float32) * 0.4)}
    emb = jnp.zeros((1, 12, C))
    rng = jax.random.PRNGKey(3)
    kw = dict(in_channels=C, cond_free=False)

    ref = ddim_sample(net, params, emb, 12, rng, steps=800, **kw)
    for n in (16, 30):
        d = float(jnp.abs(ddim_sample(net, params, emb, 12, rng, steps=n, **kw) - ref).mean())
        p_arr = dpm_solver_sample(net, params, emb, 12, rng, steps=n, **kw)
        p = float(jnp.abs(p_arr - ref).mean())
        assert np.isfinite(np.asarray(p_arr)).all()
        assert p < d, (n, p, d)
