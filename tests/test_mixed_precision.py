"""bf16 mixed-precision policy (trainer/precision.py — replaces the
reference's torch AMP autocast/GradScaler, ``TTS/utils/trainer_utils`` +
trainer pkg ``use_grad_scaler``): compute in bf16, master params and
gradients fp32, no loss scaling (bf16 keeps fp32's exponent range)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tts_tpu.trainer.precision import cast_floats, is_mixed_precision, mp_value_and_grad


def test_cast_floats_only_touches_inexact_leaves():
    tree = {
        "w": jnp.ones((3,), jnp.float32),
        "ids": jnp.arange(3, dtype=jnp.int32),
        "flag": True,
    }
    out = cast_floats(tree, jnp.bfloat16)
    assert out["w"].dtype == jnp.bfloat16
    assert out["ids"].dtype == jnp.int32
    assert out["flag"] is True


def test_mp_value_and_grad_computes_in_bf16_returns_fp32():
    seen = {}

    def loss_fn(params, batch):
        seen["param_dtype"] = params["w"].dtype
        seen["batch_dtype"] = batch["x"].dtype
        return jnp.sum((params["w"] * batch["x"]) ** 2)

    params = {"w": jnp.full((4,), 2.0, jnp.float32)}
    batch = {"x": jnp.ones((4,), jnp.float32), "ids": jnp.arange(4)}
    loss, grads = mp_value_and_grad(loss_fn, argnums=0)(params, batch)
    # forward/backward traced in bf16...
    assert seen["param_dtype"] == jnp.bfloat16
    assert seen["batch_dtype"] == jnp.bfloat16
    # ...but the caller-facing grads are fp32 for the optax master update
    assert grads["w"].dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(grads["w"]), 4.0, rtol=1e-2)
    assert np.isfinite(float(loss))


def test_mp_value_and_grad_disabled_is_plain_grad():
    def loss_fn(p):
        return jnp.sum(p**2)

    p = jnp.ones((2,), jnp.float32)
    loss, g = mp_value_and_grad(loss_fn, enabled=False)(p)
    assert g.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(g), 2.0, rtol=1e-6)


def test_mp_value_and_grad_multi_argnums_aux():
    def loss_fn(a, b, batch):
        return jnp.sum(a * b * batch), {"n": batch.shape[0]}

    a = jnp.ones((3,), jnp.float32)
    b = jnp.full((3,), 3.0, jnp.float32)
    batch = jnp.ones((3,), jnp.float32)
    (loss, aux), (ga, gb) = mp_value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(a, b, batch)
    assert ga.dtype == gb.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(ga), 3.0, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(gb), 1.0, rtol=1e-2)
    assert aux["n"] == 3


def test_is_mixed_precision_gating():
    class Cfg:
        mixed_precision = True
        precision = "bf16"

    assert is_mixed_precision(Cfg())
    Cfg.precision = "fp32"
    assert not is_mixed_precision(Cfg())
    Cfg.mixed_precision = False
    assert not is_mixed_precision(Cfg())


@pytest.mark.slow
def test_vits_gan_train_step_mixed_precision():
    """Full fused GAN step under the bf16 policy: loss finite, master params
    stay fp32, and the step actually changes them (bench.py measures this
    exact configuration as ``vits_train_step_bf16_ms``)."""
    from tts_tpu.models.vits import Vits, VitsArgs, VitsConfig
    from tts_tpu.models.vits.train import create_train_state, make_train_step

    args = VitsArgs(
        num_chars=40,
        out_channels=65,
        spec_segment_size=8,
        hidden_channels=32,
        hidden_channels_ffn_text_encoder=64,
        num_layers_text_encoder=2,
        num_layers_posterior_encoder=2,
        num_layers_flow=2,
        upsample_rates_decoder=[4, 4],
        upsample_kernel_sizes_decoder=[8, 8],
        upsample_initial_channel_decoder=64,
        resblock_kernel_sizes_decoder=[3],
        resblock_dilation_sizes_decoder=[[1, 3]],
        periods_multi_period_discriminator=[2, 3],
    )
    cfg = VitsConfig(model_args=args)
    cfg.audio.fft_size = 128
    cfg.audio.win_length = 128
    cfg.audio.hop_length = 16
    cfg.audio.num_mels = 20
    cfg.audio.sample_rate = 16000
    cfg.mixed_precision = True
    model = Vits(cfg)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0))
    step, _, _ = make_train_step(model, cfg)
    B, T_de = 2, 16
    rng = np.random.RandomState(0)
    batch = {
        "text_input": rng.randint(0, 40, (B, 9)).astype(np.int32),
        "text_lengths": np.full((B,), 9, np.int32),
        "spec": np.abs(rng.randn(B, T_de, 65)).astype(np.float32),
        "spec_lengths": np.full((B,), T_de, np.int32),
        "waveform": (0.1 * rng.randn(B, T_de * 16, 1)).astype(np.float32),
    }
    before = [np.asarray(l, np.float32).copy() for l in jax.tree.leaves(state.params["gen"])]
    state2, metrics = jax.jit(step)(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))
    after = jax.tree.leaves(state2.params["gen"])
    # master copies stay fp32 ...
    assert all(l.dtype == jnp.float32 for l in after if jnp.issubdtype(l.dtype, jnp.floating))
    # ... and the step moved them
    delta = sum(float(np.abs(np.asarray(a, np.float32) - b).sum()) for a, b in zip(after, before))
    assert delta > 0.0
