"""Native C++ kernel + Pallas kernel tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tts_tpu.native import maximum_path_native, native_available
from tts_tpu.ops.mas import maximum_path_numpy
from tts_tpu.ops.pallas_attention import decode_attention, decode_attention_xla


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
def test_cpp_mas_matches_numpy():
    rng = np.random.RandomState(0)
    B, T_x, T_y = 4, 37, 93
    value = rng.randn(B, T_x, T_y).astype(np.float32)
    xl = np.array([37, 20, 11, 5])
    yl = np.array([93, 64, 40, 9])
    mask = (
        (np.arange(T_x)[None, :, None] < xl[:, None, None])
        & (np.arange(T_y)[None, None, :] < yl[:, None, None])
    ).astype(np.float32)
    p_c = maximum_path_native(value.copy(), mask)
    p_np = maximum_path_numpy(value, mask)
    np.testing.assert_array_equal(p_c, p_np)


def test_pallas_decode_attention_interpret():
    """Interpret mode (CPU) must match the XLA reference exactly."""
    rng = np.random.RandomState(0)
    B, S, H, dh = 2, 128, 4, 64
    q = jnp.asarray(rng.randn(B, H, dh).astype(np.float32))
    k = jnp.asarray(rng.randn(B, S, H, dh).astype(np.float32))
    v = jnp.asarray(rng.randn(B, S, H, dh).astype(np.float32))
    lens = jnp.asarray([100, 37])
    out_p = decode_attention(q, k, v, lens, interpret=True)
    out_x = decode_attention_xla(q, k, v, lens)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x), atol=1e-5)


def test_decode_attention_respects_length_mask():
    rng = np.random.RandomState(1)
    B, S, H, dh = 1, 64, 2, 64
    q = jnp.asarray(rng.randn(B, H, dh).astype(np.float32))
    k = jnp.asarray(rng.randn(B, S, H, dh).astype(np.float32))
    v = jnp.asarray(rng.randn(B, S, H, dh).astype(np.float32))
    # poison the cache beyond the valid length; output must not change
    k2 = k.at[:, 10:].set(1e3)
    v2 = v.at[:, 10:].set(1e3)
    out_a = decode_attention_xla(q, k, v, jnp.asarray([10]))
    out_b = decode_attention_xla(q, k2, v2, jnp.asarray([10]))
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-5)
