"""Ring attention parity on the 8-way virtual CPU mesh
(tts_tpu/parallel/ring_attention.py — the sequence-parallel capability the
reference lacks, SURVEY §5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tts_tpu.parallel import get_mesh, sequence_sharded_attention

B, T, H, Dh = 2, 32, 4, 16


def _full_attention(q, k, v, causal):
    s = jnp.einsum("bthd,bshd->bhts", q, k) / (Dh**0.5)
    if causal:
        mask = jnp.tril(jnp.ones((T, T), bool))
        s = jnp.where(mask[None, None], s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhts,bshd->bthd", p, v)


@pytest.fixture(scope="module")
def qkv():
    rng = np.random.RandomState(0)
    return tuple(
        jnp.asarray(rng.randn(B, T, H, Dh).astype(np.float32)) for _ in range(3)
    )


@pytest.mark.parametrize("causal", [True, False])
def test_ring_matches_full(qkv, causal):
    q, k, v = qkv
    mesh = get_mesh(data=1, model=1, seq=8)
    out = sequence_sharded_attention(q, k, v, mesh, axis_name="seq", causal=causal)
    ref = _full_attention(q, k, v, causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_gpt_core_sequence_parallel(qkv):
    """GPT2Core with seq_axis: full forward under shard_map matches the
    plain causal forward — sequence-parallel XTTS GPT training."""
    from functools import partial

    try:
        from jax import shard_map  # jax >= 0.4.35
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from tts_tpu.models.xtts.gpt_core import GPT2Core, causal_mask

    D = H * Dh
    rng = np.random.RandomState(1)
    h_in = jnp.asarray(rng.randn(B, T, D).astype(np.float32))

    plain = GPT2Core(layers=2, dim=D, heads=H, use_pallas=False)
    params = plain.init(jax.random.PRNGKey(0), h_in, causal_mask(T))
    ref, _ = plain.apply(params, h_in, causal_mask(T))

    ring = GPT2Core(layers=2, dim=D, heads=H, use_pallas=False, seq_axis="seq")
    mesh = get_mesh(data=1, model=1, seq=8)
    import inspect

    sig = inspect.signature(shard_map).parameters
    check_kw = {k: False for k in ("check_rep", "check_vma") if k in sig}
    fn = shard_map(
        lambda p, x: ring.apply(p, x)[0],
        mesh=mesh,
        in_specs=(P(), P(None, "seq", None)),
        out_specs=P(None, "seq", None),
        **check_kw,
    )
    out = fn(params, h_in)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_ring_single_device(qkv):
    q, k, v = qkv
    mesh = get_mesh(data=1, model=1, seq=1, devices=jax.devices()[:1])
    out = sequence_sharded_attention(q, k, v, mesh, causal=True)
    ref = _full_attention(q, k, v, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
