"""Ring attention — sequence-parallel exact attention over a ``seq`` mesh
axis (Liu et al., arXiv:2310.01889; the public "How to Scale Your Model"
recipe: shard the sequence, rotate K/V blocks around the ICI ring with
``ppermute``, accumulate with the online-softmax rescaling flash attention
uses).

The reference framework avoids long contexts entirely (sentence splits,
XTTS 400-token cap — SURVEY §5); this module is the TPU rebuild's
genuinely-new capability: it makes attention memory/compute per device
O(T/n), so XTTS-style GPT training can scale past a single chip's HBM on
sequence length, not just batch.

Exactness: the blockwise online-softmax accumulation is algebraically
identical to full softmax attention (no approximation); parity is tested
on an 8-way virtual mesh against the single-device einsum.

Usage inside ``shard_map`` (sequence axis sharded over ``axis_name``):

    out = ring_self_attention(q, k, v, axis_name="seq", causal=True)

q/k/v: ``[B, T_local, H, Dh]`` per device; out: ``[B, T_local, H, Dh]``.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["ring_self_attention", "sequence_sharded_attention"]


def _block_update(q, k, v, scale, qpos, kpos, causal, m, l, o):
    """One K/V block of online-softmax attention (flash accumulation)."""
    s = jnp.einsum("bthd,bshd->bhts", q, k, preferred_element_type=jnp.float32) * scale
    if causal:
        mask = qpos[:, None] >= kpos[None, :]  # [Tq, Tk] global positions
        s = jnp.where(mask[None, None], s, -jnp.inf)
    m_new = jnp.maximum(m, s.max(axis=-1))  # [B, H, Tq]
    # renormalize the running sums to the new max; substitute 0 for a row
    # whose every block so far is masked (-inf − -inf would be NaN) — its
    # alpha/p both come out 0, so it contributes nothing
    safe = jnp.where(jnp.isneginf(m_new), 0.0, m_new)
    alpha = jnp.exp(m - safe)
    p = jnp.exp(s - safe[..., None])  # [B, H, Tq, Tk]
    l_new = l * alpha + p.sum(axis=-1)
    # o is [B, Tq, H, Dh]; alpha is [B, H, Tq] → align to [B, Tq, H, 1]
    o_new = o * alpha.transpose(0, 2, 1)[..., None] + jnp.einsum(
        "bhts,bshd->bthd", p, v, preferred_element_type=jnp.float32
    )
    return m_new, l_new, o_new


def ring_self_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    axis_name: str,
    causal: bool = True,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Exact attention with the sequence sharded over ``axis_name``.

    Must run inside ``shard_map`` (or pmap) with ``axis_name`` bound.  Each
    of the ``n`` devices holds one contiguous sequence block; K/V blocks
    rotate ``n-1`` hops around the ring while every device accumulates its
    queries' attention online.  Peak per-device memory is O(T_local²)
    scores instead of O(T²).
    """
    n = lax.psum(1, axis_name)
    idx = lax.axis_index(axis_name)
    B, T_loc, H, Dh = q.shape
    scale = scale if scale is not None else 1.0 / (Dh**0.5)

    qpos = idx * T_loc + jnp.arange(T_loc)

    m0 = jnp.full((B, H, T_loc), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((B, H, T_loc), jnp.float32)
    o0 = jnp.zeros((B, T_loc, H, Dh), jnp.float32)

    perm = [(j, (j + 1) % n) for j in range(n)]

    def body(i, carry):
        k_cur, v_cur, m, l, o = carry
        # after i forward hops, this device holds the block produced by
        # device (idx - i) mod n
        src = (idx - i) % n
        kpos = src * T_loc + jnp.arange(T_loc)
        m, l, o = _block_update(q, k_cur, v_cur, scale, qpos, kpos, causal, m, l, o)
        k_next = lax.ppermute(k_cur, axis_name, perm)
        v_next = lax.ppermute(v_cur, axis_name, perm)
        return k_next, v_next, m, l, o

    _, _, m, l, o = lax.fori_loop(0, n, body, (k, v, m0, l0, o0))
    # causal + block 0 always contributes (self block), so l > 0 everywhere
    out = o / l[..., None].transpose(0, 2, 1, 3)
    return out.astype(q.dtype)


def shard_map_compat(fn, mesh, in_specs, out_specs):
    """``shard_map`` across jax versions: prefers ``jax.shard_map`` and
    disables replication checking under whichever kwarg name
    (``check_rep``/``check_vma``) this jax exposes."""
    try:
        from jax import shard_map  # jax >= 0.4.35
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map
    import inspect

    sig = inspect.signature(shard_map).parameters
    check_kw = {k: False for k in ("check_rep", "check_vma") if k in sig}
    return shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs, **check_kw)


def sequence_sharded_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh,
    axis_name: str = "seq",
    causal: bool = True,
) -> jnp.ndarray:
    """Convenience wrapper: shard [B, T, H, Dh] tensors over ``axis_name``
    of ``mesh`` on the T dimension and run :func:`ring_self_attention`
    under ``shard_map``."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    try:
        from jax import shard_map  # jax >= 0.4.35
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

    spec = P(None, axis_name, None, None)
    # replication checking was renamed check_rep → check_vma across jax
    # versions; disable under whichever name this jax exposes
    import inspect

    sig = inspect.signature(shard_map).parameters
    check_kw = {k: False for k in ("check_rep", "check_vma") if k in sig}
    fn = shard_map(
        partial(ring_self_attention, axis_name=axis_name, causal=causal),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        **check_kw,
    )
    put = lambda x: jax.device_put(x, NamedSharding(mesh, spec))
    return fn(put(q), put(k), put(v))
