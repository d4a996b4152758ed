"""Pallas TPU kernel: fused single-token KV-cache attention decode.

The hot op of XTTS autoregressive decoding (one query token attending to
the cache each step).  XLA emits separate matmul/softmax/matmul HLOs with
HBM round-trips for the [B, H, S] score tensor; this kernel keeps the
whole softmax(qKᵀ)·V chain in VMEM per (batch, head) grid cell — one HBM
read of K/V, no intermediate writes.

Falls back to plain jnp on non-TPU backends (and supports ``interpret=True``
for CPU testing).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

try:  # pallas is TPU-only at lowering time; import guarded for CPU wheels
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def _decode_attn_kernel(q_ref, k_ref, v_ref, len_ref, o_ref):
    """Grid cell = (batch, head).

    Block shapes: q_ref [1,1,1,dh]; k_ref/v_ref [1,S,1,dh]; len_ref [1,1,1]
    (SMEM); o_ref [1,1,1,dh].
    """
    q = q_ref[0, 0]  # [1, dh]
    k = k_ref[0, 0]  # [S, dh]
    v = v_ref[0, 0]
    S = k.shape[0]
    dh = q.shape[1]
    scores = jnp.dot(k, q.T, preferred_element_type=jnp.float32)  # [S, 1]
    scores = scores / math.sqrt(dh)
    valid = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0) < len_ref[0, 0, 0]
    scores = jnp.where(valid, scores, -1e9)
    m = jnp.max(scores)
    p = jnp.exp(scores - m)
    p = p / jnp.sum(p)
    o_ref[0, 0] = jnp.dot(p.T, v, preferred_element_type=jnp.float32)


def decode_attention(
    q: jnp.ndarray,  # [B, H, dh] single-token queries
    k_cache: jnp.ndarray,  # [B, S, H, dh]
    v_cache: jnp.ndarray,  # [B, S, H, dh]
    cache_len: jnp.ndarray,  # [B] or scalar valid length
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused attention of one query token against the KV cache → [B, H, dh]."""
    B, H, dh = q.shape
    S = k_cache.shape[1]
    if cache_len.ndim == 0:
        cache_len = jnp.broadcast_to(cache_len, (B,))
    lens = cache_len.astype(jnp.int32).reshape(B, 1, 1)

    # [B, S, H, dh] -> [B, H, S, dh] so the last two block dims equal the
    # array dims (TPU lowering constraint); XLA fuses the transpose into the
    # cache producer.
    k_hsd = jnp.swapaxes(k_cache, 1, 2)
    v_hsd = jnp.swapaxes(v_cache, 1, 2)
    grid = (B, H)
    out = pl.pallas_call(
        _decode_attn_kernel,
        out_shape=jax.ShapeDtypeStruct((B, H, 1, dh), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, 1, dh), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S, dh), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S, dh), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda b, h: (b, 0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, dh), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(
        q[:, :, None, :],
        k_hsd,
        v_hsd,
        lens,
    )
    return out[:, :, 0, :]


def decode_attention_xla(q, k_cache, v_cache, cache_len):
    """Reference XLA implementation (also the non-TPU fallback)."""
    B, H, dh = q.shape
    S = k_cache.shape[1]
    scores = jnp.einsum("bhd,bshd->bhs", q, k_cache) / math.sqrt(dh)
    if cache_len.ndim == 0:
        cache_len = jnp.broadcast_to(cache_len, (B,))
    valid = jnp.arange(S)[None, None, :] < cache_len[:, None, None]
    scores = jnp.where(valid, scores, -1e9)
    p = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhs,bshd->bhd", p, v_cache)
