"""GPT-2 style decoder core with a functional KV cache
(replaces the reference's HF ``transformers`` GPT-2 + ``GPT2InferenceModel``
KV-cache wrapper, ``TTS/tts/layers/xtts/{gpt.py,gpt_inference.py}``).

TPU-native decode: the cache is an explicit pytree of static-shape arrays
``[B, max_len, H, Dh]`` threaded through a ``lax.scan``; each decode step is
one fused attention against the cache with a length mask — no recompiles,
no dynamic shapes, no host round-trips.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Cache = Dict[str, jnp.ndarray]


class GPT2Attention(nn.Module):
    dim: int
    heads: int
    use_pallas: bool = False  # fused single-token decode kernel on TPU
    use_bias: bool = True  # Bark NanoGPT checkpoints train with bias=False
    # sequence-parallel training: when set (and no KV cache), attention runs
    # as ring attention over this mesh axis — the module must be applied
    # inside shard_map with T sharded over the axis; causal masking is
    # implied (parallel/ring_attention.py)
    seq_axis: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # [B, T, D]
        attn_mask: Optional[jnp.ndarray] = None,  # [B, 1, T, S] 1=attend
        cache: Optional[Cache] = None,
        cache_index: Optional[jnp.ndarray] = None,
        cache_len: Optional[jnp.ndarray] = None,  # scalar valid cache length
    ) -> Tuple[jnp.ndarray, Optional[Cache]]:
        B, T, D = x.shape
        H = self.heads
        dh = D // H
        qkv = nn.Dense(3 * D, use_bias=self.use_bias, name="c_attn")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, T, H, dh)
        k = k.reshape(B, T, H, dh)
        v = v.reshape(B, T, H, dh)

        if cache is not None:
            # write the new keys/values at cache_index (decode: T==1;
            # prefill: T==prefix_len with cache_index==0)
            k_cache = jax.lax.dynamic_update_slice(
                cache["k"], k.astype(cache["k"].dtype), (0, cache_index, 0, 0)
            )
            v_cache = jax.lax.dynamic_update_slice(
                cache["v"], v.astype(cache["v"].dtype), (0, cache_index, 0, 0)
            )
            k_all, v_all = k_cache, v_cache
            new_cache = {"k": k_cache, "v": v_cache}
        else:
            k_all, v_all = k, v
            new_cache = None

        if cache is not None and T == 1 and cache_len is not None:
            # hot decode step: one query against the cache.  The fused
            # Pallas kernel keeps softmax(qKᵀ)·V in VMEM per (batch, head);
            # XLA fallback elsewhere.
            from tts_tpu.ops.pallas_attention import decode_attention, decode_attention_xla

            fused = decode_attention if self.use_pallas else decode_attention_xla
            out = fused(q[:, 0], k_all, v_all, jnp.asarray(cache_len, jnp.int32))  # [B, H, dh]
            out = out.astype(x.dtype).reshape(B, H * dh)[:, None, :]
            return nn.Dense(D, use_bias=self.use_bias, name="c_proj")(out), new_cache

        if self.seq_axis is not None and cache is None:
            from tts_tpu.parallel.ring_attention import ring_self_attention

            out = ring_self_attention(q, k_all, v_all, axis_name=self.seq_axis, causal=True)
            out = out.reshape(B, T, D)
            return nn.Dense(D, use_bias=self.use_bias, name="c_proj")(out), new_cache

        scores = jnp.einsum("bthd,bshd->bhts", q, k_all) / math.sqrt(dh)
        if attn_mask is not None:
            scores = jnp.where(attn_mask, scores, -1e9)
        probs = nn.softmax(scores, axis=-1)
        # cast back to the activation dtype: a float32 KV cache must not
        # upcast the residual stream (prefill and decode outputs have to
        # agree for the decode lax.scan carry)
        out = jnp.einsum("bhts,bshd->bthd", probs, v_all).reshape(B, T, D).astype(x.dtype)
        return nn.Dense(D, use_bias=self.use_bias, name="c_proj")(out), new_cache


class GPT2Block(nn.Module):
    dim: int
    heads: int
    use_pallas: bool = False
    use_bias: bool = True
    gelu_exact: bool = False  # HF GPT2 = tanh gelu_new; Bark = exact erf
    seq_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x, attn_mask=None, cache=None, cache_index=None, cache_len=None):
        h, new_cache = GPT2Attention(
            self.dim, self.heads, self.use_pallas, self.use_bias, self.seq_axis, name="attn"
        )(
            nn.LayerNorm(epsilon=1e-5, use_bias=self.use_bias, name="ln_1")(x),
            attn_mask, cache, cache_index, cache_len,
        )
        x = x + h
        m = nn.Dense(4 * self.dim, use_bias=self.use_bias, name="mlp_fc")(
            nn.LayerNorm(epsilon=1e-5, use_bias=self.use_bias, name="ln_2")(x)
        )
        m = nn.Dense(self.dim, use_bias=self.use_bias, name="mlp_proj")(
            nn.gelu(m, approximate=not self.gelu_exact)
        )
        return x + m, new_cache


def _pallas_default() -> bool:
    """Default decode-attention backend: the XLA fused path, which measured
    FASTER than the Pallas kernel at XTTS decode shapes (38 vs 52 µs/step on
    one v5e; see ``ops/pallas_attention.decode_attention``).  Set
    ``TTS_TPU_PALLAS=1`` (TPU only) to opt in to the Pallas kernel."""
    import os

    if os.environ.get("TTS_TPU_PALLAS"):
        try:
            return jax.default_backend() == "tpu"
        except RuntimeError:  # pragma: no cover
            return False
    return False


class GPT2Core(nn.Module):
    """Stack of GPT-2 blocks + final LN.  Position embeddings are owned by
    the caller (XTTS uses separate learned tables for text/mel segments).

    ``use_pallas=None`` (default) resolves via :func:`_pallas_default`
    (XLA fused decode unless ``TTS_TPU_PALLAS=1`` on TPU); pass an explicit
    bool to override.  Either way the single-token decode goes through the
    fused ``cache_len`` path instead of a materialized [B,1,1,S] mask."""

    layers: int
    dim: int
    heads: int
    use_pallas: Optional[bool] = None
    use_bias: bool = True
    gelu_exact: bool = False
    seq_axis: Optional[str] = None  # ring-attention axis for training
    # rematerialize block activations in the backward pass (jax.checkpoint):
    # trades ~1/3 extra FLOPs for O(layers) less activation HBM — enables
    # long-sequence GPT fine-tuning on one chip
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        h: jnp.ndarray,  # [B, T, D] embedded inputs
        attn_mask: Optional[jnp.ndarray] = None,
        caches: Optional[Any] = None,  # list of per-layer {"k","v"} or None
        cache_index: Optional[jnp.ndarray] = None,
        cache_len: Optional[jnp.ndarray] = None,
    ):
        pallas_on = self.use_pallas if self.use_pallas is not None else _pallas_default()
        block_cls = nn.remat(GPT2Block) if (self.remat and caches is None) else GPT2Block
        new_caches = [] if caches is not None else None
        for i in range(self.layers):
            cache_i = caches[i] if caches is not None else None
            h, nc = block_cls(
                self.dim, self.heads, pallas_on, self.use_bias, self.gelu_exact,
                self.seq_axis, name=f"h_{i}",
            )(h, attn_mask, cache_i, cache_index, cache_len)
            if new_caches is not None:
                new_caches.append(nc)
        h = nn.LayerNorm(epsilon=1e-5, use_bias=self.use_bias, name="ln_f")(h)
        return h, new_caches

    def init_cache(self, batch: int, max_len: int, dtype=jnp.float32):
        dh = self.dim // self.heads
        return [
            {
                "k": jnp.zeros((batch, max_len, self.heads, dh), dtype),
                "v": jnp.zeros((batch, max_len, self.heads, dh), dtype),
            }
            for _ in range(self.layers)
        ]


def causal_mask(T: int) -> jnp.ndarray:
    """[1, 1, T, T] lower-triangular mask."""
    return jnp.tril(jnp.ones((T, T), bool))[None, None]


def prefix_lm_mask(T: int, prefix_len) -> jnp.ndarray:
    """Causal mask where the first ``prefix_len`` positions attend fully
    (XTTS conditioning+text prefix is bidirectional in HF's GPT2 only via
    ordering; we keep pure causal for parity — provided for experiments)."""
    return causal_mask(T)


def sample_logits(
    rng: jax.Array,
    logits: jnp.ndarray,  # [B, V]
    temperature: float = 0.75,
    top_k: int = 50,
    top_p: float = 0.85,
    repetition_counts: Optional[jnp.ndarray] = None,  # [B, V]
    repetition_penalty: float = 1.0,
) -> jnp.ndarray:
    """Top-k + nucleus sampling with repetition penalty
    (matches HF generate semantics used by the reference,
    ``stream_generator.py:44``)."""
    if repetition_counts is not None and repetition_penalty != 1.0:
        penal = jnp.where(logits > 0, logits / repetition_penalty, logits * repetition_penalty)
        logits = jnp.where(repetition_counts > 0, penal, logits)
    logits = logits / jnp.maximum(temperature, 1e-5)

    V = logits.shape[-1]
    if top_k and top_k > 0 and top_k < V:
        # one lax.top_k instead of full-vocab sorts: nucleus filtering and
        # the categorical draw both happen inside the k candidates (the
        # masked tail carries ~zero probability mass either way).  Per-step
        # cost drops from O(V log V) to O(V log k) — V is 10k-130k for the
        # Bark/Tortoise vocabularies and this runs every decode step.
        vals, idx = jax.lax.top_k(logits, top_k)  # [B, k], descending
        if top_p and top_p < 1.0:
            probs = jax.nn.softmax(vals, axis=-1)
            cum = jnp.cumsum(probs, axis=-1)
            # keep tokens until cumulative prob exceeds top_p (always keep top-1)
            keep = jnp.arange(top_k)[None] <= jnp.sum(cum < top_p, axis=-1)[:, None]
            vals = jnp.where(keep, vals, -1e9)
        choice = jax.random.categorical(rng, vals, axis=-1)
        return jnp.take_along_axis(idx, choice[:, None], axis=-1)[:, 0]
    if top_p and top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        cutoff_idx = jnp.sum(cum < top_p, axis=-1)  # [B]
        cutoff_val = jnp.take_along_axis(sorted_logits, cutoff_idx[:, None], axis=-1)
        logits = jnp.where(logits < cutoff_val, -1e9, logits)
    return jax.random.categorical(rng, logits, axis=-1)
