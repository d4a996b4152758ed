"""Weight-only int8 quantization for serving.

AR decode is HBM-bandwidth-bound: every generated token re-reads all model
weights, so halving the bytes per weight nearly halves step time on TPU.
``quantize_int8`` rewrites a flax param tree so every matmul ``kernel`` is
stored as int8 with a per-output-channel fp32 scale; ``dequantize`` runs
INSIDE the jitted step, where XLA fuses ``convert(int8)*scale`` into the
consuming dot — weights stay int8 in HBM and are dequantized in registers.

No reference counterpart (the reference serves fp16/fp32 torch); this is a
TPU-serving feature. Quality: symmetric per-channel int8 on GPT weights is
the standard weight-only recipe (~0.5% relative error per matmul).
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
import jax.numpy as jnp

_QKEYS = frozenset({"int8", "scale"})


def _is_quantized_leaf(node: Any) -> bool:
    return isinstance(node, Mapping) and set(node.keys()) == set(_QKEYS)


def quantize_int8(tree: Any, min_elems: int = 4096) -> Any:
    """Replace every float ``kernel`` leaf with ≥2 dims and ≥``min_elems``
    elements by ``{"int8": [..] , "scale": [.., 1, out]}`` (symmetric
    per-output-channel). Biases, LayerNorm scales, embeddings, and small
    kernels stay in full precision."""

    def rec(node: Any, name: str) -> Any:
        if isinstance(node, Mapping) and not _is_quantized_leaf(node):
            return {k: rec(v, k) for k, v in node.items()}
        arr = node
        if (
            name == "kernel"
            and hasattr(arr, "ndim")
            and arr.ndim >= 2
            and jnp.issubdtype(jnp.asarray(arr).dtype, jnp.floating)
            and arr.size >= min_elems
        ):
            a = jnp.asarray(arr, jnp.float32)
            axes = tuple(range(a.ndim - 1))  # per-output-channel (last axis)
            scale = jnp.maximum(jnp.max(jnp.abs(a), axis=axes, keepdims=True) / 127.0, 1e-12)
            q = jnp.clip(jnp.round(a / scale), -127, 127).astype(jnp.int8)
            return {"int8": q, "scale": scale.astype(jnp.float32)}
        return node

    return rec(tree, "")


def dequantize(tree: Any, dtype=jnp.bfloat16) -> Any:
    """Inverse of :func:`quantize_int8`; call INSIDE jit so weights stream
    from HBM as int8 and the convert+scale fuses into the consumer."""

    def rec(node: Any) -> Any:
        if _is_quantized_leaf(node):
            return node["int8"].astype(dtype) * node["scale"].astype(dtype)
        if isinstance(node, Mapping):
            return {k: rec(v) for k, v in node.items()}
        return node

    return rec(tree)


def is_quantized(tree: Any) -> bool:
    """True if any leaf of the tree is an int8-quantized kernel."""
    found = False

    def rec(node: Any) -> None:
        nonlocal found
        if found:
            return
        if _is_quantized_leaf(node):
            found = True
            return
        if isinstance(node, Mapping):
            for v in node.values():
                rec(v)

    rec(tree)
    return found


def install_int8(model: Any, attr_names, compute_dtype=None) -> None:
    """Shared model-side wiring: quantize the named param-tree attributes in
    place and mark the model so :func:`maybe_dequantize` activates. Used by
    Xtts/Bark/Tortoise ``quantize_weights_int8``."""
    if compute_dtype is None:
        compute_dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    for attr in attr_names:
        p = getattr(model, attr, None)
        if p is not None:
            setattr(model, attr, jax.tree.map(jnp.asarray, quantize_int8(p)))
    model._gpt_int8 = True
    model._int8_dtype = compute_dtype


def maybe_dequantize(model: Any, params: Any) -> Any:
    """Dequantize ``params`` iff :func:`install_int8` ran on ``model``.
    Call INSIDE a jitted closure where possible — there XLA fuses the
    convert+scale into the consuming matmul and weights stream from HBM as
    int8; on eager paths the dequantized copy is transient per call (weights
    still sit in HBM at rest as int8)."""
    if getattr(model, "_gpt_int8", False):
        return dequantize(params, model._int8_dtype)
    return params


def quantized_bytes(tree: Any) -> int:
    """Total parameter bytes of the (possibly partly quantized) tree."""
    total = 0
    for leaf in jax.tree.leaves(tree):
        total += leaf.size * leaf.dtype.itemsize
    return total
