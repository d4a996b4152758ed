"""Torch → flax checkpoint conversion.

"Checkpoint compat is a feature" (SURVEY §7): zoo checkpoints trained with
the reference run on TPU after a one-time conversion.  Generic tensor
rules here; per-architecture name maps in ``convert_<arch>`` functions.

Rules:
  * Conv1d        ``[out, in, k]``  → ``[k, in, out]``
  * ConvTranspose ``[in, out, k]``  → flip(k) → ``[k, in, out]``
  * Conv2d        ``[out, in, kh, kw]`` → ``[kh, kw, in, out]``
  * Linear        ``[out, in]``     → ``[in, out]``
  * weight-norm   ``weight_g * weight_v / ||weight_v||`` folded first
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

__all__ = [
    "load_torch_checkpoint",
    "fold_weight_norm",
    "conv1d_kernel",
    "convtranspose1d_kernel",
    "linear_kernel",
    "convert_hifigan_generator",
]


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint's state dict as numpy (restricted unpickler
    via ``weights_only=True``; replaces reference ``utils/io.py`` RenamingUnpickler)."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(state, dict) and "model" in state:
        state = state["model"]
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in state.items()}


def fold_weight_norm(state: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Fold ``weight_g``/``weight_v`` (old API) or
    ``parametrizations.weight.original{0,1}`` (new API) into plain weights."""
    out: Dict[str, np.ndarray] = {}
    handled = set()
    for key in list(state.keys()):
        if key.endswith("weight_v"):
            base = key[: -len("weight_v")]
            g, v = state[base + "weight_g"], state[base + "weight_v"]
            norm = np.sqrt((v**2).sum(axis=tuple(range(1, v.ndim)), keepdims=True))
            out[base + "weight"] = g * v / np.maximum(norm, 1e-12)
            handled |= {base + "weight_g", base + "weight_v"}
        elif key.endswith("parametrizations.weight.original1"):
            base = key[: -len("parametrizations.weight.original1")]
            g = state[base + "parametrizations.weight.original0"]
            v = state[key]
            norm = np.sqrt((v**2).sum(axis=tuple(range(1, v.ndim)), keepdims=True))
            out[base.rstrip(".") + ".weight"] = g * v / np.maximum(norm, 1e-12)
            handled |= {
                base + "parametrizations.weight.original0",
                base + "parametrizations.weight.original1",
            }
    for k, v in state.items():
        if k not in handled and k not in out:
            out[k] = v
    return out


def conv1d_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 1, 0))


def convtranspose1d_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w[:, :, ::-1], (2, 0, 1))


def conv2d_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def linear_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w)


def convert_hifigan_generator(state: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Reference ``HifiganGenerator`` state dict → flax params for
    ``tts_tpu.vocoder.models.hifigan_generator.HifiganGenerator``."""
    state = fold_weight_norm(state)
    params: Dict[str, Any] = {}

    def put(path: str, leaf: Dict[str, np.ndarray]):
        node = params
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = leaf

    # conv_pre / conv_post (wrapped Conv1d -> child "Conv_0")
    put("conv_pre/Conv_0", {"kernel": conv1d_kernel(state["conv_pre.weight"]),
                            "bias": state["conv_pre.bias"]})
    post = {"kernel": conv1d_kernel(state["conv_post.weight"])}
    if "conv_post.bias" in state:
        post["bias"] = state["conv_post.bias"]
    put("conv_post/Conv_0", post)
    if "cond_layer.weight" in state:
        put("cond_layer", {
            "kernel": linear_kernel(state["cond_layer.weight"][:, :, 0]),
            "bias": state["cond_layer.bias"],
        })

    n_ups = len([k for k in state if k.startswith("ups.") and k.endswith(".weight")])
    for i in range(n_ups):
        put(f"ups_{i}", {
            "kernel": convtranspose1d_kernel(state[f"ups.{i}.weight"]),
            "bias": state[f"ups.{i}.bias"],
        })
        if f"cond_in_each_up_layer.{i}.weight" in state:
            put(f"cond_up_{i}", {
                "kernel": linear_kernel(state[f"cond_in_each_up_layer.{i}.weight"][:, :, 0]),
                "bias": state[f"cond_in_each_up_layer.{i}.bias"],
            })

    n_res = len({k.split(".")[1] for k in state if k.startswith("resblocks.")})
    for r in range(n_res):
        for conv_group in ("convs1", "convs2", "convs"):
            n_convs = len(
                {k.split(".")[3] for k in state if k.startswith(f"resblocks.{r}.{conv_group}.")}
            )
            for c in range(n_convs):
                w = state.get(f"resblocks.{r}.{conv_group}.{c}.weight")
                if w is None:
                    continue
                b = state[f"resblocks.{r}.{conv_group}.{c}.bias"]
                put(
                    f"resblocks_{r}/{conv_group}_{c}/Conv_0",
                    {"kernel": conv1d_kernel(w), "bias": b},
                )
    return {"params": params}
