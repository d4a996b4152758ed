"""Portable compiled-model export (the TPU-native analog of the
reference's ONNX export — ``vits.py:1806 export_onnx`` /
``:1886 load_onnx`` / ``:1901 inference_onnx``).

Instead of ONNX, the jitted inference function is serialized as
**StableHLO** via ``jax.export``: a single self-contained artifact holding
the lowered program (with the params baked in as constants) that any JAX
runtime with a matching plugin (CPU/TPU) can load and execute without the
model's Python code — the same deployment story ``onnxruntime`` gives the
reference, minus the torch→ONNX operator-coverage lottery.

Artifact layout (one ``.tpuexport`` file, a zip):
  * ``fn.bin``   — serialized StableHLO (jax.export)
  * ``meta.json``— input signature + framework version
"""

from __future__ import annotations

import io
import json
import zipfile
from typing import Any, Callable, Dict, Sequence, Tuple

import jax
import numpy as np

FORMAT_VERSION = 1


def export_inference(
    fn: Callable,
    example_args: Sequence[Any],
    output_path: str,
    platforms: Sequence[str] = ("cpu", "tpu"),
    meta: Dict[str, Any] | None = None,
) -> str:
    """Serialize ``jax.jit(fn)(*example_args)`` to ``output_path``.

    ``fn`` must close over its params (they are baked into the artifact as
    constants), take only array arguments, and be shape-static for the
    example shapes — the exported program serves exactly those shapes,
    like an ONNX graph exported at fixed dims.
    """
    exported = jax.export.export(
        jax.jit(fn), platforms=list(platforms)
    )(*example_args)
    blob = exported.serialize()

    signature = [
        {"shape": list(np.shape(a)), "dtype": str(np.asarray(a).dtype)}
        for a in example_args
    ]
    payload = {
        "format_version": FORMAT_VERSION,
        "signature": signature,
        "platforms": list(platforms),
        "jax_version": jax.__version__,
        **(meta or {}),
    }
    with zipfile.ZipFile(output_path, "w", compression=zipfile.ZIP_DEFLATED) as z:
        z.writestr("fn.bin", blob)
        z.writestr("meta.json", json.dumps(payload, indent=2))
    return output_path


def load_exported(path: str) -> Tuple[Callable, Dict[str, Any]]:
    """Load an exported artifact → (callable, meta).  The callable takes
    the same positional arrays as the exported function."""
    with zipfile.ZipFile(path) as z:
        blob = z.read("fn.bin")
        meta = json.loads(z.read("meta.json"))
    exported = jax.export.deserialize(blob)

    def call(*args):
        return exported.call(*args)

    return call, meta


def export_vits_inference(
    model, params, output_path: str, max_frames: int = 1000, max_text_len: int = 200
) -> str:
    """Export VITS text→waveform at fixed budget shapes (the reference's
    ``export_onnx`` equivalent).  Inputs: token ids ``[1, max_text_len]``
    int32, lengths ``[1]`` int32, seed ``[2]`` uint32."""
    import jax.numpy as jnp

    def fn(x, x_lengths, seed):
        rng = jax.random.wrap_key_data(seed, impl="threefry2x32")
        out = model.inference(params, x, x_lengths, max_frames=max_frames, rng=rng)
        return out["model_outputs"], out.get("y_lengths", x_lengths)

    x = np.zeros((1, max_text_len), np.int32)
    xl = np.asarray([max_text_len], np.int32)
    seed = np.zeros((2,), np.uint32)
    return export_inference(
        fn, (x, xl, seed), output_path,
        meta={"model": "vits", "max_frames": max_frames, "max_text_len": max_text_len},
    )
