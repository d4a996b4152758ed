"""Device mesh + sharding utilities.

Replaces the reference's DDP/NCCL launcher (``python -m trainer.distribute``,
``TTS/utils/distribute.py``) with the JAX single-controller model: build a
``Mesh`` over ICI, annotate shardings, and let XLA insert the collectives.
Gradient all-reduce emerges from jit on replicated params + data-sharded
batch — no explicit ``reduce_tensor`` (reference ``distribute.py:6``) is
needed.

Axes convention:
  * ``data``  — batch sharding (DP); default all devices.
  * ``model`` — tensor-parallel axis, reserved for the XTTS GPT decoder.
  * ``seq``   — sequence/context-parallel axis (ring attention,
    ``parallel/ring_attention.py``); size 1 unless requested.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
SEQ_AXIS = "seq"


def get_mesh(
    data: int = -1,
    model: int = 1,
    seq: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ``(data, model, seq)`` mesh.  ``data=-1`` → all remaining
    devices; ``seq`` stays 1 unless sequence parallelism is requested."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        assert n % (model * seq) == 0, f"{n} devices not divisible by {model * seq}"
        data = n // (model * seq)
    assert data * model * seq == n, f"mesh {data}x{model}x{seq} != {n} devices"
    dev_array = np.asarray(devices).reshape(data, model, seq)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS, SEQ_AXIS))


def replicate(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (params)."""
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def with_data_parallel(mesh: Mesh, batch: Any) -> Any:
    """Device-put a host batch with its leading dim sharded over ``data``.

    Short batches are padded (repeating the last sample) up to a multiple of
    the data-axis size so every device gets a shard; padded rows slightly
    re-weight batch statistics, like torch DistributedSampler's sample
    duplication.
    """
    sharding = shard_batch(mesh)
    n = mesh.shape[DATA_AXIS]

    def _put(x):
        x = np.asarray(x)
        b = x.shape[0]
        if b % n != 0:
            reps = ((0, (n - b % n) % n),) + ((0, 0),) * (x.ndim - 1)
            x = np.pad(x, reps, mode="edge")
        return jax.device_put(x, sharding)

    return jax.tree.map(_put, batch)
