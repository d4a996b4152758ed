"""Tensor-parallel sharding rules for the GPT decoder stacks
(XTTS/Tortoise/Bark share :class:`tts_tpu.models.xtts.gpt_core.GPT2Core`).

The reference has **no** tensor parallelism (SURVEY §2.10: DDP only); this
is the genuinely-new capability of the TPU rebuild.  Megatron-style layout
over the reserved ``model`` mesh axis:

  * ``c_attn``/``mlp_fc`` kernels [D, K]: columns (output features) sharded
    → each device computes its slice of heads / hidden units;
  * ``c_proj``/``mlp_proj`` kernels [K, D]: rows (input features) sharded
    → XLA inserts one ``psum`` per block to rebuild the residual stream;
  * LM heads: vocab-sharded columns (logits all-gathered before sampling);
  * everything else (LayerNorms, embeddings, biases of row-sharded mats)
    replicated.

No model code changes: shardings are applied to the *param pytree* with
``NamedSharding`` and jit's sharding propagation (GSPMD) inserts the
collectives.  Per-device memory for the GPT blocks drops ~linearly in the
model-axis size.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS

__all__ = ["gpt_tp_shardings", "COLUMN_SHARDED", "ROW_SHARDED"]

# param-name suffixes (flax path leaves) for the two Megatron shard styles
COLUMN_SHARDED = ("c_attn", "mlp_fc", "mel_head", "text_head", "lm_head")
ROW_SHARDED = ("c_proj", "mlp_proj")


def _spec_for(path: tuple, leaf) -> P:
    names = [getattr(k, "key", getattr(k, "name", str(k))) for k in path]
    for i, name in enumerate(names):
        if name in COLUMN_SHARDED:
            leaf_name = names[-1]
            if leaf_name == "kernel" and leaf.ndim == 2:
                return P(None, MODEL_AXIS)
            if leaf_name == "bias" and leaf.ndim == 1:
                return P(MODEL_AXIS)
        if name in ROW_SHARDED:
            if names[-1] == "kernel" and leaf.ndim == 2:
                return P(MODEL_AXIS, None)
            # bias of a row-sharded matmul is added AFTER the psum →
            # replicated
            return P()
    return P()


def gpt_tp_shardings(params: Any, mesh: Mesh) -> Any:
    """NamedSharding pytree for a GPT param tree (same structure).

    Works for any tree containing GPT2Core blocks; non-GPT params fall
    through to replicated.  Apply with ``jax.device_put(params, shardings)``
    or as jit ``in_shardings``.
    """
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _spec_for(path, leaf)), params
    )
