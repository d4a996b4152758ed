"""Checkpoint save/load (replaces reference ``TTS/utils/io.py`` torch.save
checkpoints with flax msgpack serialization).

A checkpoint is a single msgpack file holding ``{"params": pytree_bytes,
"config": config_dict, "meta": {...}}``-style structure via
``flax.serialization``; the config rides inside so ``load_checkpoint``
can rebuild the model exactly like the reference's
``{"model": state_dict, "config": ...}`` dicts (``io.py:65``).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import flax.serialization
import jax
import numpy as np

__all__ = ["save_checkpoint", "load_checkpoint", "load_checkpoint_full", "save_config", "load_config_dict"]


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(
    path: str, params: Any, config=None, meta: Optional[Dict] = None, opt_states: Any = None
) -> None:
    """Serialize params (+config dict, +meta, +optimizer state) to one
    msgpack file.  ``opt_states`` (any optax state pytree) is stored via
    ``flax.serialization.to_state_dict`` so ``--continue_path`` resumes
    Adam moments and LR schedules exactly (reference trainer resume)."""
    payload = {
        "params": _to_host(params),
        "config": config.to_dict() if config is not None and hasattr(config, "to_dict") else (config or {}),
        "meta": meta or {},
    }
    if opt_states is not None:
        payload["opt_states"] = _to_host(flax.serialization.to_state_dict(opt_states))
    data = flax.serialization.msgpack_serialize(payload)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(data)


def load_checkpoint(path: str) -> Tuple[Any, Dict, Dict]:
    """Returns (params, config_dict, meta)."""
    with open(path, "rb") as f:
        payload = flax.serialization.msgpack_restore(f.read())
    return payload["params"], payload.get("config", {}), payload.get("meta", {})


def load_checkpoint_full(path: str) -> Dict:
    """Returns the raw checkpoint payload dict (params/config/meta/opt_states)."""
    with open(path, "rb") as f:
        return flax.serialization.msgpack_restore(f.read())


def save_config(config, path: str) -> None:
    with open(path, "w", encoding="utf-8") as f:
        json.dump(config.to_dict() if hasattr(config, "to_dict") else config, f, indent=2, default=str)


def load_config_dict(path: str) -> Dict:
    with open(path, "r", encoding="utf-8") as f:
        return json.load(f)
