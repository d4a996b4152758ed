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

__all__ = ["save_checkpoint", "load_checkpoint", "save_config", "load_config_dict"]


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, params: Any, config=None, meta: Optional[Dict] = None) -> None:
    """Serialize params (+config dict, +meta) to one msgpack file."""
    payload = {
        "params": _to_host(params),
        "config": config.to_dict() if config is not None and hasattr(config, "to_dict") else (config or {}),
        "meta": meta or {},
    }
    data = flax.serialization.msgpack_serialize(payload)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(data)


def load_checkpoint(path: str) -> Tuple[Any, Dict, Dict]:
    """Returns (params, config_dict, meta)."""
    with open(path, "rb") as f:
        payload = flax.serialization.msgpack_restore(f.read())
    return payload["params"], payload.get("config", {}), payload.get("meta", {})


def save_config(config, path: str) -> None:
    with open(path, "w", encoding="utf-8") as f:
        json.dump(config.to_dict() if hasattr(config, "to_dict") else config, f, indent=2, default=str)


def load_config_dict(path: str) -> Dict:
    with open(path, "r", encoding="utf-8") as f:
        return json.load(f)
