"""Checkpoint save/load (replaces reference ``TTS/utils/io.py`` torch.save
checkpoints with flax msgpack serialization).

A checkpoint is a single msgpack file holding ``{"params": pytree_bytes,
"config": config_dict, "meta": {...}}``-style structure via
``flax.serialization``; the config rides inside so ``load_checkpoint``
can rebuild the model exactly like the reference's
``{"model": state_dict, "config": ...}`` dicts (``io.py:65``).

Paths may be remote URLs (``s3://``, ``gs://``, ``hf://``, ``http(s)://``,
``memory://`` …): they are routed through fsspec, with remote reads
optionally cached to ``~/.cache/tts_tpu`` (reference ``load_fsspec``,
``TTS/utils/io.py:27-54``).  Plain local paths never touch fsspec.
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


def _is_remote(path) -> bool:
    p = str(path)
    return "://" in p and not p.startswith("file://")


def _open(path, mode: str, cache: bool = False):
    """Local paths → builtin ``open``; URLs → fsspec (optionally through a
    local file cache for reads, like the reference ``load_fsspec``)."""
    if not _is_remote(path):
        if "b" in mode:
            return open(path, mode)
        return open(path, mode, encoding="utf-8")
    import fsspec

    if cache and "r" in mode:
        cache_dir = os.path.join(
            os.path.expanduser("~"), ".cache", "tts_tpu", "fsspec"
        )
        return fsspec.open(
            f"filecache::{path}", mode, filecache={"cache_storage": cache_dir}
        ).open()
    return fsspec.open(path, mode).open()


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
    if not _is_remote(path):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with _open(path, "wb") as f:
        f.write(data)


def load_checkpoint(path: str, cache: bool = True) -> Tuple[Any, Dict, Dict]:
    """Returns (params, config_dict, meta).  Remote URLs are cached locally
    on first read when ``cache`` (reference io.py:27 ``load_fsspec``)."""
    with _open(path, "rb", cache=cache) as f:
        payload = flax.serialization.msgpack_restore(f.read())
    return payload["params"], payload.get("config", {}), payload.get("meta", {})


def load_checkpoint_full(path: str, cache: bool = True) -> Dict:
    """Returns the raw checkpoint payload dict (params/config/meta/opt_states)."""
    with _open(path, "rb", cache=cache) as f:
        return flax.serialization.msgpack_restore(f.read())


def save_config(config, path: str) -> None:
    with _open(path, "w") as f:
        json.dump(config.to_dict() if hasattr(config, "to_dict") else config, f, indent=2, default=str)


def load_config_dict(path: str) -> Dict:
    with _open(path, "r") as f:
        return json.load(f)
