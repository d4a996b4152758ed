"""VC model registry (reference ``TTS/vc/models/__init__.py``)."""

from __future__ import annotations

import importlib


def setup_model(config):
    if config.model.lower() == "freevc":
        from tts_tpu.vc.models.freevc import FreeVC

        return FreeVC.init_from_config(config)
    raise ModuleNotFoundError(f" [!] Unknown VC model {config.model!r}")
