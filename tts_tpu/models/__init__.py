"""Model registry (reference ``TTS/tts/models/__init__.py:6`` setup_model).

Maps ``config.model`` strings to model classes via lazy imports.
"""

from __future__ import annotations

import importlib
from typing import Dict

_MODEL_REGISTRY: Dict[str, str] = {
    "glow_tts": "tts_tpu.models.glow_tts.model:GlowTTS",
    "vits": "tts_tpu.models.vits.model:Vits",
    "fast_pitch": "tts_tpu.models.forward_tts.model:ForwardTTS",
    "fast_speech": "tts_tpu.models.forward_tts.model:ForwardTTS",
    "fastspeech2": "tts_tpu.models.forward_tts.model:ForwardTTS",
    "speedy_speech": "tts_tpu.models.forward_tts.model:ForwardTTS",
    "forward_tts": "tts_tpu.models.forward_tts.model:ForwardTTS",
    "align_tts": "tts_tpu.models.align_tts.model:AlignTTS",
    "tacotron2": "tts_tpu.models.tacotron2.model:Tacotron2",
    "tacotron": "tts_tpu.models.tacotron2.tacotron_v1:Tacotron",
    "overflow": "tts_tpu.models.overflow.model:Overflow",
    "neuralhmm_tts": "tts_tpu.models.overflow.model:NeuralhmmTTS",
    "delightful_tts": "tts_tpu.models.delightful_tts.model:DelightfulTTS",
    "xtts": "tts_tpu.models.xtts.model:Xtts",
    "tortoise": "tts_tpu.models.tortoise.model:Tortoise",
    "bark": "tts_tpu.models.bark.model:Bark",
}


def setup_model(config, samples=None):
    """Instantiate the model class for ``config.model`` and call its
    ``init_from_config`` (reference ``tts/models/__init__.py:6``)."""
    model_cls = find_model(config.model.lower())
    return model_cls.init_from_config(config, samples)


def find_model(name: str):
    if name not in _MODEL_REGISTRY:
        raise ModuleNotFoundError(f" [!] Unknown model name {name!r}")
    mod_name, cls_name = _MODEL_REGISTRY[name].split(":")
    return getattr(importlib.import_module(mod_name), cls_name)


def register_model(name: str, target: str) -> None:
    _MODEL_REGISTRY[name.lower()] = target
