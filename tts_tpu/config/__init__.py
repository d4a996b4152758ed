"""Config loading and model-name → config-class resolution.

Mirrors reference ``TTS/config/__init__.py:23-101``: ``load_config`` reads a
(comment-tolerant) JSON or YAML file, figures out the model name, and
instantiates the registered config class; ``register_config`` maps
``config.model`` strings to config classes.
"""

from __future__ import annotations

import importlib
import json
import os
import re
from typing import Any, Dict, Optional, Type

from .base import Config, dataclass, field
from .shared import (
    BaseAudioConfig,
    BaseDatasetConfig,
    BaseTrainingConfig,
    BaseTTSConfig,
    CharactersConfig,
)

__all__ = [
    "Config",
    "BaseAudioConfig",
    "BaseDatasetConfig",
    "BaseTrainingConfig",
    "BaseTTSConfig",
    "CharactersConfig",
    "load_config",
    "register_config",
    "read_json_with_comments",
]

# model name (lowercase) -> "module path:ClassName"; modules are imported lazily
# so importing tts_tpu.config stays cheap.
_CONFIG_REGISTRY: Dict[str, str] = {
    "glow_tts": "tts_tpu.models.glow_tts.config:GlowTTSConfig",
    "vits": "tts_tpu.models.vits.config:VitsConfig",
    "fast_pitch": "tts_tpu.models.forward_tts.config:FastPitchConfig",
    "fast_speech": "tts_tpu.models.forward_tts.config:FastSpeechConfig",
    "fastspeech2": "tts_tpu.models.forward_tts.config:Fastspeech2Config",
    "speedy_speech": "tts_tpu.models.forward_tts.config:SpeedySpeechConfig",
    "align_tts": "tts_tpu.models.align_tts.config:AlignTTSConfig",
    "tacotron2": "tts_tpu.models.tacotron2.config:Tacotron2Config",
    "tacotron": "tts_tpu.models.tacotron2.config:TacotronConfig",
    "overflow": "tts_tpu.models.overflow.config:OverflowConfig",
    "neuralhmm_tts": "tts_tpu.models.overflow.config:NeuralhmmTTSConfig",
    "delightful_tts": "tts_tpu.models.delightful_tts.config:DelightfulTTSConfig",
    "xtts": "tts_tpu.models.xtts.config:XttsConfig",
    "tortoise": "tts_tpu.models.tortoise.config:TortoiseConfig",
    "bark": "tts_tpu.models.bark.config:BarkConfig",
    # vocoders
    "hifigan": "tts_tpu.vocoder.configs:HifiganConfig",
    "melgan": "tts_tpu.vocoder.configs:MelganConfig",
    "multiband_melgan": "tts_tpu.vocoder.configs:MultibandMelganConfig",
    "fullband_melgan": "tts_tpu.vocoder.configs:FullbandMelganConfig",
    "parallel_wavegan": "tts_tpu.vocoder.configs:ParallelWaveganConfig",
    "univnet": "tts_tpu.vocoder.configs:UnivnetConfig",
    "wavegrad": "tts_tpu.vocoder.configs:WavegradConfig",
    "wavernn": "tts_tpu.vocoder.configs:WavernnConfig",
    "gan": "tts_tpu.vocoder.configs:GANConfig",
    # encoder
    "speaker_encoder": "tts_tpu.encoder.configs:SpeakerEncoderConfig",
    "emotion_encoder": "tts_tpu.encoder.configs:EmotionEncoderConfig",
    # bespoke encoder-loop configs name the net directly (train_encoder)
    "lstm": "tts_tpu.encoder.configs:SpeakerEncoderConfig",
    "resnet": "tts_tpu.encoder.configs:SpeakerEncoderConfig",
    # vc
    "freevc": "tts_tpu.vc.configs:FreeVCConfig",
}


def register_config(model_name: str, target: Any = None):
    """Register a config class (or "module:Class" string) for a model name.

    Usable as a plain call or to look up: ``register_config("vits")`` returns
    the config class (reference ``config/__init__.py:23``)."""
    model_name = model_name.lower()
    if target is not None:
        _CONFIG_REGISTRY[model_name] = target
        return target
    if model_name not in _CONFIG_REGISTRY:
        raise ModuleNotFoundError(f" [!] No config found for model {model_name!r}")
    entry = _CONFIG_REGISTRY[model_name]
    if isinstance(entry, str):
        mod_name, cls_name = entry.split(":")
        entry = getattr(importlib.import_module(mod_name), cls_name)
    return entry


def _process_model_name(config_dict: Dict) -> str:
    """Extract the model name, handling legacy vocoder names with a
    ``generator_model`` field (reference ``config/__init__.py:48-60``)."""
    model_name = config_dict["model"] if "model" in config_dict else config_dict.get("generator_model", "")
    model_name = model_name.replace("_generator", "").replace("_discriminator", "")
    return model_name


def read_json_with_comments(json_path: str) -> Dict:
    """Read a JSON file tolerating ``//`` and ``/* */`` comments."""
    with open(json_path, "r", encoding="utf-8") as f:
        data = f.read()
    data = re.sub(r"\\\n", "", data)
    data = re.sub(r"//.*\n", "\n", data)
    data = re.sub(r"/\*(.|\n)*?\*/", "", data)
    return json.loads(data)


def load_config(config_path: str) -> Config:
    """Load a config file (json/yaml), resolve its model config class, and
    return the populated config (reference ``config/__init__.py:68-101``)."""
    config_dict: Dict[str, Any] = {}
    ext = os.path.splitext(config_path)[1]
    if ext in (".yml", ".yaml"):
        import yaml

        with open(config_path, "r", encoding="utf-8") as f:
            data = yaml.safe_load(f)
    elif ext == ".json":
        try:
            with open(config_path, "r", encoding="utf-8") as f:
                data = json.load(f)
        except json.JSONDecodeError:
            data = read_json_with_comments(config_path)
    else:
        raise TypeError(f" [!] Unknown config file type {ext}")
    config_dict.update(data)
    model_name = _process_model_name(config_dict)
    config_class = register_config(model_name.lower())
    return config_class.from_dict(config_dict)
