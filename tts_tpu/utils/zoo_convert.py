"""Zoo checkpoint conversion: torch ``.pth`` → flax msgpack, dispatched by
the model name in the downloaded ``config.json``.

This is the glue that makes ``tts --model_name <zoo entry> --text ...``
work end-to-end (reference flow ``TTS/utils/manage.py:371`` +
``synthesize.py:144``): ``ModelManager.download_model`` calls
:func:`ensure_flax_checkpoint` on first use; the converted checkpoint is
cached beside the torch original as ``<name>_flax.msgpack``.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Optional, Tuple

import numpy as np

__all__ = ["ensure_flax_checkpoint", "convert_zoo_checkpoint", "CONVERTERS"]


def _strip_prefix(state: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    if any(k.startswith(prefix) for k in state):
        return {k[len(prefix):]: v for k, v in state.items() if k.startswith(prefix)}
    return state


# ---------------------------------------------------------------------------
# per-model converters: (torch state dict, loaded config) -> flax params tree
# ---------------------------------------------------------------------------


def _convert_vits(state, config):
    from tts_tpu.utils.convert import convert_vits_generator

    state = {k: v for k, v in state.items() if "speaker_encoder" not in k}
    return convert_vits_generator(state, config.model_args)


def _convert_glow_tts(state, config):
    from tts_tpu.utils.convert import convert_glow_tts

    return convert_glow_tts(state, config)


def _convert_tacotron2(state, config):
    from tts_tpu.utils.convert import convert_tacotron2

    config.norm_type = "folded"
    return convert_tacotron2(state, r=getattr(config, "r", 2))


def _convert_forward_tts(state, config):
    from tts_tpu.utils.convert import convert_forward_tts

    return convert_forward_tts(state, config.model_args)


def _convert_overflow(state, config):
    from tts_tpu.utils.convert import convert_overflow

    config.norm_type = "folded"
    if "mean" in state:
        config.mel_statistics_mean = float(state["mean"])
        config.mel_statistics_std = float(state["std"])
    return convert_overflow(state, config)


def _convert_hifigan(state, config):
    from tts_tpu.utils.convert import convert_hifigan_generator

    return convert_hifigan_generator(_strip_prefix(state, "model_g."))


def _convert_melgan(state, config):
    from tts_tpu.utils.convert import convert_melgan_generator

    gp = config.generator_model_params
    return convert_melgan_generator(
        _strip_prefix(state, "model_g."),
        num_upsample_stages=len(gp["upsample_factors"]),
        num_res_blocks=gp.get("num_res_blocks", 3),
    )


def _convert_parallel_wavegan(state, config):
    from tts_tpu.utils.convert import convert_parallel_wavegan_generator

    gp = config.generator_model_params
    return convert_parallel_wavegan_generator(
        _strip_prefix(state, "model_g."),
        num_res_blocks=gp.get("num_res_blocks", 30),
        num_upsample_stages=len(gp.get("upsample_factors", [4, 4, 4, 4])),
    )


def _convert_univnet(state, config):
    from tts_tpu.utils.convert import convert_univnet_generator

    gp = getattr(config, "generator_model_params", None) or getattr(config, "model_params", {}) or {}
    return convert_univnet_generator(
        _strip_prefix(state, "model_g."),
        num_blocks=len(gp.get("upsample_factors", [8, 8, 4])),
    )


def _convert_wavegrad(state, config):
    from tts_tpu.utils.convert import convert_wavegrad

    return convert_wavegrad(state)


def _convert_speaker_encoder(state, config):
    from tts_tpu.utils.convert import convert_speaker_encoder

    return convert_speaker_encoder(state, config)


def _convert_wavernn(state, config):
    from tts_tpu.utils.convert import convert_wavernn

    ma = getattr(config, "model_args", {}) or {}
    return convert_wavernn(
        state,
        num_res_blocks=ma.get("num_res_blocks", 10),
        num_upsample_stages=len(ma.get("upsample_factors", [4, 8, 8])),
    )


def _convert_freevc(state, config):
    from tts_tpu.utils.convert import convert_freevc

    return convert_freevc(state, config)


CONVERTERS: Dict[str, Callable] = {
    "freevc": _convert_freevc,
    "freevc24": _convert_freevc,
    "vits": _convert_vits,
    "glow_tts": _convert_glow_tts,
    "tacotron2": _convert_tacotron2,
    "overflow": _convert_overflow,
    "neuralhmm_tts": _convert_overflow,
    "fast_pitch": _convert_forward_tts,
    "fast_speech": _convert_forward_tts,
    "fastspeech2": _convert_forward_tts,
    "forward_tts": _convert_forward_tts,
    "hifigan": _convert_hifigan,
    "melgan": _convert_melgan,
    "fullband_melgan": _convert_melgan,
    "multiband_melgan": _convert_melgan,
    "parallel_wavegan": _convert_parallel_wavegan,
    "univnet": _convert_univnet,
    "wavegrad": _convert_wavegrad,
    "wavernn": _convert_wavernn,
    "speaker_encoder": _convert_speaker_encoder,
    "emotion_encoder": _convert_speaker_encoder,
}


def register_zoo_converter(model_name: str, fn: Callable) -> None:
    CONVERTERS[model_name.lower()] = fn


def convert_zoo_checkpoint(model_path: str, config_path: str, out_path: str) -> str:
    """Convert one torch checkpoint to a flax msgpack with the config
    embedded.  Raises ``KeyError`` if no converter covers the model."""
    from tts_tpu.config import _process_model_name, load_config, read_json_with_comments
    from tts_tpu.utils.convert import load_torch_checkpoint
    from tts_tpu.utils.io import save_checkpoint

    config = load_config(config_path)
    config_dict = read_json_with_comments(config_path)
    name = _process_model_name(config_dict).lower()
    if name not in CONVERTERS:
        raise KeyError(
            f"No torch→flax converter for model {name!r} yet "
            f"(have: {sorted(CONVERTERS)})."
        )
    state = load_torch_checkpoint(model_path)
    params = CONVERTERS[name](state, config)
    save_checkpoint(out_path, params, config=config, meta={"converted_from": os.path.basename(model_path)})

    # persist conversion-time adjustments (folded BatchNorms, mel statistics)
    # back into the zoo config.json so loading via --config_path matches the
    # converted weights (the reference likewise rewrites downloaded configs,
    # manage.py:463 _update_paths)
    import json

    updates = {}
    for key in ("norm_type", "mel_statistics_mean", "mel_statistics_std"):
        if hasattr(config, key) and getattr(config, key) is not None:
            if config_dict.get(key) != getattr(config, key):
                updates[key] = getattr(config, key)
    if updates:
        config_dict.update(updates)
        with open(config_path, "w") as f:
            json.dump(config_dict, f, indent=2, default=str)
    return out_path


def ensure_flax_checkpoint(
    model_path: str, config_path: Optional[str]
) -> Tuple[str, Optional[str]]:
    """If ``model_path`` is a torch checkpoint, convert (once) and return the
    cached msgpack path instead.  msgpack/dir paths pass through untouched."""
    if model_path.endswith((".msgpack", ".flax")) or os.path.isdir(model_path):
        return model_path, config_path
    if not model_path.endswith((".pth", ".pth.tar", ".pt", ".ckpt")):
        return model_path, config_path
    base = model_path
    for suffix in (".pth.tar", ".pth", ".pt", ".ckpt"):
        if base.endswith(suffix):
            base = base[: -len(suffix)]
            break
    out_path = base + "_flax.msgpack"
    if not os.path.isfile(out_path):
        if config_path is None:
            raise ValueError(
                f"Cannot convert {model_path}: no config.json found beside it."
            )
        print(f" > Converting {model_path} → {out_path}")
        convert_zoo_checkpoint(model_path, config_path, out_path)
    return out_path, config_path
