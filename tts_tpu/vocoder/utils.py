"""Vocoder glue (reference ``TTS/vocoder/utils/generic_utils.py``)."""

from __future__ import annotations

import numpy as np


def interpolate_vocoder_input(scale_factor, spec: np.ndarray) -> np.ndarray:
    """Rescale a spectrogram in time for TTS→vocoder sample-rate mismatch
    (reference ``generic_utils.py:11`` — torch ``F.interpolate`` with
    ``scale_factor``, bilinear, align_corners=False, recompute_scale_factor
    semantics on the time axis).

    spec: ``[C, T]`` → ``[C, round(T * scale)]``.
    """
    scale = float(scale_factor[1] if isinstance(scale_factor, (list, tuple)) else scale_factor)
    C, T = spec.shape
    T_out = int(np.floor(T * scale))
    # torch bilinear align_corners=False coordinate mapping:
    # in_x = (out_x + 0.5) / scale - 0.5
    out_x = (np.arange(T_out, dtype=np.float64) + 0.5) / scale - 0.5
    x0 = np.floor(out_x).astype(np.int64)
    frac = (out_x - x0).astype(spec.dtype)
    x0c = np.clip(x0, 0, T - 1)
    x1c = np.clip(x0 + 1, 0, T - 1)
    return spec[:, x0c] * (1.0 - frac) + spec[:, x1c] * frac


def make_generator_from_config(config):
    """Instantiate the generator named by ``config.generator_model`` with its
    config params (reference ``vocoder/models/__init__.py:34 setup_generator``),
    filling the conditioning-width field from ``config.audio.num_mels``."""
    from tts_tpu.vocoder.models import setup_generator

    name = config.generator_model.lower()
    params = dict(getattr(config, "generator_model_params", None) or {})
    if not params:
        # WaveGrad/UnivNet keep generator params in model_params
        params = dict(getattr(config, "model_params", None) or {})
    if not params:
        params = dict(getattr(config, "model_args", None) or {})
    num_mels = config.audio.num_mels
    cls = setup_generator(name)
    if "melgan" in name or name == "hifigan_generator":
        params.setdefault("in_channels", num_mels)
    elif name == "parallel_wavegan_generator":
        params.setdefault("aux_channels", num_mels)
    elif name == "univnet_generator":
        params.setdefault("cond_channels", num_mels)
    elif name == "wavernn":
        params.setdefault("feat_dims", num_mels)
        params.setdefault("mode", getattr(config, "mode", "mold"))
        params.setdefault("mulaw", getattr(config, "mulaw", True))
        # converted reference checkpoints carry folded eval-mode BatchNorms
        params.setdefault("norm_type", "folded")
    # keep only fields the flax module declares (zoo configs may carry extras
    # like use_weight_norm that are meaningless after conversion)
    import dataclasses

    valid = {f.name for f in dataclasses.fields(cls)}
    params = {k: v for k, v in params.items() if k in valid}
    return cls(**params)
