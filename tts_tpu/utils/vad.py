"""Voice activity detection (reference ``TTS/utils/vad.py``, which wraps
the pretrained Silero-VAD via torch.hub — unavailable in a zero-egress
build).

Two scoring backends share the segment API here:

* a self-contained statistical VAD (per-frame log-energy and spectral-
  flatness features, adaptive noise floor, hysteresis + hangover) that
  needs no weights — the default;
* the learned Silero-v5-layout network in ``vad_silero.py`` (JAX scan on
  the accelerator), used when params are passed explicitly or the
  ``TTS_TPU_SILERO_VAD`` checkpoint path is set.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np


def _frame(wav: np.ndarray, frame_len: int, hop: int) -> np.ndarray:
    n = max(0, (len(wav) - frame_len) // hop + 1)
    if n == 0:
        return np.zeros((1, frame_len), np.float32)
    idx = np.arange(frame_len)[None, :] + hop * np.arange(n)[:, None]
    return wav[idx]


def speech_probabilities(
    wav: np.ndarray,
    sample_rate: int,
    frame_ms: float = 30.0,
    hop_ms: float = 10.0,
) -> Tuple[np.ndarray, int]:
    """Per-frame speech score in [0, 1]; returns (scores, hop_samples).

    Score combines energy above an adaptive noise floor with spectral
    flatness (speech is peaky, broadband noise is flat)."""
    frame_len = int(sample_rate * frame_ms / 1000)
    hop = int(sample_rate * hop_ms / 1000)
    frames = _frame(wav.astype(np.float32), frame_len, hop)
    window = np.hanning(frame_len).astype(np.float32)

    energy_db = 10.0 * np.log10(np.mean(frames**2, axis=1) + 1e-10)
    # adaptive noise floor: mean of the quietest 20% of frames
    floor = np.mean(np.sort(energy_db)[: max(1, len(energy_db) // 5)])
    snr = np.clip((energy_db - floor - 6.0) / 20.0, 0.0, 1.0)

    spec = np.abs(np.fft.rfft(frames * window, axis=1)) + 1e-10
    flatness = np.exp(np.mean(np.log(spec), axis=1)) / np.mean(spec, axis=1)
    tonality = np.clip(1.0 - flatness / 0.5, 0.0, 1.0)  # 1 = peaky/speechlike

    return np.clip(0.7 * snr + 0.3 * snr * tonality, 0.0, 1.0), hop


def get_speech_timestamps(
    wav: np.ndarray,
    sample_rate: int,
    threshold: float = 0.35,
    min_speech_ms: float = 60.0,
    min_silence_ms: float = 200.0,
    pad_ms: float = 30.0,
    model_params=None,
) -> List[Dict[str, int]]:
    """Silero-compatible segment list: ``[{"start": s, "end": e}, …]`` in
    samples.  Hysteresis: frames above ``threshold`` open a segment, it
    closes only after ``min_silence_ms`` below ``0.6*threshold``
    (hangover).

    ``model_params``: converted Silero params (``vad_silero``) switch the
    scorer to the learned network; otherwise the env-configured default
    model is tried, then the statistical scorer."""
    from tts_tpu.utils import vad_silero

    if model_params is None:
        model_params = vad_silero.default_params()
    if model_params is not None:
        scores, hop = vad_silero.frame_scores(model_params, wav, sample_rate)
    else:
        scores, hop = speech_probabilities(wav, sample_rate)
    off_threshold = 0.6 * threshold
    min_speech = int(min_speech_ms / 1000 * sample_rate)
    min_silence_frames = max(1, int(min_silence_ms / (1000 * hop / sample_rate)))
    pad = int(pad_ms / 1000 * sample_rate)

    segments: List[Dict[str, int]] = []
    start = None
    silence_run = 0
    # hop may be fractional (learned VAD at non-16k input rates) — round per
    # boundary so timestamps stay exact over long recordings
    for i, p in enumerate(scores):
        if start is None:
            if p >= threshold:
                start = int(round(i * hop))
                silence_run = 0
        else:
            if p < off_threshold:
                silence_run += 1
                if silence_run >= min_silence_frames:
                    end = int(round((i - silence_run + 1) * hop))
                    if end - start >= min_speech:
                        segments.append({"start": max(0, start - pad),
                                         "end": min(len(wav), end + pad)})
                    start = None
                    silence_run = 0
            else:
                silence_run = 0
    if start is not None:
        end = len(wav)
        if end - start >= min_speech:
            segments.append({"start": max(0, start - pad), "end": end})

    # merge overlapping padded segments
    merged: List[Dict[str, int]] = []
    for seg in segments:
        if merged and seg["start"] <= merged[-1]["end"]:
            merged[-1]["end"] = max(merged[-1]["end"], seg["end"])
        else:
            merged.append(dict(seg))
    return merged


def remove_silence(
    wav: np.ndarray,
    sample_rate: int,
    trim_just_beginning_and_end: bool = True,
    threshold: float = 0.35,
    model_params=None,
) -> Tuple[np.ndarray, bool]:
    """Cut silence using the VAD segments (reference ``vad.py:37``
    ``remove_silence``).  Returns (wav, speech_found).

    ``trim_just_beginning_and_end=True`` (the reference default) keeps
    everything between the first and last speech segment; ``False``
    concatenates only the speech segments."""
    segs = get_speech_timestamps(
        wav, sample_rate, threshold=threshold, model_params=model_params
    )
    if not segs:
        return wav, False
    if trim_just_beginning_and_end:
        return wav[segs[0]["start"] : segs[-1]["end"]], True
    return np.concatenate([wav[s["start"] : s["end"]] for s in segs]), True
