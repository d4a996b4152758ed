"""Tortoise audio frontends (reference
``TTS/tts/layers/tortoise/audio_utils.py`` + ``arch_utils.TorchMelSpectrogram``).

Two mel domains:
  * 80-ch "tacotron" mel @22.05 kHz (HTK scale + slaney area norm, power-2),
    divided by per-channel ``mel_norms`` — conditioning input for the AR
    model (``arch_utils.py:299``).
  * 100-ch univnet mel @24 kHz (slaney scale + slaney norm, magnitude) —
    conditioning input for the diffusion decoder
    (``audio_utils.py:161 wav_to_univnet_mel``).

All transforms are jittable JAX (MXU matmul mels).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from tts_tpu.audio import jax_transforms as jt
from tts_tpu.audio.mel import mel_filterbank

# reference audio_utils.py:74-84
TACOTRON_MEL_MAX = 2.3143386840820312
TACOTRON_MEL_MIN = -11.512925148010254


def denormalize_tacotron_mel(norm_mel):
    return ((norm_mel + 1) / 2) * (TACOTRON_MEL_MAX - TACOTRON_MEL_MIN) + TACOTRON_MEL_MIN


def normalize_tacotron_mel(mel):
    return 2 * ((mel - TACOTRON_MEL_MIN) / (TACOTRON_MEL_MAX - TACOTRON_MEL_MIN)) - 1


def tacotron_mel(wav: jnp.ndarray, mel_norms: Optional[np.ndarray] = None) -> jnp.ndarray:
    """[B, T] 22.05 kHz wav → [B, T_frames, 80] log-mel / mel_norms
    (reference ``TorchMelSpectrogram`` — torchaudio defaults: power 2,
    htk mel scale, slaney area norm, center reflect pad)."""
    mag = jt.stft_magnitude(wav, 1024, 256, 1024, center=True)
    basis = jnp.asarray(
        mel_filterbank(22050, 1024, 80, fmin=0.0, fmax=8000.0, htk=True, norm="slaney")
    )
    mel = jnp.einsum("mk,bkt->bmt", basis, mag**2)
    mel = jnp.log(jnp.clip(mel, min=1e-5))
    if mel_norms is not None:
        mel = mel / jnp.asarray(mel_norms)[None, :, None]
    return jnp.swapaxes(mel, 1, 2)


def wav_to_univnet_mel(wav: jnp.ndarray, do_normalization: bool = False) -> jnp.ndarray:
    """[B, T] 24 kHz wav → [B, T_frames, 100] log-mel
    (reference ``audio_utils.py:161`` — magnitude mel, slaney scale)."""
    stft = jt.TorchSTFT(
        n_fft=1024, hop_length=256, win_length=1024, use_mel=True, n_mels=100,
        sample_rate=24000, mel_fmin=0.0, mel_fmax=12000.0,
    )
    mel = jnp.log(jnp.clip(stft(wav), min=1e-5))
    if do_normalization:
        mel = normalize_tacotron_mel(mel)
    return jnp.swapaxes(mel, 1, 2)


def pad_or_truncate(wav: np.ndarray, length: int) -> np.ndarray:
    """[..., T] → [..., length] by zero-pad or head-truncate (reference
    ``audio_utils.py`` pad_or_truncate; deterministic start instead of the
    reference's random crop)."""
    wav = np.asarray(wav, np.float32)
    t = wav.shape[-1]
    if t < length:
        pad = [(0, 0)] * (wav.ndim - 1) + [(0, length - t)]
        return np.pad(wav, pad)
    return wav[..., :length]


def format_conditioning(clip: np.ndarray, mel_norms: Optional[np.ndarray] = None,
                        cond_length: int = 132300) -> jnp.ndarray:
    """One 22.05 kHz reference clip [T] → [1, T_frames, 80] conditioning mel
    (reference ``models/tortoise.py:75 format_conditioning``)."""
    clip = pad_or_truncate(np.asarray(clip, np.float32).reshape(-1), cond_length)
    return tacotron_mel(jnp.asarray(clip)[None], mel_norms=mel_norms)
