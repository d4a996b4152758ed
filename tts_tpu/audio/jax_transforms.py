"""Jittable on-device audio transforms (JAX, TPU-first).

Replaces the reference's in-graph DSP — ``TorchSTFT``
(``TTS/utils/audio/torch_transforms.py:6``) and the VITS training-time
mel path (``TTS/tts/models/vits.py:96-176`` ``wav_to_spec`` /
``spec_to_mel`` / ``wav_to_mel``) — with a TPU-native design:

Instead of an FFT, the windowed DFT is expressed as a single strided
convolution whose kernel holds the windowed cos/sin basis.  XLA lowers
this to an im2col matmul on the MXU and fuses the subsequent
magnitude/mel/log elementwise chain, so one fused HLO computes
wav → log-mel with no host round trips.  For ``fft_size`` ≤ 2048 the
O(N·K) matmul beats FFT butterflies on TPU because it runs at MXU
throughput with perfect tiling (K = fft_size//2+1 ≈ 513 → padded to 640
lanes internally by XLA).

All functions are pure, shape-static, and safe under ``jit``/``pjit``.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.signal

from .mel import mel_filterbank

__all__ = [
    "stft_basis",
    "stft_magnitude",
    "wav_to_spec",
    "spec_to_mel",
    "wav_to_mel",
    "amp_to_db",
    "db_to_amp",
    "spectral_norm_log",
    "TorchSTFT",
]


@functools.lru_cache(maxsize=16)
def stft_basis(fft_size: int, win_length: int, window: str = "hann") -> np.ndarray:
    """Windowed DFT basis as a conv kernel ``[2*(fft_size//2+1), 1, fft_size]``.

    Rows ``0..K-1`` are the real (cos) parts, rows ``K..2K-1`` the imaginary
    (-sin) parts, each multiplied by the analysis window (periodic Hann by
    default), matching ``np.fft.rfft(frame * window)``.
    """
    n_bins = fft_size // 2 + 1
    w = scipy.signal.get_window(window, win_length, fftbins=True)
    lpad = (fft_size - win_length) // 2
    w = np.pad(w, (lpad, fft_size - win_length - lpad))
    n = np.arange(fft_size)
    k = np.arange(n_bins)[:, None]
    ang = 2.0 * np.pi * k * n[None, :] / fft_size
    basis = np.concatenate([np.cos(ang), -np.sin(ang)], axis=0) * w[None, :]
    return basis.astype(np.float32)[:, None, :]  # [2K, 1, fft_size]


def _pad_signal(y: jnp.ndarray, fft_size: int, hop_length: int, center: bool, pad_mode: str, pad_wav: bool) -> jnp.ndarray:
    if center:
        p = fft_size // 2
    elif pad_wav:
        # VITS-style padding: (n_fft - hop) / 2 on both sides (vits.py:118-123)
        p = (fft_size - hop_length) // 2
    else:
        return y
    mode = "reflect" if pad_mode == "reflect" else "constant"
    return jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(p, p)], mode=mode)


def stft_real_imag(
    y: jnp.ndarray,
    fft_size: int,
    hop_length: int,
    win_length: int,
    window: str = "hann",
    center: bool = True,
    pad_mode: str = "reflect",
    pad_wav: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """STFT via DFT-matmul convolution.

    Args:
        y: waveform ``[B, T]`` (or ``[T]``).
    Returns:
        (real, imag) each ``[B, K, n_frames]`` with ``K = fft_size//2 + 1``.
    """
    squeeze = y.ndim == 1
    if squeeze:
        y = y[None]
    y = _pad_signal(y, fft_size, hop_length, center, pad_mode, pad_wav)
    kernel = jnp.asarray(stft_basis(fft_size, win_length, window))
    out = jax.lax.conv_general_dilated(
        y[:, None, :].astype(jnp.float32),
        kernel,
        window_strides=(hop_length,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [B, 2K, n_frames]
    n_bins = fft_size // 2 + 1
    re, im = out[:, :n_bins], out[:, n_bins:]
    if squeeze:
        re, im = re[0], im[0]
    return re, im


def stft_magnitude(
    y: jnp.ndarray,
    fft_size: int,
    hop_length: int,
    win_length: int,
    window: str = "hann",
    center: bool = True,
    pad_mode: str = "reflect",
    pad_wav: bool = False,
    eps: float = 1e-9,
) -> jnp.ndarray:
    re, im = stft_real_imag(y, fft_size, hop_length, win_length, window, center, pad_mode, pad_wav)
    return jnp.sqrt(re * re + im * im + eps)


def wav_to_spec(
    y: jnp.ndarray, n_fft: int, hop_length: int, win_length: int, center: bool = False
) -> jnp.ndarray:
    """VITS-convention linear magnitude spectrogram ``[B, K, T]``
    (reference ``vits.py:96-139``: center=False with (n_fft-hop)/2 reflect
    padding and ``sqrt(pow+1e-6)`` magnitude)."""
    return stft_magnitude(
        y, n_fft, hop_length, win_length, center=center, pad_wav=not center, eps=1e-6
    )


@functools.lru_cache(maxsize=16)
def _mel_basis_np(sample_rate: int, n_fft: int, num_mels: int, fmin: float, fmax: Optional[float]) -> np.ndarray:
    return mel_filterbank(sample_rate, n_fft, num_mels, fmin=fmin, fmax=fmax)


def spectral_norm_log(x: jnp.ndarray, clip_val: float = 1e-5) -> jnp.ndarray:
    """Dynamic-range compression ``log(clamp(x, clip_val))`` (vits.py:74)."""
    return jnp.log(jnp.clip(x, min=clip_val))


def spec_to_mel(
    spec: jnp.ndarray, n_fft: int, num_mels: int, sample_rate: int, fmin: float = 0.0, fmax: Optional[float] = None
) -> jnp.ndarray:
    """Linear spectrogram ``[B, K, T]`` → log-mel ``[B, M, T]`` (vits.py:141)."""
    basis = jnp.asarray(_mel_basis_np(sample_rate, n_fft, num_mels, fmin, fmax))
    mel = jnp.einsum("mk,bkt->bmt", basis, spec, preferred_element_type=jnp.float32)
    return spectral_norm_log(mel)


def wav_to_mel(
    y: jnp.ndarray,
    n_fft: int,
    num_mels: int,
    sample_rate: int,
    hop_length: int,
    win_length: int,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
    center: bool = False,
) -> jnp.ndarray:
    """Fused wav → log-mel (one XLA fusion chain; reference ``vits.py:160``)."""
    spec = wav_to_spec(y, n_fft, hop_length, win_length, center=center)
    return spec_to_mel(spec, n_fft, num_mels, sample_rate, fmin, fmax)


def amp_to_db(x: jnp.ndarray, gain: float = 1.0, base: float = 10.0) -> jnp.ndarray:
    logx = jnp.log10(jnp.maximum(1e-8, x)) if base == 10 else jnp.log(jnp.maximum(1e-8, x))
    return gain * logx


def db_to_amp(x: jnp.ndarray, gain: float = 1.0, base: float = 10.0) -> jnp.ndarray:
    return jnp.power(10.0, x / gain) if base == 10 else jnp.exp(x / gain)


class TorchSTFT:
    """Config-carrying callable matching the reference's ``TorchSTFT``
    surface (``torch_transforms.py:6-165``): ``__call__(wav) -> magnitude
    [B, K, T]`` and mel when ``use_mel_basis``.  Stateless; all compute is
    jittable JAX."""

    def __init__(
        self,
        n_fft: int,
        hop_length: int,
        win_length: int,
        pad_wav: bool = False,
        window: str = "hann_window",
        sample_rate: Optional[int] = None,
        mel_fmin: float = 0.0,
        mel_fmax: Optional[float] = None,
        n_mels: int = 80,
        use_mel: bool = False,
        do_amp_to_db: bool = False,
        spec_gain: float = 1.0,
        power: Optional[float] = None,
        use_htk: bool = False,
        mel_norm: Optional[str] = "slaney",
        normalized: bool = False,
    ):
        self.n_fft = n_fft
        self.hop_length = hop_length
        self.win_length = win_length
        self.pad_wav = pad_wav
        self.sample_rate = sample_rate
        self.mel_fmin = mel_fmin
        self.mel_fmax = mel_fmax
        self.n_mels = n_mels
        self.use_mel = use_mel
        self.do_amp_to_db = do_amp_to_db
        self.spec_gain = spec_gain
        self.power = power
        self.normalized = normalized
        self._mel_basis = (
            mel_filterbank(sample_rate, n_fft, n_mels, fmin=mel_fmin, fmax=mel_fmax) if use_mel else None
        )

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        mag = stft_magnitude(
            x,
            self.n_fft,
            self.hop_length,
            self.win_length,
            center=not self.pad_wav,
            pad_wav=self.pad_wav,
            eps=1e-8,
        )
        if self.normalized:
            mag = mag / jnp.sqrt(jnp.asarray(self.win_length, jnp.float32))
        if self.power is not None:
            mag = mag**self.power
        if self.use_mel:
            mag = jnp.einsum("mk,...kt->...mt", jnp.asarray(self._mel_basis), mag)
        if self.do_amp_to_db:
            mag = amp_to_db(mag, gain=self.spec_gain)
        return mag
