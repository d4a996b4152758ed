"""HiFiGAN with an inverse-STFT synthesis head (MB-iSTFT-VITS,
arXiv:2210.15975 "Lightweight and High-Fidelity End-to-End Text-to-Speech
with Multi-Band Generation and Inverse Short-Time Fourier Transform").

The stock HiFiGAN spends most of its time in the last transposed-conv
stages, which run at near-waveform rate and are HBM-bandwidth-bound. This
variant keeps only the first upsample stages and synthesizes the final
``istft_hop`` (optionally ``× subbands`` with PQMF) samples per frame with
an inverse STFT of a predicted (log-magnitude, phase) spectrum — irfft +
overlap-add, dense MXU-shaped math at frame rate instead of long
elementwise convs at sample rate. No reference counterpart (the reference
ships plain HiFiGAN only); weight converters therefore don't apply — this
generator is for training new models.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from tts_tpu.layers.common import Conv1d
from tts_tpu.vocoder.layers import TorchConvTranspose1d, leaky_relu
from tts_tpu.vocoder.models.hifigan_generator import ResBlock1, ResBlock2


def istft_overlap_add(mag: jnp.ndarray, phase: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """[B, T, n_fft//2+1] (linear magnitude, phase radians) → [B, T*hop]
    waveform via windowed irfft + overlap-add, normalized by the window-
    square envelope (torch.istft convention, COLA-safe for hop ≤ n_fft/4
    with a Hann window)."""
    if hop > n_fft or n_fft % hop != 0:
        raise ValueError(
            f"istft_overlap_add requires hop <= n_fft and n_fft % hop == 0 "
            f"(got n_fft={n_fft}, hop={hop}); other ratios would drop window "
            f"tail samples from the overlap-add and no longer invert the STFT"
        )
    B, T, _ = mag.shape
    spec = mag * jnp.exp(1j * phase)
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1)  # [B, T, n_fft]
    win = jnp.asarray(np.hanning(n_fft + 1)[:n_fft], frames.dtype)
    frames = frames * win

    R = n_fft // hop  # overlap factor

    def ola(fr):  # [B', T, n_fft] → [B', T*hop + n_fft - hop]
        total = T * hop + (R - 1) * hop
        y = jnp.zeros((fr.shape[0], total), fr.dtype)
        for c in range(R):
            seg = fr[:, :, c * hop : (c + 1) * hop].reshape(fr.shape[0], T * hop)
            y = y + jnp.pad(seg, ((0, 0), (c * hop, (R - 1 - c) * hop)))
        return y

    y = ola(frames)
    env = ola(jnp.broadcast_to((win * win)[None, None, :], (1, T, n_fft)))
    y = y / jnp.maximum(env, 1e-6)
    # trim the half-overlap transient so output aligns to T*hop samples
    lead = (n_fft - hop) // 2
    return y[:, lead : lead + T * hop]


class IstftHifiganGenerator(nn.Module):
    """latents ``[B, T, C_in]`` → waveform
    ``[B, T * prod(upsample_factors) * istft_hop * subbands, 1]``.

    ``subbands > 1`` predicts one spectrum per PQMF subband and runs the
    PQMF synthesis filter (multi-band variant of the paper)."""

    in_channels: int = 80
    resblock_type: str = "1"
    resblock_dilation_sizes: Sequence[Sequence[int]] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    upsample_kernel_sizes: Sequence[int] = (16, 16)
    upsample_initial_channel: int = 512
    upsample_factors: Sequence[int] = (8, 8)
    istft_n_fft: int = 16
    istft_hop: int = 4
    subbands: int = 1
    cond_channels: int = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray, g: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        num_kernels = len(self.resblock_kernel_sizes)
        resblock_cls = ResBlock1 if str(self.resblock_type) == "1" else ResBlock2

        o = Conv1d(self.upsample_initial_channel, 7, name="conv_pre")(x)
        if self.cond_channels > 0 and g is not None:
            if g.ndim == 2:
                g = g[:, None, :]
            o = o + nn.Dense(self.upsample_initial_channel, name="cond_layer")(g)
        for i, (u, k) in enumerate(zip(self.upsample_factors, self.upsample_kernel_sizes)):
            o = leaky_relu(o)
            ch = self.upsample_initial_channel // (2 ** (i + 1))
            o = TorchConvTranspose1d(
                features=ch, kernel_size=k, stride=u, padding=(k - u) // 2, name=f"ups_{i}"
            )(o)
            z_sum = None
            for j, (rk, rd) in enumerate(
                zip(self.resblock_kernel_sizes, self.resblock_dilation_sizes)
            ):
                z = resblock_cls(ch, rk, tuple(rd), name=f"resblocks_{i * num_kernels + j}")(o)
                z_sum = z if z_sum is None else z_sum + z
            o = z_sum / num_kernels
        o = leaky_relu(o, 0.01)

        F = self.istft_n_fft // 2 + 1
        S = self.subbands
        spec = Conv1d(2 * F * S, 7, name="conv_post")(o)  # [B, T, 2*F*S]
        B, T, _ = spec.shape
        spec = spec.reshape(B, T, S, 2 * F)
        # clip log-magnitude for numeric safety early in training
        mag = jnp.exp(jnp.clip(spec[..., :F], -12.0, 8.0))
        phase = jnp.pi * jnp.sin(spec[..., F:])  # bounded phase (paper's choice)

        # iSTFT every subband at once: fold S into the batch dim
        mag = mag.transpose(0, 2, 1, 3).reshape(B * S, T, F)
        phase = phase.transpose(0, 2, 1, 3).reshape(B * S, T, F)
        wav = istft_overlap_add(mag, phase, self.istft_n_fft, self.istft_hop)
        wav = wav.reshape(B, S, -1)  # [B, S, T*hop]
        if S == 1:
            return jnp.tanh(wav.transpose(0, 2, 1))  # [B, T*hop, 1]
        from tts_tpu.vocoder.models.melgan_generator import PQMF

        full = PQMF(N=S).synthesis(wav.transpose(0, 2, 1))  # [B, T*hop*S, 1]
        return jnp.tanh(full)

    def inference(self, c: jnp.ndarray) -> jnp.ndarray:
        return self(c)
