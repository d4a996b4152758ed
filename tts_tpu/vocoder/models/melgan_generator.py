"""MelGAN generator family: MelGAN, FullbandMelGAN, MultibandMelGAN
(reference ``TTS/vocoder/models/melgan_generator.py`` etc. + PQMF
``layers/pqmf.py``)."""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tts_tpu.vocoder.layers import TorchConvTranspose1d


def _reflect_pad(x, p):
    return jnp.pad(x, ((0, 0), (p, p), (0, 0)), mode="reflect")


class ResidualStack(nn.Module):
    """Dilated residual stack (reference ``layers/melgan.py``)."""

    channels: int
    num_res_blocks: int
    kernel_size: int

    @nn.compact
    def __call__(self, x):
        base_padding = (self.kernel_size - 1) // 2
        for idx in range(self.num_res_blocks):
            dilation = self.kernel_size**idx
            padding = base_padding * dilation
            y = nn.leaky_relu(x, 0.2)
            y = _reflect_pad(y, padding)
            y = nn.Conv(
                self.channels,
                (self.kernel_size,),
                kernel_dilation=(dilation,),
                padding="VALID",
                name=f"block{idx}_conv1",
            )(y)
            y = nn.leaky_relu(y, 0.2)
            y = nn.Conv(self.channels, (1,), name=f"block{idx}_conv2")(y)
            x = nn.Conv(self.channels, (1,), name=f"shortcut{idx}")(x) + y
        return x


class MelganGenerator(nn.Module):
    """(reference ``melgan_generator.py:9``)"""

    in_channels: int = 80
    out_channels: int = 1
    proj_kernel: int = 7
    base_channels: int = 512
    upsample_factors: Sequence[int] = (8, 8, 2, 2)
    res_kernel: int = 3
    num_res_blocks: int = 3
    inference_padding: int = 2

    @nn.compact
    def __call__(self, c):
        base_padding = (self.proj_kernel - 1) // 2
        x = _reflect_pad(c, base_padding)
        x = nn.Conv(self.base_channels, (self.proj_kernel,), padding="VALID", name="conv_pre")(x)
        for idx, u in enumerate(self.upsample_factors):
            out_ch = self.base_channels // (2 ** (idx + 1))
            x = nn.leaky_relu(x, 0.2)
            x = TorchConvTranspose1d(
                features=out_ch,
                kernel_size=u * 2,
                stride=u,
                padding=u // 2 + u % 2,
                output_padding=u % 2,
                name=f"ups_{idx}",
            )(x)
            x = ResidualStack(out_ch, self.num_res_blocks, self.res_kernel, name=f"res_{idx}")(x)
        x = nn.leaky_relu(x, 0.2)
        x = _reflect_pad(x, base_padding)
        x = nn.Conv(self.out_channels, (self.proj_kernel,), padding="VALID", name="conv_post")(x)
        return jnp.tanh(x)

    def inference(self, c):
        c = jnp.pad(c, ((0, 0), (self.inference_padding,) * 2, (0, 0)), mode="edge")
        return self(c)


class FullbandMelganGenerator(MelganGenerator):
    """(reference ``fullband_melgan_generator.py``; same net, 4 res blocks)"""

    num_res_blocks: int = 4


def pqmf_filters(N: int = 4, taps: int = 62, cutoff: float = 0.15, beta: float = 9.0):
    """Kaiser-window QMF analysis/synthesis banks (reference ``pqmf.py``)."""
    from scipy import signal as sig

    qmf = sig.firwin(taps + 1, cutoff, window=("kaiser", beta))
    H = np.zeros((N, taps + 1))
    G = np.zeros((N, taps + 1))
    for k in range(N):
        factor = (2 * k + 1) * (np.pi / (2 * N)) * (np.arange(taps + 1) - ((taps - 1) / 2))
        phase = (-1) ** k * np.pi / 4
        H[k] = 2 * qmf * np.cos(factor + phase)
        G[k] = 2 * qmf * np.cos(factor - phase)
    return H.astype(np.float32), G.astype(np.float32)


class PQMF:
    """Pseudo-QMF multiband analysis/synthesis, stateless JAX ops."""

    def __init__(self, N: int = 4, taps: int = 62, cutoff: float = 0.15, beta: float = 9.0):
        self.N = N
        self.taps = taps
        H, G = pqmf_filters(N, taps, cutoff, beta)
        # analysis kernel [K, 1, N] (HIO), synthesis [K, N, 1]
        self.H = jnp.asarray(H.T[:, None, :])  # [taps+1, 1, N]
        self.G = jnp.asarray(G.T[:, :, None])  # [taps+1, N, 1]

    def analysis(self, x: jnp.ndarray) -> jnp.ndarray:
        """[B, T, 1] → [B, T//N, N] subband signals."""
        return jax.lax.conv_general_dilated(
            x,
            self.H,
            window_strides=(self.N,),
            padding=[(self.taps // 2, self.taps // 2)],
            dimension_numbers=("NHC", "HIO", "NHC"),
        )

    def synthesis(self, x: jnp.ndarray) -> jnp.ndarray:
        """[B, T//N, N] → [B, T, 1]."""
        # upsample by N (zero-stuffing scaled by N), then synthesis filter
        B, T, N = x.shape
        up = jnp.zeros((B, T * N, N), x.dtype)
        up = up.at[:, ::N].set(x * N)
        return jax.lax.conv_general_dilated(
            up,
            self.G,
            window_strides=(1,),
            padding=[(self.taps // 2, self.taps // 2)],
            dimension_numbers=("NHC", "HIO", "NHC"),
        )


class MultibandMelganGenerator(MelganGenerator):
    """4-subband MelGAN (reference ``multiband_melgan_generator.py``);
    ``__call__`` emits subbands, ``inference`` runs PQMF synthesis."""

    out_channels: int = 4
    base_channels: int = 384
    upsample_factors: Sequence[int] = (2, 8, 2, 2)

    @property
    def pqmf(self) -> PQMF:
        return PQMF(N=self.out_channels)

    def pqmf_analysis(self, x):
        return self.pqmf.analysis(x)

    def pqmf_synthesis(self, x):
        return self.pqmf.synthesis(x)

    def inference(self, c):
        c = jnp.pad(c, ((0, 0), (self.inference_padding,) * 2, (0, 0)), mode="edge")
        return self.pqmf.synthesis(self(c))
