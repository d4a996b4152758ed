"""Parallel WaveGAN generator/discriminator
(reference ``TTS/vocoder/models/parallel_wavegan_{generator,discriminator}.py``
+ ``layers/parallel_wavegan.py``).

Non-causal WaveNet over noise conditioned on upsampled mels.
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class PWGANResidualBlock(nn.Module):
    """WaveNet residual block (reference ``layers/parallel_wavegan.py:5``)."""

    res_channels: int = 64
    gate_channels: int = 128
    skip_channels: int = 64
    aux_channels: int = 80
    kernel_size: int = 3
    dilation: int = 1
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, c, train: bool = False):
        residual = x
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        pad = (self.kernel_size - 1) // 2 * self.dilation
        x = nn.Conv(
            self.gate_channels, (self.kernel_size,), kernel_dilation=(self.dilation,),
            padding=[(pad, pad)], name="conv",
        )(x)
        xa, xb = jnp.split(x, 2, axis=-1)
        if c is not None:
            cc = nn.Dense(self.gate_channels, use_bias=False, name="conv1x1_aux")(c)
            ca, cb = jnp.split(cc, 2, axis=-1)
            xa, xb = xa + ca, xb + cb
        x = jnp.tanh(xa) * nn.sigmoid(xb)
        s = nn.Dense(self.skip_channels, name="conv1x1_skip")(x)
        x = (nn.Dense(self.res_channels, name="conv1x1_out")(x) + residual) * (0.5**2)
        return x, s


def _repeat_upsample(c: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Nearest-neighbor time upsample [B, T, C] → [B, T*factor, C]."""
    return jnp.repeat(c, factor, axis=1)


class ConvUpsample(nn.Module):
    """conv_in (1×1, bias-free) + per-stage nearest-repeat followed by one
    smoothing tap SHARED across channels — weight-compatible with the
    reference's ``Conv2d(1, 1, (1, 2f+1))`` over the stretched (C, T) plane
    (reference ``layers/upsample.py`` ConvUpsample/UpsampleNetwork)."""

    upsample_factors: Sequence[int]
    aux_context_window: int = 0

    @nn.compact
    def __call__(self, c):
        k_in = 2 * self.aux_context_window + 1
        c = nn.Conv(
            c.shape[-1], (k_in,), padding="VALID", use_bias=False, name="conv_in"
        )(c)
        for i, f in enumerate(self.upsample_factors):
            c = _repeat_upsample(c, f)
            k = 2 * f + 1
            tap = self.param(
                f"up_{i}", nn.initializers.constant(1.0 / k), (k, 1, 1)
            )
            C = c.shape[-1]
            kern = jnp.broadcast_to(tap, (k, 1, C))
            c = jax.lax.conv_general_dilated(
                c, kern, (1,), [(f, f)],
                dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=C,
            )
        return c


class ParallelWaveganGenerator(nn.Module):
    """(reference ``parallel_wavegan_generator.py:12``)"""

    in_channels: int = 1
    out_channels: int = 1
    kernel_size: int = 3
    num_res_blocks: int = 30
    stacks: int = 3
    res_channels: int = 64
    gate_channels: int = 128
    skip_channels: int = 64
    aux_channels: int = 80
    upsample_factors: Sequence[int] = (4, 4, 4, 4)
    inference_padding: int = 2

    @nn.compact
    def __call__(self, c, x=None, rngs_noise=None):
        """c: mel [B, T, M] → wav [B, T*prod(factors), 1].

        ``x`` is the input noise; if None, sampled from the 'noise' rng.
        """
        T_wav = c.shape[1] * int(np.prod(self.upsample_factors))
        if x is None:
            x = jax.random.normal(
                self.make_rng("noise") if rngs_noise is None else rngs_noise,
                (c.shape[0], T_wav, self.in_channels),
            )
        c_up = ConvUpsample(tuple(self.upsample_factors), name="upsample_net")(c)
        c_up = c_up[:, : x.shape[1]]
        h = nn.Dense(self.res_channels, name="first_conv")(x)
        layers_per_stack = self.num_res_blocks // self.stacks
        skips = 0.0
        for i in range(self.num_res_blocks):
            dilation = 2 ** (i % layers_per_stack)
            h, s = PWGANResidualBlock(
                res_channels=self.res_channels,
                gate_channels=self.gate_channels,
                skip_channels=self.skip_channels,
                aux_channels=self.aux_channels,
                kernel_size=self.kernel_size,
                dilation=dilation,
                name=f"res_{i}",
            )(h, c_up)
            skips += s
        skips *= math.sqrt(1.0 / self.num_res_blocks)
        o = nn.relu(skips)
        o = nn.relu(nn.Dense(self.skip_channels, name="last_conv_1")(o))
        return nn.Dense(self.out_channels, name="last_conv_2")(o)


class ParallelWaveganDiscriminator(nn.Module):
    """Stacked dilated non-causal convs
    (reference ``parallel_wavegan_discriminator.py``)."""

    num_layers: int = 10
    conv_channels: int = 64
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, List]:
        feats = []
        h = x
        for i in range(self.num_layers - 1):
            dilation = i if i > 0 else 1
            pad = (self.kernel_size - 1) // 2 * dilation
            h = nn.Conv(
                self.conv_channels, (self.kernel_size,), kernel_dilation=(dilation,),
                padding=[(pad, pad)], name=f"conv_{i}",
            )(h)
            h = nn.leaky_relu(h, 0.2)
            feats.append(h)
        score = nn.Conv(
            1, (self.kernel_size,), padding=[((self.kernel_size - 1) // 2,) * 2],
            name="conv_out",
        )(h)
        feats.append(score)
        return score, feats
