"""MelGAN discriminators (reference
``TTS/vocoder/models/melgan_discriminator.py`` + multiscale wrapper)."""

from __future__ import annotations

from typing import List, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


class MelganDiscriminator(nn.Module):
    """Single-scale conv discriminator (reference ``:6``)."""

    kernel_sizes: Tuple[int, int] = (5, 3)
    base_channels: int = 16
    max_channels: int = 1024
    downsample_factors: Sequence[int] = (4, 4, 4, 4)
    groups_denominator: int = 4

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        feats = []
        k0 = int(np.prod(self.kernel_sizes))
        pad0 = (k0 - 1) // 2
        x = jnp.pad(x, ((0, 0), (pad0, pad0), (0, 0)), mode="reflect")
        x = nn.Conv(self.base_channels, (k0,), padding="VALID", name="conv_0")(x)
        x = nn.leaky_relu(x, 0.2)
        feats.append(x)

        in_ch = self.base_channels
        for i, df in enumerate(self.downsample_factors):
            out_ch = min(in_ch * df, self.max_channels)
            k = df * 10 + 1
            x = nn.Conv(
                out_ch,
                (k,),
                strides=(df,),
                padding=[((k - 1) // 2,) * 2],
                feature_group_count=in_ch // self.groups_denominator,
                name=f"conv_down_{i}",
            )(x)
            x = nn.leaky_relu(x, 0.2)
            feats.append(x)
            in_ch = out_ch

        x = nn.Conv(
            min(in_ch * 2, self.max_channels),
            (self.kernel_sizes[0],),
            padding=[((self.kernel_sizes[0] - 1) // 2,) * 2],
            name="conv_pre_final",
        )(x)
        x = nn.leaky_relu(x, 0.2)
        feats.append(x)
        score = nn.Conv(
            1,
            (self.kernel_sizes[1],),
            padding=[((self.kernel_sizes[1] - 1) // 2,) * 2],
            name="conv_final",
        )(x)
        feats.append(score)
        return score, feats


def _avg_pool1d(x, window=4, stride=2, pad=1):
    x = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
    return nn.avg_pool(x, (window,), strides=(stride,))


class MelganMultiscaleDiscriminator(nn.Module):
    """3-scale MelGAN discriminator (reference
    ``melgan_multiscale_discriminator.py``)."""

    num_scales: int = 3
    pooling_kernel_size: int = 4
    pooling_stride: int = 2
    pooling_padding: int = 2
    kernel_sizes: Tuple[int, int] = (5, 3)
    base_channels: int = 16
    max_channels: int = 1024
    downsample_factors: Sequence[int] = (4, 4, 4)
    groups_denominator: int = 4

    @nn.compact
    def __call__(self, x):
        scores, feats = [], []
        for i in range(self.num_scales):
            if i != 0:
                x = _avg_pool1d(x, self.pooling_kernel_size, self.pooling_stride, self.pooling_padding)
            score, feat = MelganDiscriminator(
                kernel_sizes=tuple(self.kernel_sizes),
                base_channels=self.base_channels,
                max_channels=self.max_channels,
                downsample_factors=tuple(self.downsample_factors),
                groups_denominator=self.groups_denominator,
                name=f"disc_{i}",
            )(x)
            scores.append(score)
            feats.append(feat)
        return scores, feats
