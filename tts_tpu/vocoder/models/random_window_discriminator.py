"""Random Window Discriminator (GAN-TTS, arXiv:1909.11646; reference
``TTS/vocoder/models/random_window_discriminator.py:137``).

Five unconditional + five conditional discriminators, each scoring a
random window of the waveform (the window reshaped into ``k`` channels so
every discriminator runs at the same base rate).  TPU notes: window picks
use ``jax.random`` + ``dynamic_slice`` (static window sizes, no
recompiles) instead of the reference's host ``np.random`` indexing.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["RandomWindowDiscriminator"]


def _avg_pool(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    if factor <= 1:
        return x
    B, T, C = x.shape
    T2 = (T // factor) * factor
    return x[:, :T2].reshape(B, T2 // factor, factor, C).mean(axis=2)


class _DBlock(nn.Module):
    out_channels: int
    downsample_factor: int = 1

    @nn.compact
    def __call__(self, x):
        h = _avg_pool(x, self.downsample_factor)
        r = nn.Conv(self.out_channels, (1,), name="residual")(h)
        h = nn.Conv(self.out_channels, (3,), padding=1, name="conv1")(nn.relu(h))
        h = nn.Conv(self.out_channels, (3,), padding=2, kernel_dilation=2, name="conv2")(nn.relu(h))
        return h + r


class _GBlock(nn.Module):
    """Conditioning injection block (reference GBlock)."""

    in_channels: int
    downsample_factor: int

    @nn.compact
    def __call__(self, x, c):
        out_ch = self.in_channels * 2
        h = _avg_pool(x, self.downsample_factor)
        h = nn.Conv(out_ch, (3,), padding=1, name="start")(nn.relu(h))
        h = h + nn.Conv(out_ch, (1,), name="lc_conv1d")(c)
        h = nn.Conv(out_ch, (3,), padding=2, kernel_dilation=2, name="end")(nn.relu(h))
        r = _avg_pool(nn.Conv(out_ch, (1,), name="residual")(x), self.downsample_factor)
        return h + r


class _UnconditionalD(nn.Module):
    base_channels: int = 64
    downsample_factors: Tuple[int, ...] = (8, 4)
    out_channels: Tuple[int, ...] = (128, 256)

    @nn.compact
    def __call__(self, x):
        h = _DBlock(self.base_channels, 1, name="in_block")(x)
        ch = self.base_channels
        for i, f in enumerate(self.downsample_factors):
            h = _DBlock(self.out_channels[i], f, name=f"down_{i}")(h)
            ch = self.out_channels[i]  # post width tracks the last block
            # (equals the reference's doubled in_channels at default widths)
        h = _DBlock(ch, 1, name="post_0")(h)
        h = _DBlock(ch, 1, name="post_1")(h)
        h = jnp.mean(h, axis=1, keepdims=True)  # AdaptiveAvgPool1d(1)
        return nn.Conv(1, (1,), name="out")(h)


class _ConditionalD(nn.Module):
    downsample_factors: Tuple[int, ...] = (2, 2, 2)
    out_channels: Tuple[int, ...] = (128, 256)

    @nn.compact
    def __call__(self, x, c):
        h = _DBlock(64, 1, name="pre_0")(x)
        ch = 64
        for i, co in enumerate(self.out_channels):
            h = _DBlock(co, self.downsample_factors[i], name=f"pre_{i + 1}")(h)
            ch = co
        h = _GBlock(ch, self.downsample_factors[-1], name="cond_block")(h, c)
        ch *= 2
        h = _DBlock(ch, 1, name="post_0")(h)
        h = _DBlock(ch, 1, name="post_1")(h)
        h = jnp.mean(h, axis=1, keepdims=True)
        return nn.Conv(1, (1,), name="out")(h)


class RandomWindowDiscriminator(nn.Module):
    """x [B, T, 1] waveform + c [B, T_frames, cond_channels] mels →
    (scores, feats) like the other discriminators."""

    cond_channels: int = 80
    hop_length: int = 256
    uncond_disc_downsample_factors: Tuple[int, ...] = (8, 4)
    uncond_disc_out_channels: Tuple[int, ...] = (128, 256)
    cond_disc_downsample_factors: Tuple[Tuple[int, ...], ...] = (
        (8, 4, 2, 2, 2), (8, 4, 2, 2), (8, 4, 2), (8, 4), (4, 2, 2),
    )
    cond_disc_out_channels: Tuple[Tuple[int, ...], ...] = (
        (128, 128, 256, 256), (128, 256, 256), (128, 256), (256,), (128, 256),
    )
    window_sizes: Tuple[int, ...] = (512, 1024, 2048, 4096, 8192)

    @nn.compact
    def __call__(self, x, c=None, rng=None):
        if x.ndim == 2:
            x = x[:, :, None]
        B, T, _ = x.shape
        rng = rng if rng is not None else self.make_rng("windows")
        base = self.hop_length * 2
        ks = [ws // base for ws in self.window_sizes]
        scores, feats = [], []

        for i, (ws, k) in enumerate(zip(self.window_sizes, ks)):
            rng, sub = jax.random.split(rng)
            start = jax.random.randint(sub, (), 0, max(1, T - ws))
            win = jax.lax.dynamic_slice_in_dim(x[..., 0], start, ws, axis=1)
            win = win.reshape(B, ws // k, k)
            scores.append(
                _UnconditionalD(
                    downsample_factors=self.uncond_disc_downsample_factors,
                    out_channels=self.uncond_disc_out_channels,
                    name=f"uncond_{i}",
                )(win)
            )

        if c is not None:
            T_frames = c.shape[1]
            for i, (ws, k) in enumerate(zip(self.window_sizes, ks)):
                frame_size = ws // self.hop_length
                rng, sub = jax.random.split(rng)
                lc = jax.random.randint(sub, (), 0, max(1, T_frames - frame_size))
                c_sub = jax.lax.dynamic_slice_in_dim(c, lc, frame_size, axis=1)
                x_sub = jax.lax.dynamic_slice_in_dim(
                    x[..., 0], lc * self.hop_length, frame_size * self.hop_length, axis=1
                )
                x_sub = x_sub.reshape(B, ws // k, k)
                scores.append(
                    _ConditionalD(
                        downsample_factors=self.cond_disc_downsample_factors[i],
                        out_channels=self.cond_disc_out_channels[i],
                        name=f"cond_{i}",
                    )(x_sub, c_sub)
                )
        return [s[:, :, 0] for s in scores], feats
