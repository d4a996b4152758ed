"""HiFiGAN discriminators: multi-period + multi-scale
(reference ``TTS/vocoder/models/hifigan_discriminator.py``).

Each sub-discriminator returns (score, feature-maps) for feature-matching
loss.  Spectral/weight norm reparameterizations are omitted (plain
kernels); GAN training stability on TPU is handled by the trainer's
bf16-with-fp32-loss policy and gradient clipping instead.
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from tts_tpu.vocoder.layers import leaky_relu


def _scaled(ch: int, mult: float) -> int:
    """Channel count under ``width_mult`` (min 8, reference at 1.0).
    Tests shrink the fixed 128→1024-channel stacks this way — on a CPU CI
    box the full-width discriminators dominate GAN-step compile time."""
    return ch if mult == 1.0 else max(8, int(ch * mult))


class DiscriminatorP(nn.Module):
    """Period discriminator: fold time by ``period`` and run 2-D convs
    (reference ``:29``)."""

    period: int
    kernel_size: int = 5
    stride: int = 3
    width_mult: float = 1.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        """x: ``[B, T, 1]`` waveform."""
        b, t, c = x.shape
        if t % self.period != 0:
            n_pad = self.period - (t % self.period)
            x = jnp.pad(x, ((0, 0), (0, n_pad), (0, 0)), mode="reflect")
            t = t + n_pad
        x = x.reshape(b, t // self.period, self.period, c)

        feats = []
        pad = (self.kernel_size - 1) // 2
        for i, ch in enumerate((32, 128, 512, 1024)):
            x = nn.Conv(
                _scaled(ch, self.width_mult),
                (self.kernel_size, 1),
                strides=(self.stride, 1),
                padding=((pad, pad), (0, 0)),
                name=f"convs_{i}",
            )(x)
            x = leaky_relu(x)
            feats.append(x)
        x = nn.Conv(
            _scaled(1024, self.width_mult),
            (self.kernel_size, 1), padding=((2, 2), (0, 0)), name="convs_4",
        )(x)
        x = leaky_relu(x)
        feats.append(x)
        x = nn.Conv(1, (3, 1), padding=((1, 1), (0, 0)), name="conv_post")(x)
        feats.append(x)
        return x.reshape(b, -1), feats


class MultiPeriodDiscriminator(nn.Module):
    """MPD over periods 2,3,5,7,11 (reference ``:89``)."""

    periods: Sequence[int] = (2, 3, 5, 7, 11)
    width_mult: float = 1.0

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        scores, feats = [], []
        for p in self.periods:
            score, feat = DiscriminatorP(p, width_mult=self.width_mult, name=f"disc_p{p}")(x)
            scores.append(score)
            feats.append(feat)
        return scores, feats


class DiscriminatorS(nn.Module):
    """Scale discriminator: grouped 1-D convs (reference ``:140``)."""

    width_mult: float = 1.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        feats = []
        spec = [
            (128, 15, 1, 1, 7),
            (128, 41, 2, 4, 20),
            (256, 41, 2, 16, 20),
            (512, 41, 4, 16, 20),
            (1024, 41, 4, 16, 20),
            (1024, 41, 1, 16, 20),
            (1024, 5, 1, 1, 2),
        ]
        for i, (ch, k, s, g, p) in enumerate(spec):
            cin, cout = x.shape[-1], _scaled(ch, self.width_mult)
            x = nn.Conv(
                cout,
                (k,),
                strides=(s,),
                padding=[(p, p)],
                feature_group_count=math.gcd(math.gcd(g, cin), cout),
                name=f"convs_{i}",
            )(x)
            x = leaky_relu(x)
            feats.append(x)
        x = nn.Conv(1, (3,), padding=[(1, 1)], name="conv_post")(x)
        feats.append(x)
        return x.reshape(x.shape[0], -1), feats


def _avg_pool(x: jnp.ndarray, window: int = 4, stride: int = 2, pad: int = 2) -> jnp.ndarray:
    x = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
    return nn.avg_pool(x, (window,), strides=(stride,))


class MultiScaleDiscriminator(nn.Module):
    """MSD at 1×, 2×, 4× downsampling (reference ``:170``)."""

    n_scales: int = 3
    width_mult: float = 1.0

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        scores, feats = [], []
        for i in range(self.n_scales):
            if i != 0:
                x = _avg_pool(x)
            score, feat = DiscriminatorS(width_mult=self.width_mult, name=f"disc_s{i}")(x)
            scores.append(score)
            feats.append(feat)
        return scores, feats


class HifiganDiscriminator(nn.Module):
    """MPD + MSD composite (reference ``:217``)."""

    periods: Sequence[int] = (2, 3, 5, 7, 11)
    n_scales: int = 3
    width_mult: float = 1.0

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        scores_p, feats_p = MultiPeriodDiscriminator(
            periods=self.periods, width_mult=self.width_mult, name="mpd"
        )(x)
        scores_s, feats_s = MultiScaleDiscriminator(
            n_scales=self.n_scales, width_mult=self.width_mult, name="msd"
        )(x)
        return scores_p + scores_s, feats_p + feats_s
