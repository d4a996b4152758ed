"""Normalizing-flow building blocks for GlowTTS (reference
``TTS/tts/layers/glow_tts/glow.py`` + ``decoder.py``).

All flows are single flax modules whose ``__call__`` takes ``reverse``:
forward returns ``(z, logdet)``; reverse returns ``(x, None)``.  Squeeze is
a pure reshape in time-major layout (the torch version needs two permutes).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .wavenet import WN


def squeeze(x: jnp.ndarray, x_mask: Optional[jnp.ndarray], num_sqz: int = 2):
    """``[B, T, C] -> [B, T//n, n*C]`` grouping ``n`` consecutive frames
    (reference ``decoder.py:8``; channel order matches: feature index =
    s*C + c)."""
    b, t, c = x.shape
    t = (t // num_sqz) * num_sqz
    x = x[:, :t].reshape(b, t // num_sqz, num_sqz * c)
    if x_mask is not None:
        x_mask = x_mask[:, num_sqz - 1 : t : num_sqz]
    else:
        x_mask = jnp.ones((b, t // num_sqz, 1), x.dtype)
    return x * x_mask, x_mask


def unsqueeze(x: jnp.ndarray, x_mask: Optional[jnp.ndarray], num_sqz: int = 2):
    """Inverse of :func:`squeeze` (reference ``decoder.py:31``)."""
    b, t, c = x.shape
    x = x.reshape(b, t * num_sqz, c // num_sqz)
    if x_mask is not None:
        x_mask = jnp.repeat(x_mask, num_sqz, axis=1)
    else:
        x_mask = jnp.ones((b, t * num_sqz, 1), x.dtype)
    return x * x_mask, x_mask


class ActNorm(nn.Module):
    """Per-channel affine flow ``z = exp(logs)*x + bias`` (reference
    ``generic/normalization.py`` ActNorm).  Data-dependent init is handled
    by the trainer seeding ``logs``/``bias`` from the first batch if
    desired; default init is identity."""

    channels: int

    @nn.compact
    def __call__(self, x, x_mask=None, g=None, reverse: bool = False, train: bool = False):
        if x_mask is None:
            x_mask = jnp.ones_like(x[..., :1])
        logs = self.param("logs", nn.initializers.zeros, (self.channels,))
        bias = self.param("bias", nn.initializers.zeros, (self.channels,))
        x_len = jnp.sum(x_mask, axis=(1, 2))
        if reverse:
            z = (x - bias) * jnp.exp(-logs) * x_mask
            return z, None
        z = (bias + jnp.exp(logs) * x) * x_mask
        logdet = jnp.sum(logs) * x_len
        return z, logdet


class InvConvNear(nn.Module):
    """Invertible 1×1 conv over interleaved channel groups (reference
    ``glow.py:70``).  The inverse uses ``jnp.linalg.inv`` at trace time —
    a tiny ``[s, s]`` solve, negligible next to the coupling convs, so no
    ``store_inverse()`` state is needed."""

    channels: int
    num_splits: int = 4

    def _qr_init(self, key, shape):
        w = nn.initializers.normal(1.0)(key, shape)
        q, _ = jnp.linalg.qr(w, mode="complete")
        return q.astype(jnp.float32)

    @nn.compact
    def __call__(self, x, x_mask=None, g=None, reverse: bool = False, train: bool = False):
        b, t, c = x.shape
        s = self.num_splits
        assert c % s == 0
        weight = self.param("weight", self._qr_init, (s, s))
        if x_mask is None:
            x_mask = jnp.ones_like(x[..., :1])
        x_len = jnp.sum(x_mask, axis=(1, 2))

        # channel index -> (half, group, sub): c = half*(C/2) + grp*(s/2) + sub
        xg = x.reshape(b, t, 2, c // s, s // 2)
        xg = jnp.transpose(xg, (0, 1, 2, 4, 3)).reshape(b, t, s, c // s)

        if reverse:
            w = jnp.linalg.inv(weight.astype(jnp.float32)).astype(weight.dtype)
            logdet = None
        else:
            w = weight
            logdet = jnp.linalg.slogdet(weight.astype(jnp.float32))[1] * (c / s) * x_len

        z = jnp.einsum("ij,btjc->btic", w, xg)
        z = z.reshape(b, t, 2, s // 2, c // s)
        z = jnp.transpose(z, (0, 1, 2, 4, 3)).reshape(b, t, c) * x_mask
        return z, logdet


class CouplingBlock(nn.Module):
    """Affine coupling with a WaveNet transform net (reference ``glow.py:144``)."""

    in_channels: int
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    num_layers: int
    c_in_channels: int = 0
    dropout_p: float = 0.0
    sigmoid_scale: bool = False

    @nn.compact
    def __call__(self, x, x_mask=None, g=None, reverse: bool = False, train: bool = False):
        if x_mask is None:
            x_mask = jnp.ones_like(x[..., :1])
        half = self.in_channels // 2
        x_0, x_1 = x[..., :half], x[..., half:]

        h = nn.Dense(self.hidden_channels, name="start")(x_0) * x_mask
        h = WN(
            hidden_channels=self.hidden_channels,
            kernel_size=self.kernel_size,
            dilation_rate=self.dilation_rate,
            num_layers=self.num_layers,
            c_in_channels=self.c_in_channels,
            dropout_p=self.dropout_p,
            name="wn",
        )(h, x_mask, g=g, train=train)
        out = nn.Dense(
            self.in_channels,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="end",
        )(h)

        m, logs = out[..., :half], out[..., half:]
        if self.sigmoid_scale:
            logs = jnp.log(1e-6 + nn.sigmoid(logs + 2))

        if reverse:
            z_1 = (x_1 - m) * jnp.exp(-logs) * x_mask
            logdet = None
        else:
            z_1 = (m + jnp.exp(logs) * x_1) * x_mask
            logdet = jnp.sum(logs * x_mask, axis=(1, 2))
        z = jnp.concatenate([x_0, z_1], axis=-1)
        return z, logdet


class GlowDecoder(nn.Module):
    """Squeeze → [ActNorm → InvConv → Coupling] × N → Unsqueeze
    (reference ``decoder.py:50``)."""

    in_channels: int
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    num_flow_blocks: int
    num_coupling_layers: int
    dropout_p: float = 0.0
    num_splits: int = 4
    num_squeeze: int = 2
    sigmoid_scale: bool = False
    c_in_channels: int = 0

    def setup(self):
        flows = []
        ch = self.in_channels * self.num_squeeze
        for k in range(self.num_flow_blocks):
            flows.append(ActNorm(channels=ch, name=f"actnorm_{k}"))
            flows.append(InvConvNear(channels=ch, num_splits=self.num_splits, name=f"invconv_{k}"))
            flows.append(
                CouplingBlock(
                    in_channels=ch,
                    hidden_channels=self.hidden_channels,
                    kernel_size=self.kernel_size,
                    dilation_rate=self.dilation_rate,
                    num_layers=self.num_coupling_layers,
                    c_in_channels=self.c_in_channels,
                    dropout_p=self.dropout_p,
                    sigmoid_scale=self.sigmoid_scale,
                    name=f"coupling_{k}",
                )
            )
        self.flows = flows

    def __call__(
        self, x, x_mask, g=None, reverse: bool = False, train: bool = False
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray], jnp.ndarray]:
        """Returns (z, total_logdet or None, squeezed-then-unsqueezed mask)."""
        if self.num_squeeze > 1:
            x, x_mask = squeeze(x, x_mask, self.num_squeeze)
        logdet_tot = jnp.zeros((x.shape[0],), x.dtype) if not reverse else None
        flows = self.flows if not reverse else list(reversed(self.flows))
        for f in flows:
            x, logdet = f(x, x_mask, g=g, reverse=reverse, train=train)
            if not reverse:
                logdet_tot = logdet_tot + logdet
        if self.num_squeeze > 1:
            x, x_mask = unsqueeze(x, x_mask, self.num_squeeze)
        return x, logdet_tot, x_mask
