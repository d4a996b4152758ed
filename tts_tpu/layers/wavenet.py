"""Gated dilated-conv WaveNet stack (reference
``TTS/tts/layers/generic/wavenet.py`` WN).

Shared by the Glow coupling layers, the VITS posterior encoder and the
VITS residual-coupling flows.  The gated tanh/sigmoid activation and the
residual/skip split are elementwise chains XLA fuses into the conv
epilogue.  Weight-norm reparameterization is omitted (plain kernels);
converted torch checkpoints fold ``weight_g * weight_v/|weight_v|``
into the kernel.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from .common import Conv1d


class WN(nn.Module):
    """Dilated gated-conv stack with optional global conditioning.

    Input/output ``[B, T, C]``; conditioning ``g`` is ``[B, C_g]`` (a global
    vector) or ``[B, T, C_g]`` (per-frame features).
    """

    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    num_layers: int
    c_in_channels: int = 0
    dropout_p: float = 0.0

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        x_mask: Optional[jnp.ndarray] = None,
        g: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        if x_mask is None:
            x_mask = jnp.ones_like(x[..., :1])
        output = jnp.zeros((*x.shape[:2], self.hidden_channels), x.dtype)

        if g is not None:
            if g.ndim == 2:
                g = g[:, None, :]
            # one shared 1x1 conv producing all per-layer conditioning at once
            g = nn.Dense(2 * self.hidden_channels * self.num_layers, name="cond_layer")(g)

        for i in range(self.num_layers):
            dilation = self.dilation_rate**i
            x_in = Conv1d(
                2 * self.hidden_channels,
                self.kernel_size,
                dilation=dilation,
                name=f"in_layer_{i}",
            )(x)
            x_in = nn.Dropout(self.dropout_p, deterministic=not train)(x_in)
            if g is not None:
                g_l = g[..., i * 2 * self.hidden_channels : (i + 1) * 2 * self.hidden_channels]
            else:
                g_l = 0.0
            acts = x_in + g_l
            t_act = jnp.tanh(acts[..., : self.hidden_channels])
            s_act = nn.sigmoid(acts[..., self.hidden_channels :])
            acts = t_act * s_act

            res_skip_channels = (
                2 * self.hidden_channels if i < self.num_layers - 1 else self.hidden_channels
            )
            res_skip = nn.Dense(res_skip_channels, name=f"res_skip_layer_{i}")(acts)
            if i < self.num_layers - 1:
                x = (x + res_skip[..., : self.hidden_channels]) * x_mask
                output = output + res_skip[..., self.hidden_channels :]
            else:
                output = output + res_skip
        return output * x_mask
