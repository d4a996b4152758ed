"""Common conv/norm blocks (flax.linen, time-major).

Equivalents of reference ``TTS/tts/layers/generic/normalization.py`` and
``glow_tts/glow.py:11`` (ResidualConv1dLayerNormBlock) and
``glow_tts/duration_predictor.py``.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp


class Conv1d(nn.Module):
    """1-D conv on ``[B, T, C]`` with torch-style symmetric padding.

    ``padding=None`` → torch's default for odd kernels:
    ``(k*d - d)//2`` both sides (length-preserving for odd k).
    """

    features: int
    kernel_size: int = 1
    dilation: int = 1
    stride: int = 1
    padding: Optional[int] = None
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.padding is None:
            pad = (self.kernel_size * self.dilation - self.dilation) // 2
        else:
            pad = self.padding
        return nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size,),
            strides=(self.stride,),
            kernel_dilation=(self.dilation,),
            padding=[(pad, pad)],
            use_bias=self.use_bias,
        )(x)


class LayerNorm(nn.Module):
    """Channel layer-norm over the last axis (reference ``normalization.py:6``
    normalizes the torch channel dim — same axis in our layout)."""

    eps: float = 1e-4

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.LayerNorm(epsilon=self.eps)(x)


class ConvLayerNormBlock(nn.Module):
    """conv → layernorm → relu → dropout stack with residual projection
    (reference ``glow_tts/glow.py:11`` ResidualConv1dLayerNormBlock)."""

    hidden_channels: int
    out_channels: int
    kernel_size: int
    num_layers: int
    dropout_p: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, x_mask: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x_res = x
        for i in range(self.num_layers):
            x = Conv1d(self.hidden_channels, self.kernel_size, name=f"conv_{i}")(x * x_mask)
            x = LayerNorm(name=f"norm_{i}")(x * x_mask)
            x = nn.Dropout(self.dropout_p, deterministic=not train)(nn.relu(x))
        # zero-init projection so the block starts as identity (reference :52)
        proj = nn.Conv(
            self.out_channels, (1,), kernel_init=nn.initializers.zeros, name="proj"
        )(x)
        return (x_res + proj) * x_mask


class DurationPredictor(nn.Module):
    """Token log-duration regressor (reference
    ``glow_tts/duration_predictor.py:7``): conv-relu-norm-dropout ×2 → 1ch.

    Optionally conditioned on a speaker vector ``g`` (added via 1×1 conv).
    """

    hidden_channels: int
    kernel_size: int
    dropout_p: float

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        x_mask: jnp.ndarray,
        g: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        if g is not None:
            x = x + nn.Dense(x.shape[-1], name="cond")(g)[:, None, :]
        x = Conv1d(self.hidden_channels, self.kernel_size, name="conv_1")(x * x_mask)
        x = nn.Dropout(self.dropout_p, deterministic=not train)(
            LayerNorm(name="norm_1")(nn.relu(x))
        )
        x = Conv1d(self.hidden_channels, self.kernel_size, name="conv_2")(x * x_mask)
        x = nn.Dropout(self.dropout_p, deterministic=not train)(
            LayerNorm(name="norm_2")(nn.relu(x))
        )
        x = nn.Conv(1, (1,), name="proj")(x * x_mask)
        return x * x_mask  # [B, T, 1] log durations
