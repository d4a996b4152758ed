"""Shared vocoder layers.

``TorchConvTranspose1d`` reproduces ``torch.nn.ConvTranspose1d`` exactly as
an input-dilated regular conv (XLA lowers both to the same MXU kernels):
``out_len = (T-1)*stride - 2*padding + kernel_size``.  Converted torch
kernels must be time-flipped and transposed to ``[K, C_in, C_out]``.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

LRELU_SLOPE = 0.1


class TorchConvTranspose1d(nn.Module):
    """ConvTranspose1d with torch-compatible padding semantics on [B, T, C]."""

    features: int
    kernel_size: int
    stride: int
    padding: int = 0
    output_padding: int = 0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel_size, in_ch, self.features),
        )
        p = self.kernel_size - 1 - self.padding
        if jnp.issubdtype(x.dtype, jnp.floating) and x.dtype != kernel.dtype:
            x = x.astype(kernel.dtype)  # mixed-precision callers (bf16 params)
        y = jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(1,),
            padding=[(p, p + self.output_padding)],
            lhs_dilation=(self.stride,),
            dimension_numbers=("NHC", "HIO", "NHC"),
        )
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (self.features,))
        return y


def leaky_relu(x: jnp.ndarray, slope: float = LRELU_SLOPE) -> jnp.ndarray:
    return nn.leaky_relu(x, negative_slope=slope)
