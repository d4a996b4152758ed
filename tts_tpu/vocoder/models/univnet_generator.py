"""UnivNet generator — location-variable convolutions
(reference ``TTS/vocoder/models/univnet_generator.py`` +
``layers/lvc_block.py``).

The LVC op (per-conditioning-frame predicted kernels) is expressed as a
batched einsum over unfolded windows — one MXU contraction per layer
instead of the reference's unfold/einsum chain.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tts_tpu.vocoder.layers import TorchConvTranspose1d


class KernelPredictor(nn.Module):
    """(reference ``lvc_block.py:5``)"""

    conv_in_channels: int
    conv_out_channels: int
    conv_layers: int
    conv_kernel_size: int = 3
    kpnet_hidden_channels: int = 64
    kpnet_conv_size: int = 3
    kpnet_dropout: float = 0.0
    lrelu_slope: float = 0.1  # tortoise-bundled variant uses 0.2
    # "shared": one residual add around the whole 3-block stack (reference
    # vocoder/layers/lvc_block.py:75); "per_block": residual add after each
    # block (tortoise-bundled variant, tts/layers/tortoise/vocoder.py:108)
    residual_style: str = "shared"

    @nn.compact
    def __call__(self, c, train: bool = False):  # c: [B, L, C_cond]
        B, L, _ = c.shape
        kh = self.kpnet_hidden_channels
        s = self.lrelu_slope
        pad = (self.kpnet_conv_size - 1) // 2
        h = nn.Conv(kh, (5,), padding=[(2, 2)], name="input_conv")(c)
        h = nn.leaky_relu(h, s)
        r = h
        for i in range(3):
            r = nn.Dropout(self.kpnet_dropout, deterministic=not train)(r)
            r = nn.leaky_relu(nn.Conv(kh, (self.kpnet_conv_size,), padding=[(pad, pad)], name=f"res_{i}a")(r), s)
            r = nn.leaky_relu(nn.Conv(kh, (self.kpnet_conv_size,), padding=[(pad, pad)], name=f"res_{i}b")(r), s)
            if self.residual_style == "per_block":
                r = h + r
                h = r
        if self.residual_style != "per_block":
            h = h + r
        l_w = self.conv_in_channels * self.conv_out_channels * self.conv_kernel_size * self.conv_layers
        l_b = self.conv_out_channels * self.conv_layers
        k = nn.Conv(l_w, (self.kpnet_conv_size,), padding=[(pad, pad)], name="kernel_conv")(h)
        b = nn.Conv(l_b, (self.kpnet_conv_size,), padding=[(pad, pad)], name="bias_conv")(h)
        kernels = k.reshape(
            B, L, self.conv_layers, self.conv_in_channels, self.conv_out_channels, self.conv_kernel_size
        )
        bias = b.reshape(B, L, self.conv_layers, self.conv_out_channels)
        return kernels, bias


def location_variable_convolution(x, kernel, bias, hop_size: int):
    """LVC with per-frame kernels (reference ``lvc_block.py:158``, dilation=1).

    x: [B, T, C_in] with T = L * hop_size
    kernel: [B, L, C_in, C_out, K]; bias: [B, L, C_out]
    → [B, T, C_out]
    """
    B, T, C_in = x.shape
    _, L, _, C_out, K = kernel.shape
    p = (K - 1) // 2
    xp = jnp.pad(x, ((0, 0), (p, p), (0, 0)))
    # windows per conditioning frame: [B, L, hop+2p, C_in]
    idx = (jnp.arange(L) * hop_size)[:, None] + jnp.arange(hop_size + 2 * p)[None, :]
    win = xp[:, idx]  # [B, L, hop+2p, C_in]
    # o[b,l,s,o] = sum_k sum_i win[b,l,s+k,i] * kernel[b,l,i,o,k]
    o = 0.0
    for k in range(K):  # K is small and static — unrolled
        o = o + jnp.einsum("blsi,blio->blso", win[:, :, k : k + hop_size], kernel[..., k])
    o = o + bias[:, :, None, :]
    return o.reshape(B, L * hop_size, C_out)


class LVCBlock(nn.Module):
    """(reference ``lvc_block.py:86``)"""

    in_channels: int
    upsample_ratio: int
    conv_layers: int = 4
    conv_kernel_size: int = 3
    cond_hop_length: int = 256
    kpnet_hidden_channels: int = 64
    kpnet_conv_size: int = 3
    kpnet_dropout: float = 0.0
    kpnet_lrelu_slope: float = 0.1
    kpnet_residual_style: str = "shared"

    @nn.compact
    def __call__(self, x, c, train: bool = False):
        kernels, bias = KernelPredictor(
            conv_in_channels=self.in_channels,
            conv_out_channels=2 * self.in_channels,
            conv_layers=self.conv_layers,
            conv_kernel_size=self.conv_kernel_size,
            kpnet_hidden_channels=self.kpnet_hidden_channels,
            kpnet_conv_size=self.kpnet_conv_size,
            kpnet_dropout=self.kpnet_dropout,
            lrelu_slope=self.kpnet_lrelu_slope,
            residual_style=self.kpnet_residual_style,
            name="kernel_predictor",
        )(c, train=train)
        x = nn.leaky_relu(x, 0.2)
        k_up = self.upsample_ratio * 2
        x = TorchConvTranspose1d(
            features=self.in_channels,
            kernel_size=k_up,
            stride=self.upsample_ratio,
            padding=self.upsample_ratio // 2 + self.upsample_ratio % 2,
            output_padding=self.upsample_ratio % 2,
            name="upsample",
        )(x)
        for i in range(self.conv_layers):
            y = nn.leaky_relu(x, 0.2)
            d = 3**i
            y = nn.Conv(
                self.in_channels, (self.conv_kernel_size,), kernel_dilation=(d,),
                padding=[((self.conv_kernel_size - 1) // 2 * d,) * 2], name=f"conv_{i}",
            )(y)
            y = nn.leaky_relu(y, 0.2)
            y = location_variable_convolution(
                y, kernels[:, :, i], bias[:, :, i], self.cond_hop_length
            )
            x = x + nn.sigmoid(y[..., : self.in_channels]) * jnp.tanh(
                y[..., self.in_channels :]
            )
        return x


class UnivnetGenerator(nn.Module):
    """(reference ``univnet_generator.py:13``)"""

    in_channels: int = 64  # noise channels
    out_channels: int = 1
    hidden_channels: int = 32
    cond_channels: int = 80
    upsample_factors: Sequence[int] = (8, 8, 4)
    lvc_layers_each_block: int = 4
    lvc_kernel_size: int = 3
    kpnet_hidden_channels: int = 64
    kpnet_conv_size: int = 3
    dropout: float = 0.0
    # the tortoise-bundled variant (reference tts/layers/tortoise/vocoder.py:277)
    # uses reflect-padded edge convs and 0.2 slopes throughout
    pad_mode: str = "zeros"
    kpnet_lrelu_slope: float = 0.1
    final_lrelu_slope: float = 0.1
    kpnet_residual_style: str = "shared"

    def _edge_conv(self, h, features: int, name: str):
        if self.pad_mode == "reflect":
            h = jnp.pad(h, ((0, 0), (3, 3), (0, 0)), mode="reflect")
            return nn.Conv(features, (7,), padding="VALID", name=name)(h)
        return nn.Conv(features, (7,), padding=[(3, 3)], name=name)(h)

    @nn.compact
    def __call__(self, c, x=None, train: bool = False):
        """c: mel [B, L, M] → wav [B, L*prod(factors), 1]."""
        total = int(np.prod(self.upsample_factors))
        if x is None:
            x = jax.random.normal(self.make_rng("noise"), (c.shape[0], c.shape[1], self.in_channels))
        h = self._edge_conv(x, self.hidden_channels, "first_conv")
        cond_hop = 1
        for n, f in enumerate(self.upsample_factors):
            cond_hop *= f
            h = LVCBlock(
                in_channels=self.hidden_channels,
                upsample_ratio=f,
                conv_layers=self.lvc_layers_each_block,
                conv_kernel_size=self.lvc_kernel_size,
                cond_hop_length=cond_hop,
                kpnet_hidden_channels=self.kpnet_hidden_channels,
                kpnet_conv_size=self.kpnet_conv_size,
                kpnet_dropout=self.dropout,
                kpnet_lrelu_slope=self.kpnet_lrelu_slope,
                kpnet_residual_style=self.kpnet_residual_style,
                name=f"lvc_{n}",
            )(h, c, train=train)
        h = nn.leaky_relu(h, self.final_lrelu_slope)  # reference LRELU_SLOPE
        h = self._edge_conv(h, self.out_channels, "last_conv")
        return jnp.tanh(h)
