"""Feed-forward (non-autoregressive) encoder/decoder blocks
(reference ``TTS/tts/layers/feed_forward/`` + ``generic/transformer.py`` +
``generic/res_conv_bn.py`` + ``generic/pos_encoding.py``).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .common import Conv1d


class FFTransformerLayer(nn.Module):
    """Self-attention + conv FFN layer (reference ``generic/transformer.py:6``)."""

    in_out_channels: int
    num_heads: int
    hidden_channels_ffn: int = 1024
    kernel_size_fft: int = 3
    dropout_p: float = 0.1

    @nn.compact
    def __call__(self, x, key_padding_mask=None, train: bool = False):
        """x: ``[B, T, C]``; key_padding_mask: ``[B, T]`` True = PAD."""
        attn_mask = None
        if key_padding_mask is not None:
            attn_mask = (~key_padding_mask)[:, None, None, :]  # [B, 1, 1, T]
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            qkv_features=self.in_out_channels,
            dropout_rate=self.dropout_p,
            deterministic=not train,
            name="self_attn",
        )(x, x, mask=attn_mask)
        y_dropped = nn.Dropout(self.dropout_p, deterministic=not train)(y)
        # the reference adds the attention output twice, once dropped and once
        # raw (generic/transformer.py:25-26); reproduced for checkpoint parity
        x = nn.LayerNorm(name="norm1")(x + y_dropped + y)
        # zero PAD rows before the conv so padding can't bleed into valid
        # frames (the reference runs on unpadded T; its convs see zero-pad)
        if key_padding_mask is not None:
            x = jnp.where(key_padding_mask[:, :, None], 0.0, x)
        y = Conv1d(self.hidden_channels_ffn, self.kernel_size_fft, name="conv1")(x)
        y = nn.relu(y)
        if key_padding_mask is not None:
            y = jnp.where(key_padding_mask[:, :, None], 0.0, y)
        y = Conv1d(self.in_out_channels, self.kernel_size_fft, name="conv2")(y)
        y = nn.Dropout(self.dropout_p, deterministic=not train)(y)
        return nn.LayerNorm(name="norm2")(x + y)


class FFTransformerBlock(nn.Module):
    """Stack of FFT layers (reference ``generic/transformer.py:38``)."""

    in_out_channels: int
    num_heads: int
    hidden_channels_ffn: int
    num_layers: int
    dropout_p: float = 0.1

    @nn.compact
    def __call__(self, x, mask=None, g=None, train: bool = False):
        """x ``[B, T, C]``, mask ``[B, T, 1]`` 1 = valid."""
        key_padding_mask = None
        if mask is not None:
            key_padding_mask = mask[..., 0] < 0.5  # True = pad
        for i in range(self.num_layers):
            x = FFTransformerLayer(
                in_out_channels=self.in_out_channels,
                num_heads=self.num_heads,
                hidden_channels_ffn=self.hidden_channels_ffn,
                dropout_p=self.dropout_p,
                name=f"fft_{i}",
            )(x, key_padding_mask=key_padding_mask, train=train)
            if mask is not None:
                x = x * mask
        return x


class ResidualConv1dBNBlock(nn.Module):
    """Residual conv-BN stack (reference ``generic/res_conv_bn.py``;
    speedy-speech encoder/decoder).  BatchNorm is replaced by LayerNorm —
    batch statistics are hostile to pjit sharding, and LN matches quality
    on these shallow stacks."""

    hidden_channels: int
    out_channels: int
    kernel_size: int
    dilations: Sequence[int]
    num_conv_blocks: int = 2

    @nn.compact
    def __call__(self, x, x_mask=None, g=None, train: bool = False):
        if x_mask is None:
            x_mask = jnp.ones_like(x[..., :1])
        res = None
        for b, d in enumerate(self.dilations):
            h = x
            # uneven padding keeps even kernels length-preserving
            # (reference res_conv_bn.py Conv1dBN)
            total_pad = d * (self.kernel_size - 1)
            pad = (total_pad // 2, total_pad - total_pad // 2)
            for c in range(self.num_conv_blocks):
                h = nn.Conv(
                    self.hidden_channels,
                    (self.kernel_size,),
                    kernel_dilation=(d,),
                    padding=[pad],
                    name=f"block{b}_conv{c}",
                )(h * x_mask)
                h = nn.relu(nn.LayerNorm(name=f"block{b}_norm{c}")(h))
            x = h if res is None else h + res
            res = x
        return Conv1d(self.out_channels, 1, name="proj")(x * x_mask) * x_mask


class PositionalEncoding(nn.Module):
    """Sinusoidal positions, optionally learned-scaled
    (reference ``generic/pos_encoding.py``)."""

    channels: int
    use_scale: bool = False
    max_len: int = 5000

    @nn.compact
    def __call__(self, x, mask=None):
        # reference quirk (pos_encoding.py:29): div_term is 10000^(2i/C) and
        # MULTIPLIES the position — not the Vaswani 10000^(-2i/C) — and the
        # input is pre-scaled by sqrt(C); reproduced for checkpoint parity
        T = x.shape[1]
        position = np.arange(self.max_len)[:, None].astype(np.float64)
        div_term = np.power(10000.0, np.arange(0, self.channels, 2, dtype=np.float64) / self.channels)
        pe = np.zeros((self.max_len, self.channels), np.float32)
        pe[:, 0::2] = np.sin(position * div_term)
        pe[:, 1::2] = np.cos(position * div_term)[:, : self.channels // 2]
        pe_t = jnp.asarray(pe[None, :T])
        if mask is not None:
            pe_t = pe_t * mask
        x = x * math.sqrt(self.channels)
        if self.use_scale:
            scale = self.param("scale", nn.initializers.ones, (1,))
            return x + scale * pe_t
        return x + pe_t
