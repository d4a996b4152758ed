"""Conformer blocks (reference ``TTS/tts/layers/delightful_tts/conformer.py``).

FF half-step → self-attention → depthwise-conv module → FF half-step, with
pre-norms; used by the DelightfulTTS encoder/decoder.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp


class ConformerConvModule(nn.Module):
    dim: int
    kernel_size: int = 7
    expansion: int = 2
    dropout_p: float = 0.1

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        h = nn.LayerNorm(name="norm")(x)
        h = nn.Dense(self.dim * self.expansion * 2, name="pw1")(h)
        a, b = jnp.split(h, 2, axis=-1)
        h = a * nn.sigmoid(b)  # GLU
        pad = (self.kernel_size - 1) // 2
        h = nn.Conv(
            self.dim * self.expansion, (self.kernel_size,),
            feature_group_count=self.dim * self.expansion,
            padding=[(pad, pad)], name="dw",
        )(h)
        h = nn.silu(h)
        h = nn.Dense(self.dim, name="pw2")(h)
        h = nn.Dropout(self.dropout_p, deterministic=not train)(h)
        if mask is not None:
            h = h * mask
        return h


class ConformerBlock(nn.Module):
    dim: int
    num_heads: int
    ffn_mult: int = 4
    conv_kernel: int = 7
    dropout_p: float = 0.1

    @nn.compact
    def __call__(self, x, mask=None, cond=None, train: bool = False):
        def ff(x, name):
            h = nn.LayerNorm(name=f"{name}_norm")(x)
            h = nn.silu(nn.Dense(self.dim * self.ffn_mult, name=f"{name}_1")(h))
            h = nn.Dropout(self.dropout_p, deterministic=not train)(h)
            return nn.Dense(self.dim, name=f"{name}_2")(h)

        x = x + 0.5 * ff(x, "ff1")
        attn_mask = None
        if mask is not None:
            attn_mask = (mask[..., 0] > 0)[:, None, None, :]
        h = nn.LayerNorm(name="attn_norm")(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dropout_rate=self.dropout_p,
            deterministic=not train, name="attn",
        )(h, h, mask=attn_mask)
        x = x + h
        x = x + ConformerConvModule(
            self.dim, self.conv_kernel, dropout_p=self.dropout_p, name="conv"
        )(x, mask, train=train)
        x = x + 0.5 * ff(x, "ff2")
        x = nn.LayerNorm(name="final_norm")(x)
        if mask is not None:
            x = x * mask
        return x


class Conformer(nn.Module):
    """(reference ``conformer.py:18``)"""

    dim: int
    num_layers: int
    num_heads: int
    speaker_embedding_dim: int = 0

    @nn.compact
    def __call__(self, x, mask=None, speaker_embedding: Optional[jnp.ndarray] = None,
                 train: bool = False):
        if speaker_embedding is not None:
            x = x + nn.Dense(self.dim, name="cond_proj")(speaker_embedding)[:, None, :]
        for i in range(self.num_layers):
            x = ConformerBlock(self.dim, self.num_heads, name=f"block_{i}")(
                x, mask, train=train
            )
        return x
