"""Relative-position transformer (reference ``glow_tts/transformer.py``).

Used by the GlowTTS encoder, the VITS text encoder and the ForwardTTS
encoder/decoder options.  TPU-native: attention is batched einsum on the
MXU; the relative-logits→absolute trick is pure reshapes so XLA fuses the
whole block.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from .common import Conv1d, LayerNorm


def _relative_position_to_absolute_position(x: jnp.ndarray) -> jnp.ndarray:
    """``[B, H, T, 2T-1]`` rel-indexed logits → ``[B, H, T, T]`` abs-indexed
    (reference ``transformer.py:206``)."""
    b, h, t, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 1)))  # [B,H,T,2T]
    x_flat = x.reshape(b, h, t * 2 * t)
    x_flat = jnp.pad(x_flat, ((0, 0), (0, 0), (0, t - 1)))
    return x_flat.reshape(b, h, t + 1, 2 * t - 1)[:, :, :t, t - 1 :]


def _absolute_position_to_relative_position(x: jnp.ndarray) -> jnp.ndarray:
    """``[B, H, T, T]`` → ``[B, H, T, 2T-1]`` (reference ``transformer.py:221``)."""
    b, h, t, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, t - 1)))
    x_flat = x.reshape(b, h, t * t + t * (t - 1))
    x_flat = jnp.pad(x_flat, ((0, 0), (0, 0), (t, 0)))
    return x_flat.reshape(b, h, t, 2 * t)[:, :, :, 1:]


class RelativePositionMultiHeadAttention(nn.Module):
    """Self-attention with learned relative-position key/value embeddings
    over a ±window (reference ``transformer.py:10``)."""

    channels: int
    out_channels: int
    num_heads: int
    rel_attn_window_size: Optional[int] = None
    heads_share: bool = True
    dropout_p: float = 0.0
    proximal_bias: bool = False

    def _get_relative_embeddings(self, emb: jnp.ndarray, length: int) -> jnp.ndarray:
        """Slice/pad the ``[h, 2W+1, d]`` table to ``[h, 2T-1, d]``."""
        w = self.rel_attn_window_size
        pad_length = max(length - (w + 1), 0)
        if pad_length > 0:
            emb = jnp.pad(emb, ((0, 0), (pad_length, pad_length), (0, 0)))
        start = max((w + 1) - length, 0)
        return emb[:, start : start + 2 * length - 1]

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        c: jnp.ndarray,
        attn_mask: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        """x (queries), c (keys/values): ``[B, T, C]``; attn_mask ``[B, 1, T, T]``."""
        B, T_t, _ = x.shape
        T_s = c.shape[1]
        H = self.num_heads
        k_channels = self.channels // H

        q = nn.Dense(self.channels, name="conv_q")(x).reshape(B, T_t, H, k_channels)
        k = nn.Dense(self.channels, name="conv_k")(c).reshape(B, T_s, H, k_channels)
        v = nn.Dense(self.channels, name="conv_v")(c).reshape(B, T_s, H, k_channels)

        scores = jnp.einsum("bthd,bshd->bhts", q, k) / math.sqrt(k_channels)

        if self.rel_attn_window_size is not None:
            assert T_s == T_t, "Relative attention is only for self-attention."
            n_heads_rel = 1 if self.heads_share else H
            rel_stddev = k_channels**-0.5
            emb_rel_k = self.param(
                "emb_rel_k",
                lambda key, shape: rel_stddev * jnp.asarray(
                    nn.initializers.normal(1.0)(key, shape)
                ),
                (n_heads_rel, 2 * self.rel_attn_window_size + 1, k_channels),
            )
            emb_rel_v = self.param(
                "emb_rel_v",
                lambda key, shape: rel_stddev * jnp.asarray(
                    nn.initializers.normal(1.0)(key, shape)
                ),
                (n_heads_rel, 2 * self.rel_attn_window_size + 1, k_channels),
            )
            key_rel = self._get_relative_embeddings(emb_rel_k, T_s)  # [h, 2T-1, d]
            rel_logits = jnp.einsum("bthd,hmd->bhtm", q, key_rel)
            scores = scores + _relative_position_to_absolute_position(rel_logits) / math.sqrt(
                k_channels
            )

        if self.proximal_bias:
            r = jnp.arange(T_s, dtype=jnp.float32)
            diff = -jnp.log1p(jnp.abs(r[None, :] - r[:, None]))
            scores = scores + diff[None, None]

        if attn_mask is not None:
            scores = jnp.where(attn_mask == 0, -1e4, scores)

        p_attn = nn.softmax(scores, axis=-1)  # [B, H, T_t, T_s]
        p_attn = nn.Dropout(self.dropout_p, deterministic=not train)(p_attn)
        out = jnp.einsum("bhts,bshd->bthd", p_attn, v)

        if self.rel_attn_window_size is not None:
            rel_weights = _absolute_position_to_relative_position(p_attn)  # [B,H,T,2T-1]
            value_rel = self._get_relative_embeddings(emb_rel_v, T_s)
            out = out + jnp.einsum("bhtm,hmd->bthd", rel_weights, value_rel)

        out = out.reshape(B, T_t, self.channels)
        return nn.Dense(self.out_channels, name="conv_o")(out)


class FeedForwardNetwork(nn.Module):
    """Conv feed-forward block (reference ``transformer.py:260``)."""

    out_channels: int
    hidden_channels: int
    kernel_size: int
    dropout_p: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, x_mask: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = Conv1d(self.hidden_channels, self.kernel_size, name="conv_1")(x * x_mask)
        x = nn.Dropout(self.dropout_p, deterministic=not train)(nn.relu(x))
        x = Conv1d(self.out_channels, self.kernel_size, name="conv_2")(x * x_mask)
        return x * x_mask


class RelativePositionTransformer(nn.Module):
    """Transformer encoder stack with relative positional encoding
    (reference ``transformer.py:432``)."""

    hidden_channels: int
    out_channels: int
    hidden_channels_ffn: int
    num_heads: int
    num_layers: int
    kernel_size: int = 1
    dropout_p: float = 0.0
    rel_attn_window_size: Optional[int] = None
    input_length: Optional[int] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, x_mask: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """x: ``[B, T, C]``, x_mask: ``[B, T, 1]``."""
        attn_mask = (x_mask[:, None, :, 0:1] * x_mask[:, None, None, :, 0]).astype(x.dtype)
        for i in range(self.num_layers):
            x = x * x_mask
            y = RelativePositionMultiHeadAttention(
                channels=self.hidden_channels,
                out_channels=self.hidden_channels,
                num_heads=self.num_heads,
                rel_attn_window_size=self.rel_attn_window_size,
                dropout_p=self.dropout_p,
                name=f"attn_{i}",
            )(x, x, attn_mask=attn_mask, train=train)
            y = nn.Dropout(self.dropout_p, deterministic=not train)(y)
            x = LayerNorm(name=f"norm1_{i}")(x + y)

            y = FeedForwardNetwork(
                out_channels=(
                    self.out_channels if (i + 1) == self.num_layers else self.hidden_channels
                ),
                hidden_channels=self.hidden_channels_ffn,
                kernel_size=self.kernel_size,
                dropout_p=self.dropout_p,
                name=f"ffn_{i}",
            )(x, x_mask, train=train)
            y = nn.Dropout(self.dropout_p, deterministic=not train)(y)
            if (i + 1) == self.num_layers and self.hidden_channels != self.out_channels:
                x = nn.Dense(self.out_channels, name="proj")(x)
            x = LayerNorm(name=f"norm2_{i}")(x + y)
        return x * x_mask
