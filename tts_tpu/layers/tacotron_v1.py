"""Tacotron v1 layers: CBHG encoder/postnet and GST
(reference ``TTS/tts/layers/tacotron/tacotron.py`` + ``gst_layers.py``)."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


class _NormConv1d(nn.Module):
    out_channels: int
    kernel_size: int
    stride: int = 1
    activation: Optional[str] = "relu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel_size - 1) // 2
        x = nn.Conv(self.out_channels, (self.kernel_size,), strides=(self.stride,),
                    padding=[(pad, self.kernel_size - 1 - pad)], use_bias=False, name="conv")(x)
        if self.activation == "relu":
            x = nn.relu(x)
        return nn.LayerNorm(name="norm")(x)


class Highway(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        h = nn.relu(nn.Dense(self.features, name="H")(x))
        t = nn.sigmoid(nn.Dense(self.features, bias_init=nn.initializers.constant(-1.0), name="T")(x))
        return h * t + x * (1.0 - t)


class CBHG(nn.Module):
    """Conv bank + highway + biGRU (reference ``tacotron.py:94``)."""

    K: int = 16
    conv_bank_features: int = 128
    conv_projections: Sequence[int] = (128, 128)
    highway_features: int = 128
    gru_features: int = 128
    num_highways: int = 4
    last_proj_activation: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, x_mask=None):
        """``x_mask`` (float ``[B, T, 1]``, optional) makes the output at valid
        positions invariant to trailing padding: conv stages are re-zeroed so
        padded activations never bleed into valid receptive fields, and the
        biGRU reverses only the valid segment."""
        lengths = None
        if x_mask is not None:
            x = x * x_mask
            lengths = jnp.sum(x_mask[:, :, 0], axis=1).astype(jnp.int32)
        # conv bank: kernels 1..K concatenated on channels
        bank = [
            _NormConv1d(self.conv_bank_features, k, name=f"bank_{k}")(x, train=train)
            for k in range(1, self.K + 1)
        ]
        h = jnp.concatenate(bank, axis=-1)
        if x_mask is not None:
            # padded positions get -1e9 (not 0) so the pool window at the last
            # valid position matches the unpadded edge behavior exactly
            h = jnp.where(x_mask > 0, h, -1e9)
        # max-pool width 2 stride 1
        h = nn.max_pool(jnp.pad(h, ((0, 0), (0, 1), (0, 0)), constant_values=-1e9),
                        (2,), strides=(1,))
        if x_mask is not None:
            h = h * x_mask
        for i, ch in enumerate(self.conv_projections):
            act = "relu" if (i < len(self.conv_projections) - 1 or self.last_proj_activation) else None
            h = _NormConv1d(ch, 3, activation=act, name=f"proj_{i}")(h, train=train)
            if x_mask is not None:
                h = h * x_mask
        h = h + x  # residual
        if h.shape[-1] != self.highway_features:
            h = nn.Dense(self.highway_features, name="pre_highway")(h)
        for i in range(self.num_highways):
            h = Highway(self.highway_features, name=f"highway_{i}")(h)
        fwd = nn.RNN(nn.GRUCell(self.gru_features), name="gru_fwd")(h, seq_lengths=lengths)
        bwd = nn.RNN(nn.GRUCell(self.gru_features), reverse=True, keep_order=True, name="gru_bwd")(
            h, seq_lengths=lengths
        )
        return jnp.concatenate([fwd, bwd], axis=-1)


class ReferenceEncoder(nn.Module):
    """Mel → fixed style query (reference ``gst_layers.py:26``).

    Conv geometry matches the torch module exactly (3×3, stride 2, pad
    (1,1)) so converted checkpoints are numerically compatible;
    ``norm_type='folded'`` is the eval-mode affine of a converted
    BatchNorm2d."""

    embedding_dim: int
    norm_type: str = "layer"

    @nn.compact
    def __call__(self, mel):  # [B, T, M]
        h = mel[..., None]  # [B, T, M, 1]
        for i, ch in enumerate((32, 32, 64, 64, 128, 128)):
            h = nn.Conv(
                ch, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)], name=f"conv_{i}"
            )(h)
            if self.norm_type == "folded":
                scale = self.param(f"scale_{i}", nn.initializers.ones, (ch,))
                shift = self.param(f"shift_{i}", nn.initializers.zeros, (ch,))
                h = h * scale + shift
            else:
                h = nn.LayerNorm(name=f"norm_{i}")(h)
            h = nn.relu(h)
        B, T, M, C = h.shape
        # torch flattens channel-major: x.transpose(1,2).view(B, T, C*H)
        h = jnp.swapaxes(h, 2, 3).reshape(B, T, C * M)
        out = nn.RNN(nn.GRUCell(self.embedding_dim // 2, name="gru"))(h)
        return out[:, -1]  # [B, D/2] — GRU final state


class StyleTokenLayer(nn.Module):
    """Attention over learned style tokens (reference ``gst_layers.py:82``)."""

    num_heads: int
    num_style_tokens: int
    gst_embedding_dim: int
    d_vector_dim: Optional[int] = None

    @nn.compact
    def __call__(self, query):  # [B, D_q]
        key_dim = self.gst_embedding_dim // self.num_heads
        tokens = self.param(
            "style_tokens", nn.initializers.normal(0.5), (self.num_style_tokens, key_dim)
        )
        keys = jnp.tanh(tokens)[None].repeat(query.shape[0], axis=0)  # [B, N, key]
        q = nn.Dense(self.gst_embedding_dim, use_bias=False, name="W_query")(query[:, None])
        k = nn.Dense(self.gst_embedding_dim, use_bias=False, name="W_key")(keys)
        v = nn.Dense(self.gst_embedding_dim, use_bias=False, name="W_value")(keys)
        B, _, D = q.shape
        H = self.num_heads
        qh = q.reshape(B, 1, H, D // H)
        kh = k.reshape(B, -1, H, D // H)
        vh = v.reshape(B, -1, H, D // H)
        scores = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / (D // H) ** 0.5
        attn = nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, vh).reshape(B, 1, D)
        return out[:, 0]  # [B, gst_embedding_dim]


class GST(nn.Module):
    """Global style tokens (reference ``gst_layers.py:6``)."""

    num_mel: int
    num_heads: int
    num_style_tokens: int
    gst_embedding_dim: int
    norm_type: str = "layer"

    @nn.compact
    def __call__(self, mel):
        query = ReferenceEncoder(self.gst_embedding_dim, self.norm_type, name="encoder")(mel)
        return StyleTokenLayer(
            self.num_heads, self.num_style_tokens, self.gst_embedding_dim,
            name="style_token_layer",
        )(query)
