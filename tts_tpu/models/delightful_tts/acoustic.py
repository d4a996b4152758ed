"""DelightfulTTS reference-depth acoustic model — weight-compatible flax
port of ``TTS/tts/layers/delightful_tts/*`` + ``acoustic_model.py``.

Every sublayer mirrors the reference op-for-op (including its quirks — the
batch-axis softmax in the style-token attention, InstanceNorm statistics
over padded frames, the 0.5× feed-forward scale) so converted checkpoints
are numerically interchangeable; each module has a reduced-dim parity test
in ``tests/test_convert_delightful.py``.

Layout is time-major [B, T, C] (the reference is channel-major; the
converter transposes conv kernels).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def positional_encoding(d_model: int, length: int) -> jnp.ndarray:
    """Sinusoidal table, sin on even / cos on odd channels (reference
    ``networks.py:18``): [1, length, d_model]."""
    position = np.arange(length, dtype=np.float32)[:, None]
    div_term = np.exp(np.arange(0, d_model, 2, dtype=np.float32) * -(math.log(10000.0) / d_model))
    pe = np.zeros((length, d_model), np.float32)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return jnp.asarray(pe[None])


def _lengths_to_pad_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """True at PADDED positions (reference ``get_mask_from_lengths``)."""
    ids = jnp.arange(max_len)[None]
    return ids >= lengths[:, None]


class BSConv1d(nn.Module):
    """Pointwise → depthwise separable conv (reference ``conv_layers.py:224``)
    on [B, T, C]."""

    features: int
    kernel_size: int
    padding: int

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (1,), name="pointwise")(x)
        x = nn.Conv(
            self.features, (self.kernel_size,), padding=[(self.padding,) * 2],
            feature_group_count=self.features, name="depthwise",
        )(x)
        return x


class ConvTransposed(nn.Module):
    """BSConv over the time axis of [B, T, C] (reference
    ``conv_layers.py:291`` — the name refers to its transposing wrapper,
    not a transposed convolution)."""

    features: int
    kernel_size: int = 1
    padding: int = 0

    @nn.compact
    def __call__(self, x):
        return BSConv1d(self.features, self.kernel_size, self.padding, name="conv")(x)


class Conv1dGLU(nn.Module):
    """DeepVoice-3 gated conv conditioning block (reference
    ``conv_layers.py:264``)."""

    d_model: int
    kernel_size: int
    embedding_dim: int

    @nn.compact
    def __call__(self, x, embeddings):  # x [B, T, C], embeddings [B, E]
        residual = x
        h = BSConv1d(2 * self.d_model, self.kernel_size,
                     self.kernel_size // 2, name="conv")(x)
        a, b = jnp.split(h, 2, axis=-1)
        e = nn.Dense(self.d_model, name="embedding_proj")(embeddings)
        a = a + jax.nn.soft_sign(e)[:, None, :]
        x = a * jax.nn.sigmoid(b)
        x = (x + residual) * jnp.sqrt(0.5).astype(x.dtype)
        return x


class FeedForward(nn.Module):
    """Conformer FF module with 0.5× output scale (reference
    ``conformer.py:178``)."""

    d_model: int
    kernel_size: int
    dropout: float
    lrelu_slope: float
    expansion_factor: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.LayerNorm(epsilon=1e-5, name="ln")(x)
        x = nn.Conv(self.d_model * self.expansion_factor, (self.kernel_size,),
                    padding=[(self.kernel_size // 2,) * 2], name="conv_1")(x)
        x = nn.leaky_relu(x, self.lrelu_slope)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Conv(self.d_model, (1,), name="conv_2")(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return 0.5 * x


class ConformerConvModule(nn.Module):
    """GLU-gated depthwise conv module (reference ``conformer.py:233``)."""

    d_model: int
    kernel_size: int = 7
    expansion_factor: int = 2
    dropout: float = 0.1
    lrelu_slope: float = 0.3

    @nn.compact
    def __call__(self, x, train: bool = False):
        inner = self.d_model * self.expansion_factor
        x = nn.LayerNorm(epsilon=1e-5, name="ln_1")(x)
        x = nn.Conv(inner * 2, (1,), name="conv_1")(x)
        out, gate = jnp.split(x, 2, axis=-1)
        x = out * nn.leaky_relu(gate, self.lrelu_slope)  # GLUActivation
        pad = self.kernel_size // 2
        x = nn.Conv(inner, (self.kernel_size,), padding=[(pad, pad)],
                    feature_group_count=inner, name="depthwise")(x)
        x = nn.GroupNorm(num_groups=1, epsilon=1e-5, name="ln_2")(x)
        x = nn.leaky_relu(x, self.lrelu_slope)
        x = nn.Conv(self.d_model, (1,), name="conv_2")(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class RelativeMultiHeadAttention(nn.Module):
    """Transformer-XL relative MHA (reference ``conformer.py:334``)."""

    d_model: int
    num_heads: int

    @nn.compact
    def __call__(self, query, key, value, pos_embedding, mask):
        B = query.shape[0]
        H, Dh = self.num_heads, self.d_model // self.num_heads
        q = nn.Dense(self.d_model, name="query_proj")(query).reshape(B, -1, H, Dh)
        k = nn.Dense(self.d_model, use_bias=False, name="key_proj")(key).reshape(B, -1, H, Dh)
        v = nn.Dense(self.d_model, use_bias=False, name="value_proj")(value).reshape(B, -1, H, Dh)
        p = nn.Dense(self.d_model, use_bias=False, name="pos_proj")(pos_embedding).reshape(B, -1, H, Dh)
        u_bias = self.param("u_bias", nn.initializers.xavier_uniform(), (H, Dh))
        v_bias = self.param("v_bias", nn.initializers.xavier_uniform(), (H, Dh))

        content = jnp.einsum("bthd,bshd->bhts", q + u_bias[None, None], k)
        pos = jnp.einsum("bthd,bshd->bhts", q + v_bias[None, None], p)
        pos = self._relative_shift(pos)
        score = (content + pos) / math.sqrt(self.d_model)
        score = jnp.where(mask, -1e9, score)
        attn = jax.nn.softmax(score, axis=-1)
        ctx = jnp.einsum("bhts,bshd->bthd", attn, v).reshape(B, -1, self.d_model)
        return nn.Dense(self.d_model, name="out_proj")(ctx), attn

    @staticmethod
    def _relative_shift(pos_score):
        B, H, T1, T2 = pos_score.shape
        padded = jnp.pad(pos_score, ((0, 0), (0, 0), (0, 0), (1, 0)))
        padded = padded.reshape(B, H, T2 + 1, T1)
        return padded[:, :, 1:].reshape(B, H, T1, T2)


class ConformerMultiHeadedSelfAttention(nn.Module):
    """(reference ``conformer.py:295``)"""

    d_model: int
    num_heads: int
    dropout_p: float

    @nn.compact
    def __call__(self, query, key, value, mask, encoding, train: bool = False):
        B, T = key.shape[0], key.shape[1]
        enc = jnp.broadcast_to(encoding[:, :T], (B, T, encoding.shape[-1]))
        out, attn = RelativeMultiHeadAttention(
            self.d_model, self.num_heads, name="attention"
        )(query, key, value, enc, mask)
        out = nn.Dropout(self.dropout_p, deterministic=not train)(out)
        return out, attn


class ConformerBlock(nn.Module):
    """(reference ``conformer.py:94``)"""

    d_model: int
    n_head: int
    kernel_size_conv_mod: int
    speaker_embedding_dim: int
    dropout: float
    lrelu_slope: float = 0.3

    @nn.compact
    def __call__(self, x, mask, slf_attn_mask, speaker_embedding, encoding,
                 train: bool = False):
        if speaker_embedding is not None:
            x = Conv1dGLU(
                self.d_model, self.kernel_size_conv_mod,
                self.speaker_embedding_dim, name="conditioning",
            )(x, speaker_embedding)
        x = FeedForward(self.d_model, 3, self.dropout, self.lrelu_slope,
                        name="ff")(x, train=train) + x
        x = ConformerConvModule(
            self.d_model, self.kernel_size_conv_mod, dropout=self.dropout,
            lrelu_slope=self.lrelu_slope, name="conformer_conv_1",
        )(x, train=train) + x
        res = x
        x = nn.LayerNorm(epsilon=1e-5, name="ln")(x)
        x, _ = ConformerMultiHeadedSelfAttention(
            self.d_model, self.n_head, self.dropout, name="slf_attn"
        )(x, x, x, slf_attn_mask, encoding, train=train)
        x = x + res
        x = jnp.where(mask[:, :, None], 0.0, x)
        x = ConformerConvModule(
            self.d_model, self.kernel_size_conv_mod, dropout=self.dropout,
            lrelu_slope=self.lrelu_slope, name="conformer_conv_2",
        )(x, train=train) + x
        return x


class Conformer(nn.Module):
    """(reference ``conformer.py:18``)"""

    dim: int
    n_layers: int
    n_heads: int
    speaker_embedding_dim: int
    p_dropout: float
    kernel_size_conv_mod: int
    lrelu_slope: float

    @nn.compact
    def __call__(self, x, mask, speaker_embedding, encoding, train: bool = False):
        # mask: [B, T] True at padded positions
        attn_mask = mask[:, None, None, :]
        for i in range(self.n_layers):
            x = ConformerBlock(
                self.dim, self.n_heads, self.kernel_size_conv_mod,
                self.speaker_embedding_dim, self.p_dropout, self.lrelu_slope,
                name=f"block_{i}",
            )(x, mask, attn_mask, speaker_embedding, encoding, train=train)
        return x


def _instance_norm(x, scale=None, bias=None, eps: float = 1e-5):
    """torch InstanceNorm1d on our [B, T, C] layout: normalize over TIME per
    channel per sample (statistics include padded frames, like the
    reference)."""
    mean = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.var(x, axis=1, keepdims=True)
    y = (x - mean) / jnp.sqrt(var + eps)
    if scale is not None:
        y = y * scale[None, None, :] + bias[None, None, :]
    return y


class InstanceNorm1dAffine(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return _instance_norm(x, scale, bias)


class CoordConv1d(nn.Module):
    """Conv1d with coordinate channels appended (reference
    ``conv_layers.py:451`` rank-1 with_r)."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    with_r: bool = True

    @nn.compact
    def __call__(self, x):  # [B, T, C]
        T = x.shape[1]
        xx = (jnp.arange(T, dtype=jnp.float32) / (T - 1)) * 2 - 1
        feats = [x, jnp.broadcast_to(xx[None, :, None], (x.shape[0], T, 1))]
        if self.with_r:
            rr = jnp.sqrt((xx - 0.5) ** 2)
            feats.append(jnp.broadcast_to(rr[None, :, None], (x.shape[0], T, 1)))
        x = jnp.concatenate(feats, axis=-1)
        return nn.Conv(self.features, (self.kernel_size,), strides=(self.stride,),
                       padding=[(self.padding,) * 2], name="conv")(x)


class ReferenceEncoder(nn.Module):
    """Strided conv + GRU mel reference encoder (reference
    ``encoders.py:24``); returns (outputs [B, T', G], final hidden [B, G],
    pad mask [B, T'])."""

    num_mels: int
    ref_enc_filters: Sequence[int]
    ref_enc_size: int
    ref_enc_strides: Sequence[int]
    ref_enc_gru_size: int

    @nn.compact
    def __call__(self, x, mel_lens):  # x: [B, T, n_mels]
        K = len(self.ref_enc_filters)
        strides = [1] + list(self.ref_enc_strides)
        pad_mask = _lengths_to_pad_mask(mel_lens, x.shape[1])
        x = jnp.where(pad_mask[:, :, None], 0.0, x)
        for i in range(K):
            if i == 0:
                x = CoordConv1d(self.ref_enc_filters[0], self.ref_enc_size,
                                strides[0], self.ref_enc_size // 2,
                                with_r=True, name="conv_0")(x)
            else:
                x = nn.Conv(self.ref_enc_filters[i], (self.ref_enc_size,),
                            strides=(strides[i],),
                            padding=[(self.ref_enc_size // 2,) * 2],
                            name=f"conv_{i}")(x)
            x = nn.leaky_relu(x, 0.3)
            x = InstanceNorm1dAffine(self.ref_enc_filters[i], name=f"norm_{i}")(x)

        lens = mel_lens
        for s in strides:
            if s > 1:
                lens = -(-lens // s)  # ceil, like the reference stride_lens
        out_mask = _lengths_to_pad_mask(lens, x.shape[1])
        x = jnp.where(out_mask[:, :, None], 0.0, x)

        # GRU over the padded sequence; the reference packs, so its padded
        # outputs are zero and the returned hidden is the LAST VALID state —
        # freeze the carry past each sample's length to match.
        G = self.ref_enc_gru_size
        cell = nn.GRUCell(G, name="gru")
        valid = (~out_mask).astype(x.dtype)

        def step(carry, inp):
            h, t = carry
            x_t, m_t = inp
            new_h, y = cell(h, x_t)
            new_h = jnp.where(m_t[:, None] > 0, new_h, h)
            return (new_h, t + 1), jnp.where(m_t[:, None] > 0, y, 0.0)

        h0 = jnp.zeros((x.shape[0], G), x.dtype)
        (h_last, _), ys = nn.scan(
            lambda cell_, carry, inp: step(carry, inp),
            variable_broadcast="params", split_rngs={"params": False},
            in_axes=1, out_axes=1,
        )(cell, (h0, 0), (x, valid))
        return ys, h_last, out_mask


class StyleEmbedAttention(nn.Module):
    """(reference ``networks.py:95``) — replicated literally, including the
    degenerate axis layout when queries arrive layer-major (see STL)."""

    query_dim: int
    key_dim: int
    num_units: int
    num_heads: int

    @nn.compact
    def __call__(self, query, key_soft):
        values = nn.Dense(self.num_units, use_bias=False, name="W_value")(key_soft)
        querys = nn.Dense(self.num_units, use_bias=False, name="W_query")(query)
        keys = nn.Dense(self.num_units, use_bias=False, name="W_key")(key_soft)
        split = self.num_units // self.num_heads
        # torch stacks dim-2 splits on a new leading axis
        qs = jnp.stack(jnp.split(querys, querys.shape[2] // split, axis=2)
                       if querys.shape[2] % split == 0 and querys.shape[2] >= split
                       else [querys], axis=0)
        ks = jnp.stack(jnp.split(keys, keys.shape[2] // split, axis=2)
                       if keys.shape[2] % split == 0 and keys.shape[2] >= split
                       else [keys], axis=0)
        vs = jnp.stack(jnp.split(values, values.shape[2] // split, axis=2)
                       if values.shape[2] % split == 0 and values.shape[2] >= split
                       else [values], axis=0)
        scores = jnp.matmul(qs, jnp.swapaxes(ks, -2, -1)) / (self.key_dim**0.5)
        scores = jax.nn.softmax(scores, axis=3)
        out = jnp.matmul(scores, vs)
        out = jnp.concatenate(jnp.split(out, out.shape[0], axis=0), axis=-1)[0]
        return out


class STL(nn.Module):
    """Style-token layer (reference ``networks.py:182``)."""

    n_hidden: int
    token_num: int

    @nn.compact
    def __call__(self, x):  # x: [1, B, E//2] (layer-major GRU memory)
        E = self.n_hidden
        embed = self.param(
            "embed", nn.initializers.normal(0.5), (self.token_num, E)
        )
        query = x[:, None]  # unsqueeze(1): [1, 1, B, E//2]
        keys_soft = jnp.tanh(embed)[None]  # [1, token_num, E]
        return StyleEmbedAttention(E // 2, E, E, 1, name="attention")(query, keys_soft)


class UtteranceLevelProsodyEncoder(nn.Module):
    """(reference ``encoders.py:126``)"""

    num_mels: int
    ref_enc_filters: Sequence[int]
    ref_enc_size: int
    ref_enc_strides: Sequence[int]
    ref_enc_gru_size: int
    dropout: float
    n_hidden: int
    bottleneck_size_u: int
    token_num: int

    @nn.compact
    def __call__(self, mels, mel_lens, train: bool = False):  # mels [B, T, M]
        _, memory, _ = ReferenceEncoder(
            self.num_mels, self.ref_enc_filters, self.ref_enc_size,
            self.ref_enc_strides, self.ref_enc_gru_size, name="encoder",
        )(mels, mel_lens)
        # torch GRU memory is layer-major [1, B, G]
        embedded = nn.Dense(self.n_hidden // 2, name="encoder_prj")(memory[None])
        out = STL(self.n_hidden, self.token_num, name="stl")(embedded)
        out = nn.Dense(self.bottleneck_size_u, name="encoder_bottleneck")(out)
        out = nn.Dropout(self.dropout, deterministic=not train)(out)
        return out.reshape(-1, 1, out.shape[-1])  # [B, 1, bottleneck]


class PhonemeLevelProsodyEncoder(nn.Module):
    """(reference ``encoders.py:198``)"""

    num_mels: int
    ref_enc_filters: Sequence[int]
    ref_enc_size: int
    ref_enc_strides: Sequence[int]
    ref_enc_gru_size: int
    dropout: float
    n_hidden: int
    n_heads: int
    bottleneck_size_p: int

    @nn.compact
    def __call__(self, x, src_mask, mels, mel_lens, encoding, train: bool = False):
        prosody, _, mel_masks = ReferenceEncoder(
            self.num_mels, self.ref_enc_filters, self.ref_enc_size,
            self.ref_enc_strides, self.ref_enc_gru_size, name="encoder",
        )(mels, mel_lens)
        prosody = nn.Dense(self.n_hidden, name="encoder_prj")(prosody)
        attn_mask = mel_masks[:, None, None, :]
        x, _ = ConformerMultiHeadedSelfAttention(
            self.n_hidden, self.n_heads, self.dropout, name="attention"
        )(x, prosody, prosody, attn_mask, encoding, train=train)
        x = nn.Dense(self.bottleneck_size_p, name="encoder_bottleneck")(x)
        return jnp.where(src_mask[:, :, None], 0.0, x)


class VariancePredictor(nn.Module):
    """(reference ``variance_predictor.py:7``)"""

    channels: int
    channels_out: int
    kernel_size: int
    p_dropout: float
    lrelu_slope: float

    @nn.compact
    def __call__(self, x, mask, train: bool = False):  # mask True at pads
        for i in range(2):
            x = ConvTransposed(self.channels, self.kernel_size,
                               (self.kernel_size - 1) // 2, name=f"conv_{i}")(x)
            x = nn.leaky_relu(x, self.lrelu_slope)
            x = nn.LayerNorm(epsilon=1e-5, name=f"ln_{i}")(x)
            x = nn.Dropout(self.p_dropout, deterministic=not train)(x)
        x = nn.Dense(self.channels_out, name="linear_layer")(x)
        x = x[..., 0] if self.channels_out == 1 else x
        return jnp.where(mask, 0.0, x)


class VarianceAdaptor(nn.Module):
    """Pitch/energy adaptor (reference ``pitch_adaptor.py`` /
    ``energy_adaptor.py`` — identical structure)."""

    n_input: int
    n_hidden: int
    kernel_size: int
    emb_kernel_size: int
    p_dropout: float
    lrelu_slope: float
    # reference quirk: PitchAdaptor's embedding conv outputs n_input
    # channels, EnergyAdaptor's outputs channels_hidden (identical at the
    # default 512/512 config; they must match for the residual add)
    emb_features: Optional[int] = None

    def setup(self):
        self.predictor = VariancePredictor(
            self.n_hidden, 1, self.kernel_size, self.p_dropout,
            self.lrelu_slope, name="predictor",
        )
        self.emb = nn.Conv(
            self.emb_features or self.n_input, (self.emb_kernel_size,),
            padding=[((self.emb_kernel_size - 1) // 2,) * 2], name="emb",
        )

    def embedding_train(self, x, target, dr, mask):
        """x [B,T,C], target [B,T_mel,1], dr [B,T] → (pred, avg_target, emb)."""
        from tts_tpu.ops import average_over_durations

        pred = self.predictor(x, mask)
        avg = average_over_durations(target, dr.astype(jnp.int32))  # [B, T, 1]
        return pred, avg, self.emb(avg)

    def embedding_infer(self, x, mask):
        pred = self.predictor(x, mask)
        return self.emb(pred[:, :, None]), pred

    def __call__(self, x, target, dr, mask):
        return self.embedding_train(x, target, dr, mask)


class PhonemeProsodyPredictor(nn.Module):
    """(reference ``phoneme_prosody_predictor.py:7``)"""

    hidden_size: int
    kernel_size: int
    dropout: float
    bottleneck_size: int
    lrelu_slope: float

    @nn.compact
    def __call__(self, x, mask, train: bool = False):
        for i in range(2):
            x = ConvTransposed(self.hidden_size, self.kernel_size,
                               (self.kernel_size - 1) // 2, name=f"conv_{i}")(x)
            x = nn.leaky_relu(x, self.lrelu_slope)
            x = nn.LayerNorm(epsilon=1e-5, name=f"ln_{i}")(x)
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = jnp.where(mask[:, :, None], 0.0, x)
        return nn.Dense(self.bottleneck_size, name="predictor_bottleneck")(x)


class EmbeddingPadded(nn.Module):
    """(reference ``networks.py:134``)"""

    num_embeddings: int
    embedding_dim: int
    padding_idx: int

    @nn.compact
    def __call__(self, idx):
        emb = self.param(
            "embeddings",
            lambda k, s: jax.random.normal(k, s) * np.sqrt(2 / s[1]),
            (self.num_embeddings, self.embedding_dim),
        )
        mult = jnp.ones((self.num_embeddings, 1)).at[self.padding_idx].set(0.0)
        return jnp.take(emb * mult, idx, axis=0)
