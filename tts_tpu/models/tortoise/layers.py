"""Tortoise neural building blocks, weight-compatible with the reference
checkpoints (``TTS/tts/layers/tortoise/{diffusion_decoder,clvp,arch_utils,
xtransformers}.py``): the diffusion mel decoder (``DiffusionTts``), the
CLVP contrastive reranker, and their shared attention blocks.

TPU notes: everything is static-shape and jittable.  The T5 relative
position buckets and rotary tables are compile-time constants; the
reference's layer-drop / classifier-free-training branches are
training-time regularizers and are omitted (these checkpoints are
inference-only in the reference as well).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tts_tpu.vc.modules.wavlm import _relative_position_buckets

__all__ = ["AttentionBlock", "ResBlock", "DiffusionLayer", "DiffusionTts", "CLVP"]


def _norm_groups(channels: int) -> int:
    """Reference ``arch_utils.normalization`` group count."""
    groups = 32
    if channels <= 16:
        groups = 8
    elif channels <= 64:
        groups = 16
    while channels % groups != 0:
        groups //= 2
    assert groups > 2
    return groups


def _gn(channels: int, name: str) -> nn.GroupNorm:
    return nn.GroupNorm(num_groups=_norm_groups(channels), epsilon=1e-5, name=name)


def timestep_embedding(t: jnp.ndarray, dim: int, max_period: int = 10000) -> jnp.ndarray:
    """Sinusoidal timestep embedding, cos-first like the reference
    (``diffusion_decoder.py:21``)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class AttentionBlock(nn.Module):
    """Residual self-attention over a 1-D sequence (reference
    ``arch_utils.AttentionBlock``): GroupNorm → 1×1 qkv conv (layout
    [H][q|k|v][ch]) → symmetric-scaled attention (+ optional T5 relative
    position bias) → zero-init 1×1 proj → residual."""

    channels: int
    num_heads: int = 1
    relative_pos_embeddings: bool = False
    rel_num_buckets: int = 32
    rel_max_distance: int = 64

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # x: [B, T, C]
        B, T, C = x.shape
        H = self.num_heads
        ch = C // H
        h = _gn(C, "norm")(x)
        qkv = nn.Conv(3 * C, (1,), name="qkv")(h).reshape(B, T, H, 3, ch)
        q, k, v = qkv[..., 0, :], qkv[..., 1, :], qkv[..., 2, :]
        scale = 1.0 / math.sqrt(math.sqrt(ch))
        dots = jnp.einsum("bthc,bshc->bhts", q * scale, k * scale)
        if self.relative_pos_embeddings:
            table = self.param(
                "relative_attention_bias",
                nn.initializers.normal(0.02),
                (self.rel_num_buckets, H),
            )
            buckets = jnp.asarray(
                _relative_position_buckets(T, self.rel_num_buckets, self.rel_max_distance)
            )
            # jnp.take: params restored from msgpack are host numpy arrays,
            # and numpy fancy-indexing on a traced index array fails
            bias = jnp.take(jnp.asarray(table), buckets, axis=0)
            dots = dots + jnp.transpose(bias, (2, 0, 1))[None] * math.sqrt(ch)
        probs = jax.nn.softmax(dots, axis=-1)
        out = jnp.einsum("bhts,bshc->bthc", probs, v).reshape(B, T, C)
        return x + nn.Conv(C, (1,), name="proj_out")(out)


class ResBlock(nn.Module):
    """Timestep-conditioned residual conv block (reference
    ``diffusion_decoder.ResBlock``, efficient_config + scale-shift norm)."""

    channels: int
    out_channels: Optional[int] = None
    use_scale_shift_norm: bool = True
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray, emb: jnp.ndarray) -> jnp.ndarray:
        C_out = self.out_channels or self.channels
        pad = {1: 0, 3: 1, 5: 2}[self.kernel_size]
        h = _gn(self.channels, "in_norm")(x)
        h = nn.silu(h)
        h = nn.Conv(C_out, (1,), padding=0, name="in_conv")(h)  # efficient: k=1
        e = nn.Dense(2 * C_out if self.use_scale_shift_norm else C_out, name="emb")(nn.silu(emb))
        if self.use_scale_shift_norm:
            scale, shift = jnp.split(e[:, None, :], 2, axis=-1)
            h = _gn(C_out, "out_norm")(h) * (1 + scale) + shift
            h = nn.Conv(C_out, (self.kernel_size,), padding=pad, name="out_conv")(nn.silu(h))
        else:
            h = h + e[:, None, :]
            h = _gn(C_out, "out_norm")(h)
            h = nn.Conv(C_out, (self.kernel_size,), padding=pad, name="out_conv")(nn.silu(h))
        skip = x if C_out == self.channels else nn.Conv(C_out, (1,), padding=0, name="skip")(x)
        return skip + h


class DiffusionLayer(nn.Module):
    """ResBlock + rel-pos AttentionBlock (reference ``DiffusionLayer``)."""

    channels: int
    num_heads: int

    @nn.compact
    def __call__(self, x, emb):
        y = ResBlock(self.channels, name="resblk")(x, emb)
        return AttentionBlock(
            self.channels, self.num_heads, relative_pos_embeddings=True, name="attn"
        )(y)


class DiffusionTts(nn.Module):
    """The Tortoise diffusion mel decoder (reference
    ``diffusion_decoder.DiffusionTts:140``), weight-compatible.

    Operates time-major [B, T, C] (the reference is channel-major; the
    converter transposes conv kernels accordingly).
    """

    model_channels: int = 1024
    num_layers: int = 10
    in_channels: int = 100
    in_latent_channels: int = 1024
    in_tokens: int = 8193
    out_channels: int = 200
    num_heads: int = 16

    def setup(self):
        MC, H = self.model_channels, self.num_heads
        self.inp_block = nn.Conv(MC, (3,), padding=1, name="inp_block")
        self.time_embed_0 = nn.Dense(MC, name="time_embed_0")
        self.time_embed_2 = nn.Dense(MC, name="time_embed_2")
        self.cti = [DiffusionLayer(MC, H, name=f"cti_{i}") for i in range(3)]
        self.integrating_conv = nn.Conv(MC, (1,), name="integrating_conv")
        self.layers = [DiffusionLayer(MC, H, name=f"layer_{i}") for i in range(self.num_layers)]
        self.posts = [ResBlock(MC, name=f"post_{i}") for i in range(3)]
        self.out_norm = _gn(MC, "out_norm")
        self.out_conv = nn.Conv(self.out_channels, (3,), padding=1, name="out_conv")
        self.unconditioned_embedding = self.param(
            "unconditioned_embedding", nn.initializers.normal(1.0), (1, 1, MC)
        )
        # contextual embedder (get_conditioning)
        self.ctx_conv_0 = nn.Conv(MC, (3,), strides=(2,), padding=1, name="ctx_conv_0")
        self.ctx_conv_1 = nn.Conv(2 * MC, (3,), strides=(2,), padding=1, name="ctx_conv_1")
        self.ctx_attn = [
            AttentionBlock(2 * MC, H, relative_pos_embeddings=True, name=f"ctx_attn_{i}")
            for i in range(5)
        ]
        # latent conditioner (timestep_independent)
        self.lat_conv = nn.Conv(MC, (3,), padding=1, name="lat_conv")
        self.lat_attn = [
            AttentionBlock(MC, H, relative_pos_embeddings=True, name=f"lat_attn_{i}")
            for i in range(4)
        ]
        self.code_norm = _gn(MC, "code_norm")

    def __call__(
        self,
        x: jnp.ndarray,  # [B, T, in_channels] noisy mel
        timesteps: jnp.ndarray,  # [B]
        precomputed_embeddings: Optional[jnp.ndarray] = None,  # [B, T, C]
        conditioning_free: bool = False,
    ) -> jnp.ndarray:
        MC = self.model_channels
        B, T, _ = x.shape
        if conditioning_free:
            code_emb = jnp.broadcast_to(self.unconditioned_embedding, (B, T, MC))
        else:
            assert precomputed_embeddings is not None
            code_emb = precomputed_embeddings

        t_emb = self.time_embed_2(nn.silu(self.time_embed_0(timestep_embedding(timesteps, MC))))
        for lyr in self.cti:
            code_emb = lyr(code_emb, t_emb)

        h = self.inp_block(x)
        h = self.integrating_conv(jnp.concatenate([h, code_emb], axis=-1))
        for lyr in self.layers:
            h = lyr(h, t_emb)
        for lyr in self.posts:
            h = lyr(h, t_emb)
        return self.out_conv(nn.silu(self.out_norm(h)))

    # -- conditioning-side (timestep-independent) ------------------------
    def get_conditioning(self, conditioning_input: jnp.ndarray) -> jnp.ndarray:
        """Reference ``get_conditioning``: mel clips [B, T, in_channels] →
        [B, 2*MC] latent (mean over time of the contextual embedder)."""
        h = self.ctx_conv_1(self.ctx_conv_0(conditioning_input))
        for blk in self.ctx_attn:
            h = blk(h)
        return jnp.mean(h, axis=1)

    def timestep_independent(
        self,
        latents: jnp.ndarray,  # [B, S, in_latent_channels] AR latents
        conditioning_latent: jnp.ndarray,  # [B, 2*MC]
        expected_seq_len: int,
    ) -> jnp.ndarray:
        """Latent-conditioning path of the reference
        ``timestep_independent`` (Tortoise inference always feeds AR
        latents, not codes)."""
        h = self.lat_conv(latents)
        for blk in self.lat_attn:
            h = blk(h)
        cond_scale, cond_shift = jnp.split(conditioning_latent, 2, axis=-1)
        h = self.code_norm(h) * (1 + cond_scale[:, None]) + cond_shift[:, None]
        # nearest-neighbour interpolation to the output frame count
        S = h.shape[1]
        idx = jnp.clip((jnp.arange(expected_seq_len) * S) // expected_seq_len, 0, S - 1)
        return h[:, idx]

    def init_all(self, x, timesteps, latents, cond_input):
        """Init trace covering all three param groups."""
        cond = self.get_conditioning(cond_input)
        emb = self.timestep_independent(latents, cond, x.shape[1])
        return self(x, timesteps, precomputed_embeddings=emb)


# ----------------------------------------------------------------------
# CLVP — contrastive text/speech reranker (reference clvp.py:20 with
# use_xformers=True: rotary pos emb, RMSNorm pre-norm, GLU feed-forward)
# ----------------------------------------------------------------------


class _RMSNorm(nn.Module):
    dim: int
    eps: float = 1e-8

    @nn.compact
    def __call__(self, x):
        g = self.param("g", nn.initializers.ones, (self.dim,))
        norm = jnp.linalg.norm(x, axis=-1, keepdims=True) * self.dim**-0.5
        return x / jnp.maximum(norm, self.eps) * g


def _rotary_table(T: int, rot_dim: int) -> np.ndarray:
    inv = 1.0 / (10000 ** (np.arange(0, rot_dim, 2) / rot_dim))
    freqs = np.outer(np.arange(T), inv)
    return np.concatenate([freqs, freqs], axis=-1)  # [T, rot_dim]


def _apply_rotary(t: jnp.ndarray, freqs: jnp.ndarray) -> jnp.ndarray:
    """xtransformers rotary: first rot_dim dims rotated (q, k AND v)."""
    rot = freqs.shape[-1]
    tl, tr = t[..., :rot], t[..., rot:]
    half = rot // 2
    x1, x2 = tl[..., :half], tl[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    tl = tl * jnp.cos(freqs) + rotated * jnp.sin(freqs)
    return jnp.concatenate([tl, tr], axis=-1)


class _XAttention(nn.Module):
    dim: int
    heads: int
    dim_head: int = 64

    @nn.compact
    def __call__(self, x, rot_freqs):
        B, T, _ = x.shape
        H, dh = self.heads, self.dim_head
        q = nn.Dense(H * dh, use_bias=False, name="to_q")(x).reshape(B, T, H, dh)
        k = nn.Dense(H * dh, use_bias=False, name="to_k")(x).reshape(B, T, H, dh)
        v = nn.Dense(H * dh, use_bias=False, name="to_v")(x).reshape(B, T, H, dh)
        q, k, v = (jnp.swapaxes(t, 1, 2) for t in (q, k, v))  # [B, H, T, dh]
        q, k, v = (_apply_rotary(t, rot_freqs) for t in (q, k, v))
        dots = jnp.einsum("bhid,bhjd->bhij", q, k) * dh**-0.5
        probs = jax.nn.softmax(dots, axis=-1)
        out = jnp.einsum("bhij,bhjd->bhid", probs, v)
        out = jnp.swapaxes(out, 1, 2).reshape(B, T, H * dh)
        return nn.Dense(self.dim, name="to_out")(out)


class _XFeedForwardGLU(nn.Module):
    dim: int
    mult: int = 2

    @nn.compact
    def __call__(self, x):
        inner = int(self.dim * self.mult)
        h = nn.Dense(2 * inner, name="proj")(x)
        a, gate = jnp.split(h, 2, axis=-1)
        return nn.Dense(self.dim, name="out")(a * nn.gelu(gate, approximate=False))


class _XEncoder(nn.Module):
    """xtransformers ``Encoder(use_rmsnorm, ff_glu, rotary_pos_emb)`` +
    the ContinuousTransformerWrapper's final LayerNorm."""

    dim: int
    depth: int
    heads: int
    ff_mult: int = 2
    rotary_dim: int = 32

    @nn.compact
    def __call__(self, x):
        T = x.shape[1]
        rot = jnp.asarray(_rotary_table(T, self.rotary_dim), x.dtype)
        for i in range(self.depth):
            h = _RMSNorm(self.dim, name=f"attn_norm_{i}")(x)
            x = x + _XAttention(self.dim, self.heads, name=f"attn_{i}")(h, rot)
            h = _RMSNorm(self.dim, name=f"ff_norm_{i}")(x)
            x = x + _XFeedForwardGLU(self.dim, self.ff_mult, name=f"ff_{i}")(h)
        return nn.LayerNorm(epsilon=1e-5, name="final_norm")(x)


class CLVP(nn.Module):
    """Contrastive text↔speech scorer used to rerank AR candidates
    (reference ``clvp.py:20``; Tortoise config: 768 dim, depth 20)."""

    dim_text: int = 768
    dim_speech: int = 768
    dim_latent: int = 768
    num_text_tokens: int = 256
    text_enc_depth: int = 20
    text_heads: int = 12
    num_speech_tokens: int = 8192
    speech_enc_depth: int = 20
    speech_heads: int = 12

    def setup(self):
        self.text_emb = nn.Embed(self.num_text_tokens, self.dim_text, name="text_emb")
        self.speech_emb = nn.Embed(self.num_speech_tokens, self.dim_speech, name="speech_emb")
        self.to_text_latent = nn.Dense(self.dim_latent, use_bias=False, name="to_text_latent")
        self.to_speech_latent = nn.Dense(self.dim_latent, use_bias=False, name="to_speech_latent")
        self.text_transformer = _XEncoder(
            self.dim_text, self.text_enc_depth, self.text_heads, name="text_transformer"
        )
        self.speech_transformer = _XEncoder(
            self.dim_speech, self.speech_enc_depth, self.speech_heads, name="speech_transformer"
        )
        self.temperature = self.param("temperature", nn.initializers.ones, ())

    def __call__(self, text: jnp.ndarray, speech_tokens: jnp.ndarray) -> jnp.ndarray:
        """Similarity score per row (reference ``forward(return_loss=False)``,
        full masks — inference path)."""
        t = self.text_transformer(self.text_emb(text)).mean(axis=1)
        s = self.speech_transformer(self.speech_emb(speech_tokens)).mean(axis=1)
        t = self.to_text_latent(t)
        s = self.to_speech_latent(s)
        t = t / jnp.linalg.norm(t, axis=-1, keepdims=True)
        s = s / jnp.linalg.norm(s, axis=-1, keepdims=True)
        return jnp.sum(t * s, axis=-1) * jnp.exp(self.temperature)
