"""WavLM content encoder in flax — the FreeVC SSL front-end
(reference vendored torch code ``TTS/vc/modules/freevc/wavlm/{wavlm,modules}.py``,
itself from microsoft/unilm).

Inference-only port (FreeVC never trains or masks WavLM): conv feature
extractor → post-projection → transformer encoder with convolutional
positional embeddings and WavLM's **gated relative position bias**
(T5-style bucketed bias owned by layer 0, shared down the stack, gated per
layer by a sigmoid read-out of the queries — ``modules.py:490-500``).

TPU notes: the whole stack is jittable with static shapes; the bucketed
relative-position matrix is computed with vectorized ``jnp`` ops instead of
the reference's per-call torch tensor building, and XLA folds it to a
constant per sequence length.  GELUs are exact (``approximate=False``) to
match torch.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["WavLMConfig", "WavLM", "load_wavlm", "wavlm_large_config"]

# (dim, kernel, stride) conv stack shared by all WavLM sizes
_CONV_LAYERS = ((512, 10, 5),) + ((512, 3, 2),) * 4 + ((512, 2, 2),) * 2


@dataclass
class WavLMConfig:
    """Subset of the reference ``WavLMConfig`` that matters at inference."""

    extractor_mode: str = "default"  # "default" (group-norm 1st) | "layer_norm"
    encoder_layers: int = 12
    encoder_embed_dim: int = 768
    encoder_ffn_embed_dim: int = 3072
    encoder_attention_heads: int = 12
    layer_norm_first: bool = False
    conv_feature_layers: Tuple[Tuple[int, int, int], ...] = _CONV_LAYERS
    conv_bias: bool = False
    conv_pos: int = 128
    conv_pos_groups: int = 16
    relative_position_embedding: bool = False
    num_buckets: int = 320
    max_distance: int = 1280
    gru_rel_pos: bool = False
    normalize: bool = False

    @classmethod
    def from_checkpoint_cfg(cls, cfg: dict) -> "WavLMConfig":
        layers = cfg.get("conv_feature_layers", None)
        if isinstance(layers, str):
            layers = eval(layers)  # noqa: S307 - reference checkpoint format
        keep = {f.name for f in __import__("dataclasses").fields(cls)}
        kwargs = {k: v for k, v in cfg.items() if k in keep}
        if layers is not None:
            kwargs["conv_feature_layers"] = tuple(tuple(t) for t in layers)
        return cls(**kwargs)


def wavlm_large_config() -> WavLMConfig:
    """WavLM-Large (the checkpoint FreeVC ships with)."""
    return WavLMConfig(
        extractor_mode="layer_norm",
        encoder_layers=24,
        encoder_embed_dim=1024,
        encoder_ffn_embed_dim=4096,
        encoder_attention_heads=16,
        layer_norm_first=True,
        conv_bias=False,
        relative_position_embedding=True,
        num_buckets=320,
        max_distance=800,
        gru_rel_pos=True,
        normalize=True,
    )


# ----------------------------------------------------------------------
def _gelu(x):
    return nn.gelu(x, approximate=False)


def _LN(name: str) -> nn.LayerNorm:
    return nn.LayerNorm(epsilon=1e-5, name=name)  # torch eps


class _ConvFeatureExtractor(nn.Module):
    """Strided conv stack: wav [B, T] → frames [B, T', 512]
    (reference ``ConvFeatureExtractionModel``, 320× downsample)."""

    cfg: WavLMConfig

    @nn.compact
    def __call__(self, wav: jnp.ndarray) -> jnp.ndarray:
        h = wav[:, :, None]
        for i, (dim, k, stride) in enumerate(self.cfg.conv_feature_layers):
            h = nn.Conv(
                dim, (k,), strides=(stride,), padding="VALID",
                use_bias=self.cfg.conv_bias, name=f"conv_{i}",
            )(h)
            if self.cfg.extractor_mode == "layer_norm":
                h = _LN(f"ln_{i}")(h)
            elif i == 0:  # "default": per-channel group norm on the first block
                h = nn.GroupNorm(num_groups=dim, epsilon=1e-5, name="gn_0")(h)
            h = _gelu(h)
        return h


def _relative_position_buckets(T: int, num_buckets: int, max_distance: int) -> np.ndarray:
    """Bidirectional T5 bucket ids [T, T] (reference
    ``_relative_positions_bucket``, ``modules.py:387``).  Host/NumPy — the
    result is a compile-time constant for a static T."""
    ctx = np.arange(T)[:, None]
    mem = np.arange(T)[None, :]
    rel = mem - ctx
    nb = num_buckets // 2
    buckets = (rel > 0).astype(np.int64) * nb
    rel = np.abs(rel)
    max_exact = nb // 2
    is_small = rel < max_exact
    large = max_exact + (
        np.log(np.maximum(rel, 1) / max_exact) / math.log(max_distance / max_exact) * (nb - max_exact)
    ).astype(np.int64)
    large = np.minimum(large, nb - 1)
    return buckets + np.where(is_small, rel, large)


class _SelfAttention(nn.Module):
    """WavLM multi-head self-attention with gated relative position bias."""

    dim: int
    heads: int
    has_relative_attention_bias: bool = False
    num_buckets: int = 320
    max_distance: int = 1280
    gru_rel_pos: bool = False

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, pos_bias: Optional[jnp.ndarray] = None
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        B, T, D = x.shape
        H = self.heads
        dh = D // H

        if self.has_relative_attention_bias and pos_bias is None:
            table = self.param(
                "relative_attention_bias",
                nn.initializers.normal(0.02),
                (self.num_buckets, H),
            )
            buckets = jnp.asarray(
                _relative_position_buckets(T, self.num_buckets, self.max_distance)
            )
            pos_bias = jnp.transpose(table[buckets], (2, 0, 1))  # [H, T, T]

        q = nn.Dense(D, name="q_proj")(x).reshape(B, T, H, dh)
        k = nn.Dense(D, name="k_proj")(x).reshape(B, T, H, dh)
        v = nn.Dense(D, name="v_proj")(x).reshape(B, T, H, dh)

        bias = None
        if pos_bias is not None:
            bias = pos_bias[None]  # [1, H, T, T]
            if self.gru_rel_pos:
                # gate = sigmoid(sum4(grep(q))) pairs (a, b); per (B, H, T)
                ql = jnp.swapaxes(q, 1, 2)  # [B, H, T, dh]
                gates = nn.Dense(8, name="grep_linear")(ql).reshape(B, H, T, 2, 4).sum(-1)
                gate_a, gate_b = jnp.split(jax.nn.sigmoid(gates), 2, axis=-1)
                grep_a = self.param("grep_a", nn.initializers.ones, (1, H, 1, 1))
                gate = gate_a * (gate_b * grep_a - 1.0) + 2.0  # [B, H, T, 1]
                bias = gate * pos_bias[None]

        scores = jnp.einsum("bthd,bshd->bhts", q, k) / math.sqrt(dh)
        if bias is not None:
            scores = scores + bias
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhts,bshd->bthd", probs, v).reshape(B, T, D)
        return nn.Dense(D, name="out_proj")(out), pos_bias


class _EncoderLayer(nn.Module):
    cfg: WavLMConfig
    has_relative_attention_bias: bool = False

    @nn.compact
    def __call__(self, x, pos_bias):
        c = self.cfg
        attn = _SelfAttention(
            dim=c.encoder_embed_dim,
            heads=c.encoder_attention_heads,
            has_relative_attention_bias=self.has_relative_attention_bias,
            num_buckets=c.num_buckets,
            max_distance=c.max_distance,
            gru_rel_pos=c.gru_rel_pos,
            name="self_attn",
        )
        if c.layer_norm_first:
            h, pos_bias = attn(_LN("self_attn_layer_norm")(x), pos_bias)
            x = x + h
            r = x
            h = _gelu(nn.Dense(c.encoder_ffn_embed_dim, name="fc1")(_LN("final_layer_norm")(x)))
            x = r + nn.Dense(c.encoder_embed_dim, name="fc2")(h)
        else:
            h, pos_bias = attn(x, pos_bias)
            x = _LN("self_attn_layer_norm")(x + h)
            r = x
            h = _gelu(nn.Dense(c.encoder_ffn_embed_dim, name="fc1")(x))
            x = _LN("final_layer_norm")(r + nn.Dense(c.encoder_embed_dim, name="fc2")(h))
        return x, pos_bias


class WavLM(nn.Module):
    """wav [B, T] @16 kHz → content features [B, T', encoder_embed_dim]."""

    cfg: WavLMConfig

    @nn.compact
    def __call__(self, wav: jnp.ndarray, output_layer: Optional[int] = None) -> jnp.ndarray:
        c = self.cfg
        feats = _ConvFeatureExtractor(c, name="feature_extractor")(wav)  # [B, T', 512]
        feats = _LN("layer_norm")(feats)
        if feats.shape[-1] != c.encoder_embed_dim:
            feats = nn.Dense(c.encoder_embed_dim, name="post_extract_proj")(feats)

        # convolutional positional embedding (weight-norm folded by the
        # converter); even kernel → SamePad trims the trailing frame
        pos = nn.Conv(
            c.encoder_embed_dim,
            (c.conv_pos,),
            padding=c.conv_pos // 2,
            feature_group_count=c.conv_pos_groups,
            name="pos_conv",
        )(feats)
        if c.conv_pos % 2 == 0:
            pos = pos[:, :-1]
        x = feats + _gelu(pos)
        if not c.layer_norm_first:
            x = _LN("encoder_layer_norm")(x)

        pos_bias = None
        n_layers = c.encoder_layers if output_layer is None else output_layer
        for i in range(c.encoder_layers):
            if i >= n_layers:
                break
            x, pos_bias = _EncoderLayer(
                c,
                has_relative_attention_bias=(c.relative_position_embedding and i == 0),
                name=f"layer_{i}",
            )(x, pos_bias)
        if c.layer_norm_first and output_layer is None:
            x = _LN("encoder_layer_norm")(x)
        return x


# ----------------------------------------------------------------------
def load_wavlm(checkpoint_path: Optional[str] = None):
    """Returns ``extract(wav [B,T]) -> features [B,T',D]`` (jitted).

    ``checkpoint_path``: a converted flax ``.msgpack`` (or a torch
    ``WavLM-Large.pt``, converted on first use via
    ``tts_tpu.utils.convert.convert_wavlm``).  Defaults to
    ``$TTS_HOME/wavlm/WavLM-Large`` like the reference downloader
    (``wavlm/__init__.py:12``; no download here — zero-egress)."""
    import os

    if checkpoint_path is None:
        home = os.environ.get(
            "TTS_HOME", os.path.join(os.path.expanduser("~"), ".local", "share", "tts")
        )
        base = os.path.join(home, "wavlm", "WavLM-Large")
        checkpoint_path = base + ".msgpack" if os.path.exists(base + ".msgpack") else base + ".pt"

    if checkpoint_path.endswith(".pt"):
        from tts_tpu.utils.convert import convert_wavlm

        cfg, params = convert_wavlm(checkpoint_path)
        out = checkpoint_path[:-3] + ".msgpack"
        import json

        from tts_tpu.utils.io import save_checkpoint

        # JSON round-trip turns nested tuples into msgpack-safe lists
        save_checkpoint(out, params, config=json.loads(json.dumps(cfg.__dict__)))
    else:
        from tts_tpu.utils.io import load_checkpoint

        params, cfg_dict, _ = load_checkpoint(checkpoint_path)
        cfg = WavLMConfig.from_checkpoint_cfg(cfg_dict)

    model = WavLM(cfg)
    fn = jax.jit(lambda w: model.apply(params, w))
    return fn
