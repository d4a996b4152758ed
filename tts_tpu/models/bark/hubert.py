"""Bark voice cloning front-end: HuBERT features → semantic tokens
(reference ``TTS/tts/layers/bark/hubert/{kmeans_hubert,tokenizer}.py``).

The reference wraps HF ``HubertModel("facebook/hubert-base-ls960")`` and a
small LSTM ``HubertTokenizer`` that maps layer-9 features to Bark semantic
token ids.  Here HuBERT runs as the flax :class:`~tts_tpu.vc.modules.wavlm.WavLM`
module (HuBERT-base is architecturally WavLM without the gated relative
position bias: same conv extractor, feature projection, conv positional
embedding, post-LN transformer), with a converter from the HF state dict;
the tokenizer is a 2-layer LSTM + linear head.

Both need pretrained torch checkpoints (zero-egress: converted on first
use when present); converters are parity-tested against locally-built HF
modules.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tts_tpu.vc.modules.wavlm import WavLM, WavLMConfig

__all__ = [
    "hubert_base_config",
    "HubertTokenizer",
    "convert_hf_hubert",
    "convert_hubert_tokenizer",
    "semantic_tokens_from_audio",
]


def hubert_base_config() -> WavLMConfig:
    """facebook/hubert-base-ls960 dims as a WavLM config (no rel-pos)."""
    return WavLMConfig(
        extractor_mode="default",
        encoder_layers=12,
        encoder_embed_dim=768,
        encoder_ffn_embed_dim=3072,
        encoder_attention_heads=12,
        layer_norm_first=False,
        conv_bias=False,
        relative_position_embedding=False,
        gru_rel_pos=False,
    )


class HubertTokenizer(nn.Module):
    """HuBERT features [B, T, input_size] → semantic-token logits
    (reference ``tokenizer.py:16``; version 0 = LSTM×2 + FC)."""

    hidden_size: int = 1024
    input_size: int = 768
    output_size: int = 10000
    version: int = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.RNN(nn.OptimizedLSTMCell(self.hidden_size, name="lstm0"))(x)
        h = nn.RNN(nn.OptimizedLSTMCell(self.hidden_size, name="lstm1"))(h)
        if self.version == 1:
            h = nn.Dense(4096, name="intermediate")(h)
        return nn.Dense(self.output_size, name="fc")(h)  # logits

    def get_token(self, x: jnp.ndarray) -> jnp.ndarray:
        return jnp.argmax(self(x), axis=-1)


# ----------------------------------------------------------------------
# converters (HF HubertModel / reference HubertTokenizer state dicts)
# ----------------------------------------------------------------------

def convert_hf_hubert(state: dict) -> dict:
    """HF ``HubertModel`` state dict → flax WavLM params (hubert layout)."""
    from tts_tpu.utils.convert import conv1d_kernel, linear_kernel

    s = {k: np.asarray(v) for k, v in state.items()}
    p: dict = {}

    fe = {}
    i = 0
    while f"feature_extractor.conv_layers.{i}.conv.weight" in s:
        fe[f"conv_{i}"] = {
            "kernel": conv1d_kernel(s[f"feature_extractor.conv_layers.{i}.conv.weight"])
        }
        if f"feature_extractor.conv_layers.{i}.conv.bias" in s:
            fe[f"conv_{i}"]["bias"] = s[f"feature_extractor.conv_layers.{i}.conv.bias"]
        i += 1
    fe["gn_0"] = {
        "scale": s["feature_extractor.conv_layers.0.layer_norm.weight"],
        "bias": s["feature_extractor.conv_layers.0.layer_norm.bias"],
    }
    p["feature_extractor"] = fe

    p["layer_norm"] = {
        "scale": s["feature_projection.layer_norm.weight"],
        "bias": s["feature_projection.layer_norm.bias"],
    }
    p["post_extract_proj"] = {
        "kernel": linear_kernel(s["feature_projection.projection.weight"]),
        "bias": s["feature_projection.projection.bias"],
    }

    # weight-norm parametrized positional conv: fold g·v/|v|
    base = "encoder.pos_conv_embed.conv"
    if f"{base}.weight_g" in s:
        g, v = s[f"{base}.weight_g"], s[f"{base}.weight_v"]
    else:  # torch >= 2.1 parametrize layout
        g = s[f"{base}.parametrizations.weight.original0"]
        v = s[f"{base}.parametrizations.weight.original1"]
    norm = np.sqrt((v**2).sum(axis=(0, 1), keepdims=True))
    w = g * v / np.maximum(norm, 1e-12)  # torch [O, I/g, K]
    p["pos_conv"] = {"kernel": conv1d_kernel(w), "bias": s[f"{base}.bias"]}

    p["encoder_layer_norm"] = {
        "scale": s["encoder.layer_norm.weight"],
        "bias": s["encoder.layer_norm.bias"],
    }

    n = 0
    while f"encoder.layers.{n}.attention.q_proj.weight" in s:
        b = f"encoder.layers.{n}."
        attn = {}
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            attn[proj] = {
                "kernel": linear_kernel(s[f"{b}attention.{proj}.weight"]),
                "bias": s[f"{b}attention.{proj}.bias"],
            }
        p[f"layer_{n}"] = {
            "self_attn": attn,
            "self_attn_layer_norm": {
                "scale": s[f"{b}layer_norm.weight"], "bias": s[f"{b}layer_norm.bias"]
            },
            "fc1": {
                "kernel": linear_kernel(s[f"{b}feed_forward.intermediate_dense.weight"]),
                "bias": s[f"{b}feed_forward.intermediate_dense.bias"],
            },
            "fc2": {
                "kernel": linear_kernel(s[f"{b}feed_forward.output_dense.weight"]),
                "bias": s[f"{b}feed_forward.output_dense.bias"],
            },
            "final_layer_norm": {
                "scale": s[f"{b}final_layer_norm.weight"],
                "bias": s[f"{b}final_layer_norm.bias"],
            },
        }
        n += 1
    return {"params": p}


def convert_hubert_tokenizer(state: dict) -> dict:
    """Reference ``HubertTokenizer`` state dict → flax params."""
    from tts_tpu.utils.convert import _lstm_cell, linear_kernel

    s = {k: np.asarray(v) for k, v in state.items()}
    p = {
        "lstm0": _lstm_cell(s, "lstm", "_l0"),
        "lstm1": _lstm_cell(s, "lstm", "_l1"),
        "fc": {"kernel": linear_kernel(s["fc.weight"]), "bias": s["fc.bias"]},
    }
    if "intermediate.weight" in s:
        p["intermediate"] = {
            "kernel": linear_kernel(s["intermediate.weight"]),
            "bias": s["intermediate.bias"],
        }
    return {"params": p}


# ----------------------------------------------------------------------
def semantic_tokens_from_audio(
    wav: np.ndarray,
    hubert_params,
    tokenizer_params,
    output_layer: int = 9,
    tokenizer_kwargs: Optional[dict] = None,
) -> np.ndarray:
    """wav [T] @16 kHz → Bark semantic tokens [T'] (reference
    ``inference_funcs.py generate_voice``: CustomHubert layer-9 features →
    HubertTokenizer argmax)."""
    model = WavLM(hubert_base_config())
    feats = model.apply(hubert_params, jnp.asarray(wav)[None], output_layer=output_layer)
    if tokenizer_kwargs is None:
        # infer dims from the converted params (checkpoints vary)
        tp = tokenizer_params["params"]
        tokenizer_kwargs = {
            "input_size": tp["lstm0"]["ii"]["kernel"].shape[0],
            "hidden_size": tp["lstm0"]["ii"]["kernel"].shape[1],
            "output_size": tp["fc"]["kernel"].shape[1],
            "version": 1 if "intermediate" in tp else 0,
        }
    tok = HubertTokenizer(**tokenizer_kwargs)
    logits = tok.apply(tokenizer_params, feats)
    return np.asarray(jnp.argmax(logits, axis=-1)[0])
