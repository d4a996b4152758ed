"""Torch → flax checkpoint conversion.

"Checkpoint compat is a feature" (SURVEY §7): zoo checkpoints trained with
the reference run on TPU after a one-time conversion.  Generic tensor
rules here; per-architecture name maps in ``convert_<arch>`` functions.

Rules:
  * Conv1d        ``[out, in, k]``  → ``[k, in, out]``
  * ConvTranspose ``[in, out, k]``  → flip(k) → ``[k, in, out]``
  * Conv2d        ``[out, in, kh, kw]`` → ``[kh, kw, in, out]``
  * Linear        ``[out, in]``     → ``[in, out]``
  * weight-norm   ``weight_g * weight_v / ||weight_v||`` folded first
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

__all__ = [
    "load_torch_checkpoint",
    "fold_weight_norm",
    "conv1d_kernel",
    "convtranspose1d_kernel",
    "linear_kernel",
    "convert_hifigan_generator",
]


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint's state dict as numpy (restricted unpickler
    via ``weights_only=True``; replaces reference ``utils/io.py`` RenamingUnpickler)."""
    import torch

    from tts_tpu.utils.io import _is_remote, _open

    if _is_remote(path):
        with _open(path, "rb", cache=True) as f:
            state = torch.load(f, map_location="cpu", weights_only=True)
    else:
        state = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(state, dict) and "model" in state:
        state = state["model"]

    def _to_np(v):
        if hasattr(v, "numpy"):
            return v.numpy()
        if isinstance(v, dict):  # nested sub-state (e.g. tortoise vocoder "model_g")
            return {k: _to_np(x) for k, x in v.items()}
        return np.asarray(v)

    if not isinstance(state, dict):  # bare tensor file (e.g. mel_norms.pth)
        return _to_np(state)
    return {k: _to_np(v) for k, v in state.items()}


def fold_weight_norm(state: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Fold ``weight_g``/``weight_v`` (old API) or
    ``parametrizations.weight.original{0,1}`` (new API) into plain weights."""
    out: Dict[str, np.ndarray] = {}
    handled = set()
    for key in list(state.keys()):
        if key.endswith("weight_v"):
            base = key[: -len("weight_v")]
            g, v = state[base + "weight_g"], state[base + "weight_v"]
            norm = np.sqrt((v**2).sum(axis=tuple(range(1, v.ndim)), keepdims=True))
            out[base + "weight"] = g * v / np.maximum(norm, 1e-12)
            handled |= {base + "weight_g", base + "weight_v"}
        elif key.endswith("parametrizations.weight.original1"):
            base = key[: -len("parametrizations.weight.original1")]
            g = state[base + "parametrizations.weight.original0"]
            v = state[key]
            norm = np.sqrt((v**2).sum(axis=tuple(range(1, v.ndim)), keepdims=True))
            out[base.rstrip(".") + ".weight"] = g * v / np.maximum(norm, 1e-12)
            handled |= {
                base + "parametrizations.weight.original0",
                base + "parametrizations.weight.original1",
            }
    for k, v in state.items():
        if k not in handled and k not in out:
            out[k] = v
    return out


def conv1d_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 1, 0))


def convtranspose1d_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w[:, :, ::-1], (2, 0, 1))


def conv2d_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def linear_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w)


def convert_hifigan_generator(state: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Reference ``HifiganGenerator`` state dict → flax params for
    ``tts_tpu.vocoder.models.hifigan_generator.HifiganGenerator``."""
    state = fold_weight_norm(state)
    params: Dict[str, Any] = {}

    def put(path: str, leaf: Dict[str, np.ndarray]):
        node = params
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = leaf

    # conv_pre / conv_post (wrapped Conv1d -> child "Conv_0")
    put("conv_pre/Conv_0", {"kernel": conv1d_kernel(state["conv_pre.weight"]),
                            "bias": state["conv_pre.bias"]})
    post = {"kernel": conv1d_kernel(state["conv_post.weight"])}
    if "conv_post.bias" in state:
        post["bias"] = state["conv_post.bias"]
    put("conv_post/Conv_0", post)
    if "cond_layer.weight" in state:
        put("cond_layer", {
            "kernel": linear_kernel(state["cond_layer.weight"][:, :, 0]),
            "bias": state["cond_layer.bias"],
        })

    n_ups = len([k for k in state if k.startswith("ups.") and k.endswith(".weight")])
    for i in range(n_ups):
        put(f"ups_{i}", {
            "kernel": convtranspose1d_kernel(state[f"ups.{i}.weight"]),
            "bias": state[f"ups.{i}.bias"],
        })
        # per-upsample cond convs: "conds.{i}" in the XTTS decoder variant
        # (xtts/hifigan_decoder.py:261), "cond_in_each_up_layer.{i}" elsewhere
        for cname in (f"conds.{i}", f"cond_in_each_up_layer.{i}"):
            if f"{cname}.weight" in state:
                put(f"cond_up_{i}", {
                    "kernel": linear_kernel(state[f"{cname}.weight"][:, :, 0]),
                    "bias": state[f"{cname}.bias"],
                })
                break

    n_res = len({k.split(".")[1] for k in state if k.startswith("resblocks.")})
    for r in range(n_res):
        for conv_group in ("convs1", "convs2", "convs"):
            n_convs = len(
                {k.split(".")[3] for k in state if k.startswith(f"resblocks.{r}.{conv_group}.")}
            )
            for c in range(n_convs):
                w = state.get(f"resblocks.{r}.{conv_group}.{c}.weight")
                if w is None:
                    continue
                b = state[f"resblocks.{r}.{conv_group}.{c}.bias"]
                put(
                    f"resblocks_{r}/{conv_group}_{c}/Conv_0",
                    {"kernel": conv1d_kernel(w), "bias": b},
                )
    return {"params": params}


# ---------------------------------------------------------------------------
# VITS converters
# ---------------------------------------------------------------------------


def _dense(state, key):
    """torch 1x1 Conv1d or Linear → flax Dense leaf."""
    w = state[f"{key}.weight"]
    if w.ndim == 3:  # [out, in, 1] conv1x1
        w = w[:, :, 0]
    leaf = {"kernel": linear_kernel(w)}
    if f"{key}.bias" in state:
        leaf["bias"] = state[f"{key}.bias"]
    return leaf


def _conv(state, key):
    """torch Conv1d → wrapped Conv1d (child "Conv_0")."""
    leaf = {"kernel": conv1d_kernel(state[f"{key}.weight"])}
    if f"{key}.bias" in state:
        leaf["bias"] = state[f"{key}.bias"]
    return {"Conv_0": leaf}


def _plain_conv(state, key):
    """torch Conv1d → bare nn.Conv leaf (no wrapper)."""
    leaf = {"kernel": conv1d_kernel(state[f"{key}.weight"])}
    if f"{key}.bias" in state:
        leaf["bias"] = state[f"{key}.bias"]
    return leaf


def _layernorm(state, key):
    """glow_tts LayerNorm (gamma/beta) or LayerNorm2 (weight/bias) → flax."""
    if f"{key}.gamma" in state:
        scale, bias = state[f"{key}.gamma"], state[f"{key}.beta"]
    else:
        scale, bias = state[f"{key}.weight"], state[f"{key}.bias"]
    return {"scale": scale.reshape(-1), "bias": bias.reshape(-1)}


def convert_rel_pos_transformer(state, prefix, num_layers):
    """Reference ``glow_tts/transformer.py`` RelativePositionTransformer →
    ``tts_tpu.layers.transformer.RelativePositionTransformer`` params."""
    p = {}
    for i in range(num_layers):
        attn = {
            "conv_q": _dense(state, f"{prefix}attn_layers.{i}.conv_q"),
            "conv_k": _dense(state, f"{prefix}attn_layers.{i}.conv_k"),
            "conv_v": _dense(state, f"{prefix}attn_layers.{i}.conv_v"),
            "conv_o": _dense(state, f"{prefix}attn_layers.{i}.conv_o"),
        }
        if f"{prefix}attn_layers.{i}.emb_rel_k" in state:
            attn["emb_rel_k"] = state[f"{prefix}attn_layers.{i}.emb_rel_k"]
            attn["emb_rel_v"] = state[f"{prefix}attn_layers.{i}.emb_rel_v"]
        p[f"attn_{i}"] = attn
        p[f"norm1_{i}"] = {"LayerNorm_0": _layernorm(state, f"{prefix}norm_layers_1.{i}")}
        p[f"ffn_{i}"] = {
            "conv_1": _conv(state, f"{prefix}ffn_layers.{i}.conv_1"),
            "conv_2": _conv(state, f"{prefix}ffn_layers.{i}.conv_2"),
        }
        p[f"norm2_{i}"] = {"LayerNorm_0": _layernorm(state, f"{prefix}norm_layers_2.{i}")}
    return p


def convert_wn(state, prefix, num_layers, has_cond=False):
    """Reference ``generic/wavenet.py`` WN → ``tts_tpu.layers.wavenet.WN``."""
    state = fold_weight_norm(state)
    p = {}
    for i in range(num_layers):
        p[f"in_layer_{i}"] = _conv(state, f"{prefix}in_layers.{i}")
        p[f"res_skip_layer_{i}"] = _dense(state, f"{prefix}res_skip_layers.{i}")
    if has_cond and f"{prefix}cond_layer.weight" in state:
        p["cond_layer"] = _dense(state, f"{prefix}cond_layer")
    return p


def convert_vits_text_encoder(state, num_layers=6):
    """Reference ``vits/networks.py`` TextEncoder →
    ``tts_tpu.models.vits.modules.TextEncoder``."""
    p = {
        "emb": {"embedding": state["emb.weight"]},
        "encoder": convert_rel_pos_transformer(state, "encoder.", num_layers),
        "proj": _dense(state, "proj"),
    }
    return {"params": p}


def convert_vits_posterior(state, num_layers=16, has_cond=False):
    """Reference PosteriorEncoder → ``tts_tpu`` PosteriorEncoder."""
    return {
        "params": {
            "pre": _dense(state, "pre"),
            "enc": convert_wn(state, "enc.", num_layers, has_cond),
            "proj": _dense(state, "proj"),
        }
    }


def convert_vits_flow(state, num_flows=4, num_layers=4, has_cond=False):
    """Reference ResidualCouplingBlocks → ``tts_tpu`` ResidualCouplingBlocks."""
    p = {}
    for i in range(num_flows):
        p[f"flow_{i}"] = {
            "pre": _dense(state, f"flows.{i}.pre"),
            "enc": convert_wn(state, f"flows.{i}.enc.", num_layers, has_cond),
            "post": _dense(state, f"flows.{i}.post"),
        }
    return {"params": p}


def _convert_dds(state, prefix, num_layers=3):
    """DilatedDepthSeparableConv (reference ``stochastic_duration_predictor.py:9``)."""
    p = {}
    for i in range(num_layers):
        p[f"conv_sep_{i}"] = _plain_conv(state, f"{prefix}convs_sep.{i}")
        p[f"conv_1x1_{i}"] = _dense(state, f"{prefix}convs_1x1.{i}")
        p[f"norm1_{i}"] = {"LayerNorm_0": _layernorm(state, f"{prefix}norms_1.{i}")}
        p[f"norm2_{i}"] = {"LayerNorm_0": _layernorm(state, f"{prefix}norms_2.{i}")}
    return p


def _convert_conv_flow(state, prefix):
    return {
        "pre": _dense(state, f"{prefix}pre"),
        "convs": _convert_dds(state, f"{prefix}convs."),
        "proj": _dense(state, f"{prefix}proj"),
    }


def _convert_affine_flow(state, prefix):
    return {
        "translation": state[f"{prefix}translation"].reshape(-1),
        "log_scale": state[f"{prefix}log_scale"].reshape(-1),
    }


def convert_vits_sdp(state, num_flows=4, has_cond=False):
    """StochasticDurationPredictor → ``tts_tpu`` SDP params."""
    p = {
        "pre": _dense(state, "pre"),
        "convs": _convert_dds(state, "convs."),
        "proj": _dense(state, "proj"),
        "post_pre": _dense(state, "post_pre"),
        "post_convs": _convert_dds(state, "post_convs."),
        "post_proj": _dense(state, "post_proj"),
        "flow_affine": _convert_affine_flow(state, "flows.0."),
        "post_flow_affine": _convert_affine_flow(state, "post_flows.0."),
    }
    for i in range(num_flows):
        p[f"flow_{i}"] = _convert_conv_flow(state, f"flows.{i + 1}.")
        p[f"post_flow_{i}"] = _convert_conv_flow(state, f"post_flows.{i + 1}.")
    if has_cond and "cond.weight" in state:
        p["cond"] = _dense(state, "cond")
    return {"params": p}


def _subdict(state, prefix):
    return {k[len(prefix):]: v for k, v in state.items() if k.startswith(prefix)}


def convert_vits_generator(state, args) -> Dict[str, Any]:
    """Full reference ``Vits`` state dict → ``tts_tpu`` VitsModule params.

    ``args`` is a ``VitsArgs`` (layer counts drive the name maps).
    """
    state = fold_weight_norm(state)
    has_cond = bool(args.use_speaker_embedding or args.use_d_vector_file)
    p = {
        "text_encoder": convert_vits_text_encoder(
            _subdict(state, "text_encoder."), num_layers=args.num_layers_text_encoder
        )["params"],
        "posterior_encoder": convert_vits_posterior(
            _subdict(state, "posterior_encoder."),
            num_layers=args.num_layers_posterior_encoder, has_cond=has_cond,
        )["params"],
        "flow": convert_vits_flow(
            _subdict(state, "flow."), num_flows=4,
            num_layers=args.num_layers_flow, has_cond=has_cond,
        )["params"],
        "waveform_decoder": convert_hifigan_generator(_subdict(state, "waveform_decoder."))[
            "params"
        ],
    }
    if args.use_sdp:
        p["duration_predictor"] = convert_vits_sdp(
            _subdict(state, "duration_predictor."), num_flows=4,
            has_cond=has_cond and args.condition_dp_on_speaker,
        )["params"]
    if "emb_g.weight" in state:
        p["emb_g"] = {"embedding": state["emb_g.weight"]}
    if "emb_l.weight" in state:
        p["emb_l"] = {"embedding": state["emb_l.weight"]}
    return {"params": p}


# ---------------------------------------------------------------------------
# GlowTTS converters
# ---------------------------------------------------------------------------


def convert_glow_duration_predictor(state, prefix=""):
    """glow_tts DurationPredictor → ``tts_tpu.layers.common.DurationPredictor``."""
    p = {
        "conv_1": _conv(state, f"{prefix}conv_1"),
        "norm_1": {"LayerNorm_0": _layernorm(state, f"{prefix}norm_1")},
        "conv_2": _conv(state, f"{prefix}conv_2"),
        "norm_2": {"LayerNorm_0": _layernorm(state, f"{prefix}norm_2")},
        "proj": _plain_conv(state, f"{prefix}proj"),
    }
    if f"{prefix}cond.weight" in state:
        p["cond"] = _dense(state, f"{prefix}cond")
    return p


def convert_glow_prenet(state, prefix, num_layers=3):
    """ResidualConv1dLayerNormBlock → ``ConvLayerNormBlock``."""
    p = {}
    for i in range(num_layers):
        p[f"conv_{i}"] = _conv(state, f"{prefix}conv_layers.{i}")
        p[f"norm_{i}"] = {"LayerNorm_0": _layernorm(state, f"{prefix}norm_layers.{i}")}
    p["proj"] = _plain_conv(state, f"{prefix}proj")
    return p


def convert_glow_decoder(state, prefix="", num_flow_blocks=12, num_coupling_layers=4):
    """glow_tts Decoder (flows list) → ``tts_tpu.layers.glow.GlowDecoder``."""
    state = fold_weight_norm(state)
    p = {}
    for k in range(num_flow_blocks):
        base = 3 * k
        p[f"actnorm_{k}"] = {
            "logs": state[f"{prefix}flows.{base}.logs"].reshape(-1),
            "bias": state[f"{prefix}flows.{base}.bias"].reshape(-1),
        }
        p[f"invconv_{k}"] = {"weight": state[f"{prefix}flows.{base + 1}.weight"]}
        cpl = f"{prefix}flows.{base + 2}."
        p[f"coupling_{k}"] = {
            "start": _dense(state, f"{cpl}start"),
            "wn": convert_wn(state, f"{cpl}wn.", num_coupling_layers, has_cond=True),
            "end": _dense(state, f"{cpl}end"),
        }
    return p


def convert_glow_tts(state, config) -> Dict[str, Any]:
    """Full reference ``GlowTTS`` state dict → ``tts_tpu`` GlowTTSModule."""
    state = fold_weight_norm(state)
    enc = {
        "emb": {"embedding": state["encoder.emb.weight"]},
        "encoder": convert_rel_pos_transformer(
            state, "encoder.encoder.", config.encoder_params.get("num_layers", 6)
        ),
        "proj_m": _dense(state, "encoder.proj_m"),
        "duration_predictor": convert_glow_duration_predictor(
            state, "encoder.duration_predictor."
        ),
    }
    if config.use_encoder_prenet:
        enc["prenet"] = convert_glow_prenet(state, "encoder.prenet.")
    if not config.mean_only and "encoder.proj_s.weight" in state:
        enc["proj_s"] = _dense(state, "encoder.proj_s")
    p = {
        "enc": enc,
        "dec": convert_glow_decoder(
            state, "decoder.", config.num_flow_blocks_dec, config.num_block_layers
        ),
    }
    if "emb_g.weight" in state:
        p["emb_g"] = {"embedding": state["emb_g.weight"]}
    return {"params": p}


# ---------------------------------------------------------------------------
# XTTS v2 GPT (reference TTS/tts/layers/xtts/gpt.py:88)
# ---------------------------------------------------------------------------

def _qkv_interleaved_dense(state, key, heads):
    """Conditioning-encoder qkv conv1x1 → flax Dense.

    The reference QKVAttention (latent_encoder.py:43) lays out the 3C output
    channels head-major ``[H, (q,k,v), dh]``; our AttentionBlock reshapes
    ``[.., 3, H, dh]`` — permute out-channels accordingly."""
    w = state[f"{key}.weight"][:, :, 0]  # [3D, D]
    b = state[f"{key}.bias"]
    d = w.shape[1]
    dh = d // heads
    w = w.reshape(heads, 3, dh, d).transpose(1, 0, 2, 3).reshape(3 * d, d)
    b = b.reshape(heads, 3, dh).transpose(1, 0, 2).reshape(3 * d)
    return {"kernel": linear_kernel(w), "bias": b}


def convert_conditioning_encoder(state, prefix="", heads=16, attn_blocks=6):
    """ConditioningEncoder (reference latent_encoder.py:119)."""
    p = {"init": _dense(state, f"{prefix}init")}
    for i in range(attn_blocks):
        k = f"{prefix}attn.{i}"
        p[f"attn_{i}"] = {
            "norm": _layernorm(state, f"{k}.norm"),
            "qkv": _qkv_interleaved_dense(state, f"{k}.qkv", heads),
            "proj_out": _dense(state, f"{k}.proj_out"),
        }
    return p


def convert_perceiver_resampler(state, prefix="", depth=2):
    """PerceiverResampler (reference perceiver_encoder.py:225).

    Reference FeedForward is ``Sequential(Linear, GEGLU, Linear)`` →
    torch keys ``layers.{i}.1.{0,2}``; attention projections are bias-free."""
    p = {"latents": state[f"{prefix}latents"], "norm_gamma": state[f"{prefix}norm.gamma"]}
    for i in range(depth):
        a = f"{prefix}layers.{i}.0"
        f = f"{prefix}layers.{i}.1"
        p[f"to_q_{i}"] = {"kernel": linear_kernel(state[f"{a}.to_q.weight"])}
        p[f"to_kv_{i}"] = {"kernel": linear_kernel(state[f"{a}.to_kv.weight"])}
        p[f"to_out_{i}"] = {"kernel": linear_kernel(state[f"{a}.to_out.weight"])}
        p[f"ff1_{i}"] = _dense(state, f"{f}.0")
        p[f"ff2_{i}"] = _dense(state, f"{f}.2")
    return p


def convert_gpt2_core(state, prefix="", layers=30):
    """HF GPT2Model → GPT2Core.  HF Conv1D weights are already ``[in, out]``
    (no transpose); gate order q,k,v matches our ``jnp.split``."""

    def hf_dense(key):
        leaf = {"kernel": state[f"{key}.weight"]}
        if f"{key}.bias" in state:
            leaf["bias"] = state[f"{key}.bias"]
        return leaf

    p = {"ln_f": _layernorm(state, f"{prefix}ln_f")}
    for i in range(layers):
        k = f"{prefix}h.{i}"
        p[f"h_{i}"] = {
            "ln_1": _layernorm(state, f"{k}.ln_1"),
            "ln_2": _layernorm(state, f"{k}.ln_2"),
            "attn": {"c_attn": hf_dense(f"{k}.attn.c_attn"), "c_proj": hf_dense(f"{k}.attn.c_proj")},
            "mlp_fc": hf_dense(f"{k}.mlp.c_fc"),
            "mlp_proj": hf_dense(f"{k}.mlp.c_proj"),
        }
    return p


def convert_xtts_gpt(
    state,
    layers=30,
    heads=16,
    cond_attn_blocks=6,
    perceiver_depth=2,
    use_perceiver=True,
    prefix="gpt.",
):
    """Full XTTS GPT stack (reference gpt.py:88 GPT).  ``state`` is the
    checkpoint dict; ``prefix`` is where the GPT lives (``"gpt."`` inside a
    full XTTS checkpoint, ``""`` for a bare GPT state dict)."""
    s = _subdict(state, prefix) if prefix else dict(state)
    p = {
        "conditioning_encoder": convert_conditioning_encoder(
            s, "conditioning_encoder.", heads, cond_attn_blocks
        ),
        "text_embedding": {"embedding": s["text_embedding.weight"]},
        "mel_embedding": {"embedding": s["mel_embedding.weight"]},
        "text_pos_embedding": s["text_pos_embedding.emb.weight"],
        "mel_pos_embedding": s["mel_pos_embedding.emb.weight"],
        "gpt": convert_gpt2_core(s, "gpt.", layers),
        "final_norm": _layernorm(s, "final_norm"),
        "text_head": _dense(s, "text_head"),
        "mel_head": _dense(s, "mel_head"),
    }
    if use_perceiver:
        p["conditioning_perceiver"] = convert_perceiver_resampler(
            s, "conditioning_perceiver.", perceiver_depth
        )
    return {"params": p}


# ---------------------------------------------------------------------------
# ResNet speaker encoder + XTTS HiFi decoder
# (reference TTS/encoder/models/resnet.py:59, TTS/tts/layers/xtts/hifigan_decoder.py:421,615)
# ---------------------------------------------------------------------------

def _fold_bn(state, key, eps=1e-5):
    """Eval-mode BatchNorm → elementwise affine (``_Norm2d`` "folded")."""
    mean, var = state[f"{key}.running_mean"], state[f"{key}.running_var"]
    w = state.get(f"{key}.weight", np.ones_like(var))
    b = state.get(f"{key}.bias", np.zeros_like(mean))
    scale = w / np.sqrt(var + eps)
    return {"scale": scale, "shift": b - mean * scale}


def _conv2d_tm(state, key):
    """torch Conv2d over (mel, time) → our Conv over (time, mel): swap the
    kernel's spatial axes on top of the layout transpose."""
    leaf = {"kernel": conv2d_kernel(state[f"{key}.weight"]).transpose(1, 0, 2, 3)}
    if f"{key}.bias" in state:
        leaf["bias"] = state[f"{key}.bias"]
    return leaf


def convert_resnet_speaker_encoder(state, prefix="", layers=(3, 4, 6, 3)):
    """ResNetSpeakerEncoder → flax params (use with ``norm_type="folded"``)."""
    s = _subdict(state, prefix) if prefix else dict(state)
    p = {
        "conv1": _conv2d_tm(s, "conv1"),
        "bn1": _fold_bn(s, "bn1"),
        "attn_conv1": _plain_conv(s, "attention.0"),
        "attn_bn": _fold_bn(s, "attention.2"),
        "attn_conv2": _plain_conv(s, "attention.3"),
        "fc": _dense(s, "fc"),
    }
    for li, n_blocks in enumerate(layers):
        for bi in range(n_blocks):
            k = f"layer{li + 1}.{bi}"
            blk = {
                "conv1": _conv2d_tm(s, f"{k}.conv1"),
                "bn1": _fold_bn(s, f"{k}.bn1"),
                "conv2": _conv2d_tm(s, f"{k}.conv2"),
                "bn2": _fold_bn(s, f"{k}.bn2"),
                "se": {"fc1": _dense(s, f"{k}.se.fc.0"), "fc2": _dense(s, f"{k}.se.fc.2")},
            }
            if f"{k}.downsample.0.weight" in s:
                blk["downsample_conv"] = _conv2d_tm(s, f"{k}.downsample.0")
                blk["downsample_bn"] = _fold_bn(s, f"{k}.downsample.1")
            p[f"layer{li + 1}_{bi}"] = blk
    return p


def convert_hifi_decoder(state, prefix="hifigan_decoder."):
    """XTTS HifiDecoder (waveform decoder + speaker encoder)."""
    s = _subdict(state, prefix) if prefix else dict(state)
    return {
        "params": {
            "waveform_decoder": convert_hifigan_generator(
                _subdict(s, "waveform_decoder.")
            )["params"],
            "speaker_encoder": convert_resnet_speaker_encoder(s, "speaker_encoder."),
        }
    }


def convert_xtts(state, layers=30, heads=16):
    """Full XTTS v2 checkpoint → (gpt_params, decoder_params) pair for
    :class:`tts_tpu.models.xtts.model.Xtts`."""
    gpt_params = convert_xtts_gpt(state, layers=layers, heads=heads, prefix="gpt.")
    decoder_params = convert_hifi_decoder(state, prefix="hifigan_decoder.")
    return gpt_params, decoder_params


# ---------------------------------------------------------------------------
# Tacotron2 (reference TTS/tts/models/tacotron2.py + layers/tacotron/tacotron2.py)
# ---------------------------------------------------------------------------

def _lstm_cell(state, prefix, suffix=""):
    """torch LSTM(Cell) gates [i,f,g,o] → flax OptimizedLSTMCell params
    (``ii/if/ig/io`` bias-free input Dense + ``hi/hf/hg/ho`` biased hidden
    Dense; the two torch biases sum onto the hidden side)."""
    wi = state[f"{prefix}.weight_ih{suffix}"]
    wh = state[f"{prefix}.weight_hh{suffix}"]
    bi = state[f"{prefix}.bias_ih{suffix}"]
    bh = state[f"{prefix}.bias_hh{suffix}"]
    H = wh.shape[1]
    p = {}
    for gidx, g in enumerate(("i", "f", "g", "o")):
        sl = slice(gidx * H, (gidx + 1) * H)
        p[f"i{g}"] = {"kernel": linear_kernel(wi[sl])}
        p[f"h{g}"] = {"kernel": linear_kernel(wh[sl]), "bias": bi[sl] + bh[sl]}
    return p


def _conv_bn_block(state, key):
    """ConvBNBlock (tacotron2.py:11): conv + folded eval-mode BatchNorm."""
    return {
        "conv": _conv(state, f"{key}.convolution1d"),
        **_fold_bn_scale_shift(state, f"{key}.batch_normalization"),
    }


def _fold_bn_scale_shift(state, key, eps=1e-5):
    f = _fold_bn(state, key, eps)
    return {"scale": f["scale"], "shift": f["shift"]}


def convert_tacotron2(state, num_chars=None, r=2):
    """Full Tacotron2 → flax params (use ``norm_type="folded"``).

    BiLSTM directions map to the fwd/bwd ``nn.RNN`` pair; attention/decoder
    LSTMCells and the location layer convert via the generic rules."""
    state = dict(state)
    enc = {
        f"conv_{i}": _conv_bn_block(state, f"encoder.convolutions.{i}")
        for i in range(3)
    }
    enc["lstm_fwd"] = _lstm_cell(state, "encoder.lstm", "_l0")
    enc["lstm_bwd"] = _lstm_cell(state, "encoder.lstm", "_l0_reverse")

    cell = {
        "prenet": {
            "linear_0": _dense(state, "decoder.prenet.linear_layers.0.linear_layer"),
            "linear_1": _dense(state, "decoder.prenet.linear_layers.1.linear_layer"),
        },
        "attention_rnn": _lstm_cell(state, "decoder.attention_rnn"),
        "decoder_rnn": _lstm_cell(state, "decoder.decoder_rnn"),
        "linear_projection": _dense(state, "decoder.linear_projection.linear_layer"),
        "stopnet": _dense(state, "decoder.stopnet.1.linear_layer"),
    }
    if "decoder.attention.key_layer.weight" in state:
        # dynamic-convolution attention (tacotron2-DCA zoo entries;
        # reference attentions.py:323 — raw nn.Linear layers, no wrapper)
        cell.update(
            query_layer=_dense(state, "decoder.attention.query_layer"),
            key_layer=_dense(state, "decoder.attention.key_layer"),
            static_filter_conv={
                "kernel": conv1d_kernel(state["decoder.attention.static_filter_conv.weight"])
            },
            static_filter_layer=_dense(state, "decoder.attention.static_filter_layer"),
            dynamic_filter_layer=_dense(state, "decoder.attention.dynamic_filter_layer"),
            v=_dense(state, "decoder.attention.v"),
        )
    else:
        cell.update(
            query_layer=_dense(state, "decoder.attention.query_layer.linear_layer"),
            location_conv={
                "kernel": conv1d_kernel(
                    state["decoder.attention.location_layer.location_conv1d.weight"]
                )
            },
            location_dense=_dense(
                state, "decoder.attention.location_layer.location_dense.linear_layer"
            ),
            v=_dense(state, "decoder.attention.v.linear_layer"),
        )
    post = {
        f"conv_{i}": _conv_bn_block(state, f"postnet.convolutions.{i}")
        for i in range(5)
    }
    if "decoder.attention.inputs_layer.linear_layer.weight" in state:
        inputs_layer = _dense(state, "decoder.attention.inputs_layer.linear_layer")
    else:
        # DCA has no inputs_layer (preprocess_inputs → None, :432); our
        # module still owns the Dense but the DCA branch never reads it
        dec_rnn_dim = state["decoder.decoder_rnn.weight_hh"].shape[1]
        in_dim = state["decoder.linear_projection.linear_layer.weight"].shape[1] - dec_rnn_dim
        inputs_layer = {"kernel": np.zeros((in_dim, 128), np.float32)}
    p = {
        "embedding": {"embedding": state["embedding.weight"]},
        "encoder": enc,
        "decoder_cell": cell,
        "inputs_layer": inputs_layer,
        "postnet": post,
    }
    if "speaker_embedding.weight" in state:
        p["speaker_embedding"] = {"embedding": state["speaker_embedding.weight"]}
    if any(k.startswith("gst_layer.") for k in state):
        p["gst_layer"] = convert_gst(state, "gst_layer.")
    if any(k.startswith("capacitron_vae_layer.") for k in state):
        p["capacitron_vae_layer"] = convert_capacitron(state, "capacitron_vae_layer.")
    return {"params": p}


# ---------------------------------------------------------------------------
# fairseq MMS VITS (reference TTS/tts/utils/fairseq.py:4 + vits.py:1727)
# ---------------------------------------------------------------------------

# fairseq name → coqui name, applied longest-prefix-first.  fairseq keeps the
# trivial flip flows at odd indices, so the affine flows 0/2/4/6 renumber to
# 0..3; the SDP flow lists (0,1,3,5,7) renumber to 0..4 with the first flow's
# m/logs becoming translation/log_scale.
_FAIRSEQ_RENAMES = [
    ("dp.flows.0.m", "duration_predictor.flows.0.translation"),
    ("dp.flows.0.logs", "duration_predictor.flows.0.log_scale"),
    ("dp.flows.1.", "duration_predictor.flows.1."),
    ("dp.flows.3.", "duration_predictor.flows.2."),
    ("dp.flows.5.", "duration_predictor.flows.3."),
    ("dp.flows.7.", "duration_predictor.flows.4."),
    ("dp.post_flows.0.m", "duration_predictor.post_flows.0.translation"),
    ("dp.post_flows.0.logs", "duration_predictor.post_flows.0.log_scale"),
    ("dp.post_flows.1.", "duration_predictor.post_flows.1."),
    ("dp.post_flows.3.", "duration_predictor.post_flows.2."),
    ("dp.post_flows.5.", "duration_predictor.post_flows.3."),
    ("dp.post_flows.7.", "duration_predictor.post_flows.4."),
    ("dp.", "duration_predictor."),
    ("flow.flows.2.", "flow.flows.1."),
    ("flow.flows.4.", "flow.flows.2."),
    ("flow.flows.6.", "flow.flows.3."),
    ("enc_p.", "text_encoder."),
    ("enc_q.", "posterior_encoder."),
    ("dec.", "waveform_decoder."),
]


def rehash_fairseq_vits(state):
    """Rename a fairseq MMS VITS state dict to the coqui-VITS layout that
    :func:`convert_vits_generator` consumes."""
    out = {}
    for k, v in state.items():
        for old, new in _FAIRSEQ_RENAMES:
            if k.startswith(old):
                k = new + k[len(old):]
                break
        out[k] = v
    return out


def convert_fairseq_vits(state, args):
    """fairseq MMS VITS checkpoint (``G_100000.pth`` "model" dict) → flax
    params for :class:`tts_tpu.models.vits.model.VitsModule`."""
    return convert_vits_generator(rehash_fairseq_vits(state), args)


# ---------------------------------------------------------------------------
# MelGAN family (reference TTS/vocoder/models/melgan_generator.py:9)
# ---------------------------------------------------------------------------

def _convtranspose(state, key):
    leaf = {"kernel": convtranspose1d_kernel(state[f"{key}.weight"])}
    if f"{key}.bias" in state:
        leaf["bias"] = state[f"{key}.bias"]
    return leaf


def convert_melgan_generator(state, num_upsample_stages, num_res_blocks=3):
    """Reference MelganGenerator Sequential → flax params.

    Sequential layout: [pad, conv_pre, (lrelu, convT, resstack)*N, lrelu,
    pad, conv_post, tanh] → conv indices 1, 3+3i, and 2+3N+2."""
    state = fold_weight_norm(state)
    p = {"conv_pre": _plain_conv(state, "layers.1")}
    for i in range(num_upsample_stages):
        up = 3 + 3 * i
        p[f"ups_{i}"] = _convtranspose(state, f"layers.{up}")
        stack = {}
        for j in range(num_res_blocks):
            stack[f"block{j}_conv1"] = _plain_conv(state, f"layers.{up + 1}.blocks.{j}.2")
            stack[f"block{j}_conv2"] = _plain_conv(state, f"layers.{up + 1}.blocks.{j}.4")
            stack[f"shortcut{j}"] = _plain_conv(state, f"layers.{up + 1}.shortcuts.{j}")
        p[f"res_{i}"] = stack
    final = 2 + 3 * num_upsample_stages + 2
    p["conv_post"] = _plain_conv(state, f"layers.{final}")
    return {"params": p}


# ---------------------------------------------------------------------------
# ParallelWaveGAN (reference TTS/vocoder/models/parallel_wavegan_generator.py:12)
# ---------------------------------------------------------------------------

def _shared_tap(w):
    """Reference Conv2d(1, 1, (1, k)) smoothing weight [1,1,1,k] → (k,1,1)."""
    return np.asarray(w).reshape(-1)[:, None, None]


def convert_parallel_wavegan_generator(state, num_res_blocks=30, num_upsample_stages=4):
    state = fold_weight_norm(state)
    p = {
        "first_conv": _dense(state, "first_conv"),
        "last_conv_1": _dense(state, "last_conv_layers.1"),
        "last_conv_2": _dense(state, "last_conv_layers.3"),
        "upsample_net": {
            "conv_in": _plain_conv(state, "upsample_net.conv_in"),
        },
    }
    for i in range(num_upsample_stages):
        p["upsample_net"][f"up_{i}"] = _shared_tap(
            state[f"upsample_net.upsample.up_layers.{2 * i + 1}.weight"]
        )
    for i in range(num_res_blocks):
        k = f"conv_layers.{i}"
        p[f"res_{i}"] = {
            "conv": _plain_conv(state, f"{k}.conv"),
            "conv1x1_aux": _dense(state, f"{k}.conv1x1_aux"),
            "conv1x1_out": _dense(state, f"{k}.conv1x1_out"),
            "conv1x1_skip": _dense(state, f"{k}.conv1x1_skip"),
        }
    return {"params": p}


# ---------------------------------------------------------------------------
# UnivNet (reference TTS/vocoder/models/univnet_generator.py:13)
# ---------------------------------------------------------------------------

def convert_univnet_generator(state, num_blocks=3, kpnet_res_blocks=3):
    state = fold_weight_norm(state)
    p = {
        "first_conv": _plain_conv(state, "first_conv"),
        "last_conv": _plain_conv(state, "last_conv_layers.0"),
    }
    for i in range(num_blocks):
        k = f"lvc_blocks.{i}"
        blk = {
            "conv_0": _plain_conv(state, f"{k}.convs.0"),
            "conv_1": _plain_conv(state, f"{k}.convs.1"),
            "upsample": _convtranspose(state, f"{k}.upsample"),
            "kernel_predictor": {
                "input_conv": _plain_conv(state, f"{k}.kernel_predictor.input_conv.0"),
                "kernel_conv": _plain_conv(state, f"{k}.kernel_predictor.kernel_conv"),
                "bias_conv": _plain_conv(state, f"{k}.kernel_predictor.bias_conv"),
            },
        }
        for r in range(kpnet_res_blocks):
            blk["kernel_predictor"][f"res_{r}a"] = _plain_conv(
                state, f"{k}.kernel_predictor.residual_conv.{5 * r + 1}"
            )
            blk["kernel_predictor"][f"res_{r}b"] = _plain_conv(
                state, f"{k}.kernel_predictor.residual_conv.{5 * r + 3}"
            )
        p[f"lvc_{i}"] = blk
    return {"params": p}


def convert_tortoise_univnet(state, num_blocks=3, kpnet_res_blocks=3, lvc_convs=4):
    """Tortoise-bundled UnivNet vocoder (reference
    ``TTS/tts/layers/tortoise/vocoder.py:277`` — ``vocoder.pth`` under the
    ``model_g`` subkey).  Use with ``UnivnetGenerator(pad_mode="reflect",
    kpnet_lrelu_slope=0.2, final_lrelu_slope=0.2,
    kpnet_residual_style="per_block", cond_channels=100)``."""
    if "model_g" in state:
        state = state["model_g"]
    state = fold_weight_norm(state)
    p = {
        "first_conv": _plain_conv(state, "conv_pre"),
        "last_conv": _plain_conv(state, "conv_post.1"),
    }
    for i in range(num_blocks):
        k = f"res_stack.{i}"
        blk = {
            "upsample": _convtranspose(state, f"{k}.convt_pre.1"),
            "kernel_predictor": {
                "input_conv": _plain_conv(state, f"{k}.kernel_predictor.input_conv.0"),
                "kernel_conv": _plain_conv(state, f"{k}.kernel_predictor.kernel_conv"),
                "bias_conv": _plain_conv(state, f"{k}.kernel_predictor.bias_conv"),
            },
        }
        for d in range(lvc_convs):
            blk[f"conv_{d}"] = _plain_conv(state, f"{k}.conv_blocks.{d}.1")
        for r in range(kpnet_res_blocks):
            blk["kernel_predictor"][f"res_{r}a"] = _plain_conv(
                state, f"{k}.kernel_predictor.residual_convs.{r}.1"
            )
            blk["kernel_predictor"][f"res_{r}b"] = _plain_conv(
                state, f"{k}.kernel_predictor.residual_convs.{r}.3"
            )
        p[f"lvc_{i}"] = blk
    return {"params": p}


# ---------------------------------------------------------------------------
# FreeVC (reference TTS/vc/models/freevc.py:330)
# ---------------------------------------------------------------------------

def convert_freevc(state, config=None):
    """Reference FreeVC checkpoint → flax params for
    :class:`tts_tpu.vc.models.freevc.FreeVCModule` (WavLM ships separately
    and converts via :func:`convert_wavlm`)."""
    n_flows = 4
    n_wn_layers = 16
    state = fold_weight_norm(state)
    p = {
        "enc_p": {
            "pre": _dense(state, "enc_p.pre"),
            "enc": convert_wn(state, "enc_p.enc.", n_wn_layers, has_cond=False),
            "proj": _dense(state, "enc_p.proj"),
        },
        "enc_q": convert_vits_posterior(
            _subdict(state, "enc_q."), num_layers=n_wn_layers, has_cond=True
        )["params"],
        # freevc interleaves parameterless Flip modules: coupling layers sit
        # at flows.{0,2,4,6} (VITS flips inline, flows.{0..3})
        "flow": convert_vits_flow(
            {
                k.replace(f"flows.{2 * i}.", f"flows.{i}."): v
                for k, v in _subdict(state, "flow.").items()
                for i in [int(k.split(".")[1]) // 2]
            },
            num_flows=n_flows, num_layers=4, has_cond=True,
        )["params"],
        # freevc names its speaker-conditioning conv "cond" (vits: cond_layer)
        "dec": convert_hifigan_generator({
            ("cond_layer." + k[len("cond."):] if k.startswith("cond.") else k): v
            for k, v in _subdict(state, "dec.").items()
        })["params"],
    }
    if "enc_spk.lstm.weight_ih_l0" in state:
        spk = {"linear": _dense(state, "enc_spk.linear")}
        l = 0
        while f"enc_spk.lstm.weight_ih_l{l}" in state:
            spk[f"lstm_{l}"] = _lstm_cell(state, "enc_spk.lstm", f"_l{l}")
            l += 1
        p["enc_spk"] = spk
    return {"params": p}


# ---------------------------------------------------------------------------
# DelightfulTTS reference-depth acoustic model
# (reference TTS/tts/layers/delightful_tts/* — see models/delightful_tts/acoustic.py)
# ---------------------------------------------------------------------------

def _bsconv(state, key):
    return {
        "pointwise": _plain_conv(state, f"{key}.pointwise"),
        "depthwise": _plain_conv(state, f"{key}.depthwise"),
    }


def _delightful_ff(state, key):
    return {
        "ln": _layernorm(state, f"{key}.ln"),
        "conv_1": _plain_conv(state, f"{key}.conv_1"),
        "conv_2": _plain_conv(state, f"{key}.conv_2"),
    }


def _delightful_conv_mod(state, key):
    return {
        "ln_1": _layernorm(state, f"{key}.ln_1"),
        "conv_1": _plain_conv(state, f"{key}.conv_1.conv"),
        "depthwise": _plain_conv(state, f"{key}.depthwise.conv"),
        "ln_2": {"scale": state[f"{key}.ln_2.weight"], "bias": state[f"{key}.ln_2.bias"]},
        "conv_2": _plain_conv(state, f"{key}.conv_2.conv"),
    }


def _delightful_rel_mha(state, key):
    return {
        "query_proj": _dense(state, f"{key}.query_proj"),
        "key_proj": _dense(state, f"{key}.key_proj"),
        "value_proj": _dense(state, f"{key}.value_proj"),
        "pos_proj": _dense(state, f"{key}.pos_proj"),
        "out_proj": _dense(state, f"{key}.out_proj"),
        "u_bias": state[f"{key}.u_bias"],
        "v_bias": state[f"{key}.v_bias"],
    }


def _delightful_conformer_block(state, key, has_conditioning=True):
    p = {
        "ff": _delightful_ff(state, f"{key}.ff"),
        "conformer_conv_1": _delightful_conv_mod(state, f"{key}.conformer_conv_1"),
        "ln": _layernorm(state, f"{key}.ln"),
        "slf_attn": {"attention": _delightful_rel_mha(state, f"{key}.slf_attn.attention")},
        "conformer_conv_2": _delightful_conv_mod(state, f"{key}.conformer_conv_2"),
    }
    if has_conditioning and f"{key}.conditioning.conv.pointwise.weight" in state:
        p["conditioning"] = {
            "conv": _bsconv(state, f"{key}.conditioning.conv"),
            "embedding_proj": _dense(state, f"{key}.conditioning.embedding_proj"),
        }
    return p


def convert_delightful_conformer(state, prefix, n_layers):
    return {
        f"block_{i}": _delightful_conformer_block(state, f"{prefix}layer_stack.{i}")
        for i in range(n_layers)
    }


def convert_delightful_reference_encoder(state, prefix, n_convs):
    p = {}
    for i in range(n_convs):
        p[f"conv_{i}"] = (
            # CoordConv1d keeps an unused inherited weight; the real conv is
            # at .conv (reference conv_layers.py:476)
            {"conv": _plain_conv(state, f"{prefix}convs.0.conv")}
            if i == 0
            else _plain_conv(state, f"{prefix}convs.{i}")
        )
        p[f"norm_{i}"] = {
            "scale": state[f"{prefix}norms.{i}.weight"],
            "bias": state[f"{prefix}norms.{i}.bias"],
        }
    p["gru"] = _gru_cell(state, f"{prefix}gru")
    return p


def convert_delightful_utt_prosody(state, prefix, n_convs):
    return {
        "encoder": convert_delightful_reference_encoder(state, f"{prefix}encoder.", n_convs),
        "encoder_prj": _dense(state, f"{prefix}encoder_prj"),
        "stl": {
            "embed": state[f"{prefix}stl.embed"],
            "attention": {
                "W_query": _dense(state, f"{prefix}stl.attention.W_query"),
                "W_key": _dense(state, f"{prefix}stl.attention.W_key"),
                "W_value": _dense(state, f"{prefix}stl.attention.W_value"),
            },
        },
        "encoder_bottleneck": _dense(state, f"{prefix}encoder_bottleneck"),
    }


def convert_delightful_phon_prosody(state, prefix, n_convs):
    return {
        "encoder": convert_delightful_reference_encoder(state, f"{prefix}encoder.", n_convs),
        "encoder_prj": _dense(state, f"{prefix}encoder_prj"),
        "attention": {"attention": _delightful_rel_mha(state, f"{prefix}attention.attention")},
        "encoder_bottleneck": _dense(state, f"{prefix}encoder_bottleneck"),
    }


def convert_delightful_variance_predictor(state, prefix):
    return {
        "conv_0": {"conv": _bsconv(state, f"{prefix}layers.0.conv")},
        "ln_0": _layernorm(state, f"{prefix}layers.2"),
        "conv_1": {"conv": _bsconv(state, f"{prefix}layers.4.conv")},
        "ln_1": _layernorm(state, f"{prefix}layers.6"),
        "linear_layer": _dense(state, f"{prefix}linear_layer"),
    }


def convert_delightful_adaptor(state, prefix, kind):
    return {
        "predictor": convert_delightful_variance_predictor(state, f"{prefix}{kind}_predictor."),
        "emb": _plain_conv(state, f"{prefix}{kind}_emb"),
    }


def convert_delightful_prosody_predictor(state, prefix):
    return {
        "conv_0": {"conv": _bsconv(state, f"{prefix}layers.0.conv")},
        "ln_0": _layernorm(state, f"{prefix}layers.2"),
        "conv_1": {"conv": _bsconv(state, f"{prefix}layers.4.conv")},
        "ln_1": _layernorm(state, f"{prefix}layers.6"),
        "predictor_bottleneck": _dense(state, f"{prefix}predictor_bottleneck"),
    }


def convert_delightful_acoustic(state, n_layers_enc, n_layers_dec, n_ref_convs=6):
    """Full reference ``AcousticModel`` state dict → flax params for
    :class:`tts_tpu.models.delightful_tts.acoustic_model.AcousticModel`."""
    p = {
        "src_word_emb": {"embeddings": state["src_word_emb.embeddings"]},
        "encoder": convert_delightful_conformer(state, "encoder.", n_layers_enc),
        "decoder": convert_delightful_conformer(state, "decoder.", n_layers_dec),
        "pitch_adaptor": convert_delightful_adaptor(state, "pitch_adaptor.", "pitch"),
        "energy_adaptor": convert_delightful_adaptor(state, "energy_adaptor.", "energy"),
        "duration_predictor": convert_delightful_variance_predictor(
            state, "duration_predictor."),
        "utterance_prosody_encoder": convert_delightful_utt_prosody(
            state, "utterance_prosody_encoder.", n_ref_convs),
        "utterance_prosody_predictor": convert_delightful_prosody_predictor(
            state, "utterance_prosody_predictor."),
        "phoneme_prosody_encoder": convert_delightful_phon_prosody(
            state, "phoneme_prosody_encoder.", n_ref_convs),
        "phoneme_prosody_predictor": convert_delightful_prosody_predictor(
            state, "phoneme_prosody_predictor."),
        "u_bottle_out": _dense(state, "u_bottle_out"),
        "p_bottle_out": _dense(state, "p_bottle_out"),
        "to_mel": _dense(state, "to_mel"),
        "aligner": convert_aligner(state, "aligner."),
    }
    if "emb_g.weight" in state:
        p["emb_g"] = {"embedding": state["emb_g.weight"]}
    return {"params": p}


def convert_aligner(state, prefix="aligner."):
    """Reference AlignmentNetwork → flax params (same mapping as the
    ForwardTTS aligner)."""
    return {
        "key_conv1": _conv(state, f"{prefix}key_layer.0"),
        "key_conv2": _conv(state, f"{prefix}key_layer.2"),
        "query_conv1": _conv(state, f"{prefix}query_layer.0"),
        "query_conv2": _conv(state, f"{prefix}query_layer.2"),
        "query_conv3": _conv(state, f"{prefix}query_layer.4"),
    }


# ---------------------------------------------------------------------------
# EnCodec decoder (Bark waveform stage; HF transformers EncodecModel or the
# original `encodec` package checkpoint layout)
# ---------------------------------------------------------------------------

def _normalize_encodec_keys(state):
    """Map the original ``encodec`` package state-dict names onto the HF
    ``EncodecModel`` ones (same structure, different nesting)."""
    out = {}
    for k, v in state.items():
        k = k.replace("decoder.model.", "decoder.layers.")
        k = k.replace("encoder.model.", "encoder.layers.")
        k = k.replace(".conv.conv.", ".conv.")
        k = k.replace(".convtr.convtr.", ".conv.")
        k = k.replace("quantizer.vq.layers.", "quantizer.layers.")
        k = k.replace("._codebook.", ".codebook.")
        out[k] = v
    return out


def convert_encodec_decoder(state, upsampling_ratios=(8, 5, 4, 2),
                            num_residual_layers=1, num_lstm_layers=2,
                            num_quantizers=None):
    """HF ``EncodecModel`` (or original ``encodec``) state dict → flax
    ``EncodecDecoder`` params + RVQ codebooks.

    Returns ``(params, codebooks [n_q, bins, D])`` — encoder weights are
    ignored (Bark only decodes).
    """
    state = fold_weight_norm(_normalize_encodec_keys(state))
    p = {
        "layer_0": {"conv": _plain_conv(state, "decoder.layers.0.conv")},
    }
    for l in range(num_lstm_layers):
        p[f"lstm_{l}"] = _lstm_cell(state, "decoder.layers.1.lstm", f"_l{l}")
    idx = 2
    for _ in upsampling_ratios:
        idx += 1  # ELU
        p[f"layer_{idx}"] = {
            "conv": _convtranspose(state, f"decoder.layers.{idx}.conv")
        }
        for _ in range(num_residual_layers):
            idx += 1
            p[f"layer_{idx}"] = {
                "block_1": {"conv": _plain_conv(state, f"decoder.layers.{idx}.block.1.conv")},
                "block_3": {"conv": _plain_conv(state, f"decoder.layers.{idx}.block.3.conv")},
                "shortcut": {"conv": _plain_conv(state, f"decoder.layers.{idx}.shortcut.conv")},
            }
        idx += 1
    idx += 1
    p[f"layer_{idx}"] = {"conv": _plain_conv(state, f"decoder.layers.{idx}.conv")}

    cb_keys = sorted(
        (k for k in state if k.startswith("quantizer.layers.") and k.endswith(".codebook.embed")),
        key=lambda k: int(k.split(".")[2]),
    )
    if num_quantizers is not None:
        cb_keys = cb_keys[:num_quantizers]
    codebooks = np.stack([state[k] for k in cb_keys]) if cb_keys else None
    return {"params": p}, codebooks


def infer_encodec_dims(state) -> Dict[str, object]:
    """Read the SEANet hyperparameters straight off a checkpoint so
    reduced-dim test models and the real 24 kHz weights both load without
    out-of-band configuration.  Returns kwargs for ``EncodecDecoder`` /
    ``EncodecEncoder``."""
    import re as _re

    state = fold_weight_norm(_normalize_encodec_keys(state))
    convs = sorted(
        int(k.split(".")[2])
        for k in state
        if _re.match(r"decoder\.layers\.\d+\.conv\.weight$", k)
    )
    # [in-conv, upsample×len(ratios), out-conv]
    w0 = state[f"decoder.layers.{convs[0]}.conv.weight"]  # [scaling*nf, hidden, K]
    ups = convs[1:-1]
    ratios = [int(state[f"decoder.layers.{i}.conv.weight"].shape[2]) // 2 for i in ups]
    # gap between consecutive upsample convs = 1 ELU + num_res resblocks + 1
    num_res = (ups[1] - ups[0] - 2) if len(ups) > 1 else 1
    res_key = f"decoder.layers.{ups[0] + 1}.block.1.conv.weight"
    lstm_layers = sum(
        1 for k in state if k.startswith("decoder.layers.1.lstm.weight_ih_l")
    )
    return dict(
        hidden_size=int(w0.shape[1]),
        num_filters=int(w0.shape[0]) // (2 ** len(ratios)),
        upsampling_ratios=tuple(ratios),
        kernel_size=int(w0.shape[2]),
        last_kernel_size=int(state[f"decoder.layers.{convs[-1]}.conv.weight"].shape[2]),
        residual_kernel_size=int(state[res_key].shape[2]) if res_key in state else 3,
        num_lstm_layers=lstm_layers,
        num_residual_layers=max(1, num_res),
    )


def convert_encodec_encoder(state, upsampling_ratios=(8, 5, 4, 2),
                            num_residual_layers=1, num_lstm_layers=2):
    """HF/original EnCodec state dict → flax ``EncodecEncoder`` params
    (``encoder.layers.*``, same ModuleList-index naming as the decoder)."""
    state = fold_weight_norm(_normalize_encodec_keys(state))
    p = {
        "layer_0": {"conv": _plain_conv(state, "encoder.layers.0.conv")},
    }
    idx = 0
    for _ in reversed(list(upsampling_ratios)):
        for _ in range(num_residual_layers):
            idx += 1
            p[f"layer_{idx}"] = {
                "block_1": {"conv": _plain_conv(state, f"encoder.layers.{idx}.block.1.conv")},
                "block_3": {"conv": _plain_conv(state, f"encoder.layers.{idx}.block.3.conv")},
                "shortcut": {"conv": _plain_conv(state, f"encoder.layers.{idx}.shortcut.conv")},
            }
        idx += 2  # ELU + strided conv
        p[f"layer_{idx}"] = {"conv": _plain_conv(state, f"encoder.layers.{idx}.conv")}
    lstm_idx = idx + 1
    for l in range(num_lstm_layers):
        p[f"lstm_{l}"] = _lstm_cell(state, f"encoder.layers.{lstm_idx}.lstm", f"_l{l}")
    out_idx = lstm_idx + 2
    p[f"layer_{out_idx}"] = {"conv": _plain_conv(state, f"encoder.layers.{out_idx}.conv")}
    return {"params": p}


# ---------------------------------------------------------------------------
# WaveGrad (reference TTS/vocoder/models/wavegrad.py:36)
# ---------------------------------------------------------------------------

def convert_wavegrad(state, num_dblocks=4, num_ublocks=5):
    state = fold_weight_norm(state)
    p = {
        "y_conv": _plain_conv(state, "y_conv"),
        "x_conv": _plain_conv(state, "x_conv"),
        "out_conv": _plain_conv(state, "out_conv"),
    }
    for i in range(num_dblocks):
        k = f"dblocks.{i}"
        if f"{k}.res_block.weight" not in state:
            break
        p[f"dblock_{i}"] = {
            "res_block": _dense(state, f"{k}.res_block"),
            **{f"main_{j}": _plain_conv(state, f"{k}.main_block.{j}") for j in range(3)},
        }
    i = 0
    while f"film.{i}.input_conv.weight" in state:
        p[f"film_{i}"] = {
            "input_conv": _plain_conv(state, f"film.{i}.input_conv"),
            "output_conv": _plain_conv(state, f"film.{i}.output_conv"),
        }
        i += 1
    for i in range(num_ublocks):
        k = f"ublocks.{i}"
        if f"{k}.res_block.weight" not in state:
            break
        p[f"ublock_{i}"] = {
            "res_block": _dense(state, f"{k}.res_block"),
            **{f"main_{j}": _plain_conv(state, f"{k}.main_block.{j}") for j in range(2)},
            **{f"out_{j}": _plain_conv(state, f"{k}.out_block.{j}") for j in range(2)},
        }
    return {"params": p}


# ---------------------------------------------------------------------------
# WaveRNN (reference TTS/vocoder/models/wavernn.py:193)
# ---------------------------------------------------------------------------

def _gru_cell(state, prefix):
    """torch GRU gates [r,z,n] → flax GRUCell ir/iz/in (biased) + hr/hz
    (bias-free) + hn (biased): r/z hidden biases fold into the input side;
    the n-gate hidden bias stays separate (it is scaled by r)."""
    wi, wh = state[f"{prefix}.weight_ih_l0"], state[f"{prefix}.weight_hh_l0"]
    bi, bh = state[f"{prefix}.bias_ih_l0"], state[f"{prefix}.bias_hh_l0"]
    H = wh.shape[1]
    p = {}
    for gidx, g in enumerate(("r", "z", "n")):
        sl = slice(gidx * H, (gidx + 1) * H)
        p[f"i{g}"] = {"kernel": linear_kernel(wi[sl]), "bias": bi[sl] + (bh[sl] if g != "n" else 0)}
        hk = {"kernel": linear_kernel(wh[sl])}
        if g == "n":
            hk["bias"] = bh[sl]
        p[f"h{g}"] = hk
    return p


def convert_wavernn(state, num_res_blocks=10, num_upsample_stages=3):
    """Full reference Wavernn → flax params (use ``norm_type="folded"``)."""
    state = fold_weight_norm(state)
    resnet = {
        "conv_in": {"kernel": conv1d_kernel(state["upsample.resnet.conv_in.weight"])},
        "conv_out": _plain_conv(state, "upsample.resnet.conv_out"),
    }
    bn = _fold_bn(state, "upsample.resnet.batch_norm")
    resnet["norm_in_scale"], resnet["norm_in_shift"] = bn["scale"], bn["shift"]
    for i in range(num_res_blocks):
        k = f"upsample.resnet.layers.{i}"
        if f"{k}.conv1.weight" not in state:
            break
        resnet[f"res{i}_conv1"] = {"kernel": conv1d_kernel(state[f"{k}.conv1.weight"])}
        resnet[f"res{i}_conv2"] = {"kernel": conv1d_kernel(state[f"{k}.conv2.weight"])}
        b1 = _fold_bn(state, f"{k}.batch_norm1")
        b2 = _fold_bn(state, f"{k}.batch_norm2")
        resnet[f"res{i}_norm1_scale"], resnet[f"res{i}_norm1_shift"] = b1["scale"], b1["shift"]
        resnet[f"res{i}_norm2_scale"], resnet[f"res{i}_norm2_shift"] = b2["scale"], b2["shift"]
    upsample = {"resnet": resnet}
    for i in range(num_upsample_stages):
        key = f"upsample.up_layers.{2 * i + 1}.weight"
        if key not in state:
            break
        upsample[f"up_{i}"] = _shared_tap(state[key])
    p = {
        "upsample": upsample,
        "I": _dense(state, "I"),
        "rnn1": _gru_cell(state, "rnn1"),
        "rnn2": _gru_cell(state, "rnn2"),
        "fc1": _dense(state, "fc1"),
        "fc2": _dense(state, "fc2"),
        "fc3": _dense(state, "fc3"),
    }
    return {"params": p}


# ---------------------------------------------------------------------------
# ForwardTTS — FastPitch / FastSpeech(2) (reference TTS/tts/models/forward_tts.py:172)
# ---------------------------------------------------------------------------

def _mha(state, prefix, heads):
    """torch nn.MultiheadAttention → flax MultiHeadDotProductAttention."""
    w = state[f"{prefix}.in_proj_weight"]  # [3D, D] rows q,k,v
    b = state[f"{prefix}.in_proj_bias"]
    D = w.shape[1]
    dh = D // heads

    def leaf(wi, bi):
        return {"kernel": wi.T.reshape(D, heads, dh), "bias": bi.reshape(heads, dh)}

    out_w = state[f"{prefix}.out_proj.weight"]  # [D, D]
    return {
        "query": leaf(w[:D], b[:D]),
        "key": leaf(w[D : 2 * D], b[D : 2 * D]),
        "value": leaf(w[2 * D :], b[2 * D :]),
        "out": {"kernel": out_w.T.reshape(heads, dh, D), "bias": state[f"{prefix}.out_proj.bias"]},
    }


def _fft_block(state, prefix, num_layers, heads):
    """Reference FFTransformerBlock ``fft_layers.{i}`` → our ``fft_{i}``."""
    p = {}
    for i in range(num_layers):
        k = f"{prefix}fft_layers.{i}"
        p[f"fft_{i}"] = {
            "self_attn": _mha(state, f"{k}.self_attn", heads),
            "conv1": _conv(state, f"{k}.conv1"),
            "conv2": _conv(state, f"{k}.conv2"),
            "norm1": _layernorm(state, f"{k}.norm1"),
            "norm2": _layernorm(state, f"{k}.norm2"),
        }
    return p


def _variance_predictor(state, prefix):
    """DurationPredictor-style conv/LN/conv/LN/proj stack (forward_tts)."""
    return {
        "conv_1": _conv(state, f"{prefix}conv_1"),
        "norm_1": {"LayerNorm_0": _layernorm(state, f"{prefix}norm_1")},
        "conv_2": _conv(state, f"{prefix}conv_2"),
        "norm_2": {"LayerNorm_0": _layernorm(state, f"{prefix}norm_2")},
        "proj": _plain_conv(state, f"{prefix}proj"),
    }


def convert_forward_tts(state, args):
    """Full reference ForwardTTS state dict → flax params.

    ``args`` is our ForwardTTSArgs (layer counts/heads drive the maps).
    Supports the fftransformer encoder/decoder types (FastPitch/FastSpeech
    family); conv-BN types (speedy_speech) are not yet weight-compatible.
    """
    enc_p = getattr(args, "encoder_params", {}) or {}
    dec_p = getattr(args, "decoder_params", {}) or {}
    enc_layers = enc_p.get("num_layers", 6)
    enc_heads = enc_p.get("num_heads", 1)
    dec_layers = dec_p.get("num_layers", 6)
    dec_heads = dec_p.get("num_heads", 1)

    p = {
        "emb": {"embedding": state["emb.weight"]},
        "encoder": _fft_block(state, "encoder.encoder.", enc_layers, enc_heads),
        "decoder": _fft_block(
            state, "decoder.decoder.transformer_block.", dec_layers, dec_heads
        ),
        "proj": _dense(state, "decoder.decoder.postnet"),
        "duration_predictor": _variance_predictor(state, "duration_predictor."),
    }
    if "pos_encoder.scale" in state:
        p["pos_encoder"] = {"scale": state["pos_encoder.scale"].reshape(-1)}
    if "pitch_predictor.conv_1.weight" in state:
        p["pitch_predictor"] = _variance_predictor(state, "pitch_predictor.")
        p["pitch_emb"] = _conv(state, "pitch_emb")
    if "energy_predictor.conv_1.weight" in state:
        p["energy_predictor"] = _variance_predictor(state, "energy_predictor.")
        p["energy_emb"] = _conv(state, "energy_emb")
    if "aligner.key_layer.0.weight" in state:
        p["aligner"] = {
            "key_conv1": _conv(state, "aligner.key_layer.0"),
            "key_conv2": _conv(state, "aligner.key_layer.2"),
            "query_conv1": _conv(state, "aligner.query_layer.0"),
            "query_conv2": _conv(state, "aligner.query_layer.2"),
            "query_conv3": _conv(state, "aligner.query_layer.4"),
        }
    if "emb_g.weight" in state:
        p["emb_g"] = {"embedding": state["emb_g.weight"]}
    return {"params": p}


# ---------------------------------------------------------------------------
# Overflow / NeuralHMM (reference TTS/tts/models/overflow.py:24, neuralhmm_tts.py:23)
# ---------------------------------------------------------------------------

def convert_overflow(state, config):
    """Reference Overflow/NeuralhmmTTS state dict → flax params
    (use with ``config.norm_type='folded'``)."""
    state = dict(state)
    enc = {
        "emb": {"embedding": state["encoder.emb.weight"]},
        "lstm_fwd": _lstm_cell(state, "encoder.lstm", "_l0"),
        "lstm_bwd": _lstm_cell(state, "encoder.lstm", "_l0_reverse"),
    }
    for i in range(getattr(config, "encoder_n_convolutions", 3)):
        enc[f"conv_{i}"] = _conv_bn_block(state, f"encoder.convolutions.{i}")

    n_layers = len(getattr(config, "outputnet_size", [1024, 1024]))
    out_net = {
        "proj": _dense(state, "neural_hmm.output_net.parametermodel.last_layer"),
    }
    for i in range(n_layers):
        out_net[f"layer_{i}"] = _dense(
            state, f"neural_hmm.output_net.parametermodel.layers.{i}.linear_layer"
        )
    prenet = {}
    for i in range(getattr(config, "prenet_n_layers", 1)):
        w = state[f"neural_hmm.prenet.linear_layers.{i}.linear_layer.weight"]
        prenet[f"linear_{i}"] = {
            "kernel": linear_kernel(w),
            "bias": np.zeros((w.shape[0],), w.dtype),  # reference prenet is bias-free
        }
    p = {
        "encoder": enc,
        "neural_hmm": {
            "prenet": prenet,
            "memory_rnn": _lstm_cell(state, "neural_hmm.memory_rnn", ""),
            "output_net": out_net,
        },
    }
    if "decoder.glow_decoder.flows.0.logs" in state:
        p["decoder"] = convert_glow_decoder(
            state, "decoder.glow_decoder.",
            getattr(config, "num_flow_blocks_dec", 12),
            getattr(config, "num_block_layers", 4),
        )
    return {"params": p}


# ---------------------------------------------------------------------------
# Speaker encoders (reference TTS/encoder/models/{lstm,resnet}.py)
# ---------------------------------------------------------------------------

def convert_lstm_speaker_encoder(state, num_layers=3):
    """Reference LSTMSpeakerEncoder (LSTMWithProjection stack) → flax params
    for :class:`tts_tpu.encoder.model.LSTMSpeakerEncoder`."""
    p = {}
    for i in range(num_layers):
        p[f"lstm_{i}"] = _lstm_cell(state, f"layers.{i}.lstm", "_l0")
        p[f"proj_{i}"] = {"kernel": linear_kernel(state[f"layers.{i}.linear.weight"])}
    return {"params": p}


def convert_speaker_encoder(state, config):
    """Dispatch on config.model_params.model_name (lstm | resnet)."""
    mp = dict(getattr(config, "model_params", {}) or {})
    name = mp.get("model_name", "resnet")
    if name == "lstm":
        return convert_lstm_speaker_encoder(state, mp.get("num_lstm_layers", 3))
    return {"params": convert_resnet_speaker_encoder(state)}


# ---------------------------------------------------------------------------
# WavLM content encoder (reference TTS/vc/modules/freevc/wavlm/)
# ---------------------------------------------------------------------------

def _wavlm_fold_pos_conv(state, key="encoder.pos_conv.0."):
    """Fold the pos-conv weight norm (dim=2: g is [1, 1, k], norm over the
    (out, in) axes per kernel tap — the generic fold assumes dim=0)."""
    for g_key, v_key in (
        (key + "weight_g", key + "weight_v"),
        (key + "parametrizations.weight.original0", key + "parametrizations.weight.original1"),
    ):
        if v_key in state:
            g, v = state[g_key], state[v_key]
            axes = tuple(i for i, s in enumerate(g.shape) if s == 1)
            norm = np.sqrt((v**2).sum(axis=axes, keepdims=True))
            return g * v / np.maximum(norm, 1e-12)
    return state[key + "weight"]


def convert_wavlm_state(state, cfg) -> Dict[str, Any]:
    """Torch WavLM state dict → flax params for
    :class:`tts_tpu.vc.modules.wavlm.WavLM`."""
    p: Dict[str, Any] = {}

    fe: Dict[str, Any] = {}
    for i in range(len(cfg.conv_feature_layers)):
        conv = {"kernel": conv1d_kernel(state[f"feature_extractor.conv_layers.{i}.0.weight"])}
        if cfg.conv_bias:
            conv["bias"] = state[f"feature_extractor.conv_layers.{i}.0.bias"]
        fe[f"conv_{i}"] = conv
        if cfg.extractor_mode == "layer_norm":
            fe[f"ln_{i}"] = {
                "scale": state[f"feature_extractor.conv_layers.{i}.2.1.weight"],
                "bias": state[f"feature_extractor.conv_layers.{i}.2.1.bias"],
            }
        elif i == 0:
            fe["gn_0"] = {
                "scale": state["feature_extractor.conv_layers.0.2.weight"],
                "bias": state["feature_extractor.conv_layers.0.2.bias"],
            }
    p["feature_extractor"] = fe
    p["layer_norm"] = {"scale": state["layer_norm.weight"], "bias": state["layer_norm.bias"]}
    if "post_extract_proj.weight" in state:
        p["post_extract_proj"] = {
            "kernel": linear_kernel(state["post_extract_proj.weight"]),
            "bias": state["post_extract_proj.bias"],
        }

    # grouped positional conv: torch [out, in/groups, k] → flax [k, in/groups, out]
    w = _wavlm_fold_pos_conv(state)
    p["pos_conv"] = {
        "kernel": np.transpose(w, (2, 1, 0)),
        "bias": state["encoder.pos_conv.0.bias"],
    }

    for i in range(cfg.encoder_layers):
        pre = f"encoder.layers.{i}."
        attn: Dict[str, Any] = {}
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            attn[proj] = {
                "kernel": linear_kernel(state[pre + f"self_attn.{proj}.weight"]),
                "bias": state[pre + f"self_attn.{proj}.bias"],
            }
        if cfg.gru_rel_pos:
            attn["grep_linear"] = {
                "kernel": linear_kernel(state[pre + "self_attn.grep_linear.weight"]),
                "bias": state[pre + "self_attn.grep_linear.bias"],
            }
            attn["grep_a"] = state[pre + "self_attn.grep_a"]
        if cfg.relative_position_embedding and i == 0:
            attn["relative_attention_bias"] = state[pre + "self_attn.relative_attention_bias.weight"]
        layer = {
            "self_attn": attn,
            "self_attn_layer_norm": {
                "scale": state[pre + "self_attn_layer_norm.weight"],
                "bias": state[pre + "self_attn_layer_norm.bias"],
            },
            "fc1": {"kernel": linear_kernel(state[pre + "fc1.weight"]), "bias": state[pre + "fc1.bias"]},
            "fc2": {"kernel": linear_kernel(state[pre + "fc2.weight"]), "bias": state[pre + "fc2.bias"]},
            "final_layer_norm": {
                "scale": state[pre + "final_layer_norm.weight"],
                "bias": state[pre + "final_layer_norm.bias"],
            },
        }
        p[f"layer_{i}"] = layer
    p["encoder_layer_norm"] = {
        "scale": state["encoder.layer_norm.weight"],
        "bias": state["encoder.layer_norm.bias"],
    }
    return {"params": p}


def convert_wavlm(path: str):
    """WavLM-Large.pt (checkpoint dict with "cfg" + "model") →
    (WavLMConfig, flax params)."""
    import torch

    from tts_tpu.vc.modules.wavlm import WavLMConfig

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    cfg = WavLMConfig.from_checkpoint_cfg(dict(ckpt.get("cfg", {})))
    state = {k: np.asarray(v) for k, v in ckpt["model"].items()}
    return cfg, convert_wavlm_state(state, cfg)


# ---------------------------------------------------------------------------
# Tortoise diffusion decoder + CLVP (reference TTS/tts/layers/tortoise/)
# ---------------------------------------------------------------------------

def _tort_gn(state, key):
    return {"scale": state[key + ".weight"], "bias": state[key + ".bias"]}


def _tort_conv(state, key):
    p = {"kernel": conv1d_kernel(state[key + ".weight"])}
    if key + ".bias" in state:
        p["bias"] = state[key + ".bias"]
    return p


def _tort_attn_block(state, key):
    p = {
        "norm": _tort_gn(state, key + ".norm"),
        "qkv": _tort_conv(state, key + ".qkv"),
        "proj_out": _tort_conv(state, key + ".proj_out"),
    }
    rel = key + ".relative_pos_embeddings.relative_attention_bias.weight"
    if rel in state:
        p["relative_attention_bias"] = state[rel]
    return p


def _tort_resblock(state, key):
    p = {
        "in_norm": _tort_gn(state, key + ".in_layers.0"),
        "in_conv": _tort_conv(state, key + ".in_layers.2"),
        "emb": {
            "kernel": linear_kernel(state[key + ".emb_layers.1.weight"]),
            "bias": state[key + ".emb_layers.1.bias"],
        },
        "out_norm": _tort_gn(state, key + ".out_layers.0"),
        "out_conv": _tort_conv(state, key + ".out_layers.3"),
    }
    if key + ".skip_connection.weight" in state:
        p["skip"] = _tort_conv(state, key + ".skip_connection")
    return p


def _tort_diff_layer(state, key):
    return {
        "resblk": _tort_resblock(state, key + ".resblk"),
        "attn": _tort_attn_block(state, key + ".attn"),
    }


def convert_diffusion_decoder(state, num_layers=10) -> Dict[str, Any]:
    """Reference ``DiffusionTts`` state dict → flax params for
    :class:`tts_tpu.models.tortoise.layers.DiffusionTts` (latent path;
    the code_embedding/code_converter training-only branch and the
    mel_head code-pred head are not carried)."""
    p: Dict[str, Any] = {
        "inp_block": _tort_conv(state, "inp_block"),
        "time_embed_0": {
            "kernel": linear_kernel(state["time_embed.0.weight"]),
            "bias": state["time_embed.0.bias"],
        },
        "time_embed_2": {
            "kernel": linear_kernel(state["time_embed.2.weight"]),
            "bias": state["time_embed.2.bias"],
        },
        "integrating_conv": _tort_conv(state, "integrating_conv"),
        "out_norm": _tort_gn(state, "out.0"),
        "out_conv": _tort_conv(state, "out.2"),
        "unconditioned_embedding": np.transpose(state["unconditioned_embedding"], (0, 2, 1)),
        "lat_conv": _tort_conv(state, "latent_conditioner.0"),
        "code_norm": _tort_gn(state, "code_norm"),
        "ctx_conv_0": _tort_conv(state, "contextual_embedder.0"),
        "ctx_conv_1": _tort_conv(state, "contextual_embedder.1"),
    }
    for i in range(4):
        p[f"lat_attn_{i}"] = _tort_attn_block(state, f"latent_conditioner.{i + 1}")
    for i in range(5):
        p[f"ctx_attn_{i}"] = _tort_attn_block(state, f"contextual_embedder.{i + 2}")
    for i in range(3):
        p[f"cti_{i}"] = _tort_diff_layer(state, f"conditioning_timestep_integrator.{i}")
    for i in range(num_layers):
        p[f"layer_{i}"] = _tort_diff_layer(state, f"layers.{i}")
    for i in range(3):
        p[f"post_{i}"] = _tort_resblock(state, f"layers.{num_layers + i}")
    return {"params": p}


def convert_clvp(state, depth=20) -> Dict[str, Any]:
    """Reference ``CLVP`` (use_xformers) state dict → flax params for
    :class:`tts_tpu.models.tortoise.layers.CLVP`."""

    def enc(prefix):
        e: Dict[str, Any] = {}
        for i in range(depth):
            a = f"{prefix}.transformer.attn_layers.layers.{2 * i}"
            f = f"{prefix}.transformer.attn_layers.layers.{2 * i + 1}"
            wrap_a = ".1.wrap" if a + ".1.wrap.to_q.weight" in state else ".1"
            wrap_f = ".1.wrap" if f + ".1.wrap.net.0.proj.weight" in state else ".1"
            e[f"attn_norm_{i}"] = {"g": state[a + ".0.0.g"]}
            e[f"attn_{i}"] = {
                "to_q": {"kernel": linear_kernel(state[a + wrap_a + ".to_q.weight"])},
                "to_k": {"kernel": linear_kernel(state[a + wrap_a + ".to_k.weight"])},
                "to_v": {"kernel": linear_kernel(state[a + wrap_a + ".to_v.weight"])},
                "to_out": {
                    "kernel": linear_kernel(state[a + wrap_a + ".to_out.weight"]),
                    "bias": state[a + wrap_a + ".to_out.bias"],
                },
            }
            e[f"ff_norm_{i}"] = {"g": state[f + ".0.0.g"]}
            e[f"ff_{i}"] = {
                "proj": {
                    "kernel": linear_kernel(state[f + wrap_f + ".net.0.proj.weight"]),
                    "bias": state[f + wrap_f + ".net.0.proj.bias"],
                },
                "out": {
                    "kernel": linear_kernel(state[f + wrap_f + ".net.3.weight"]),
                    "bias": state[f + wrap_f + ".net.3.bias"],
                },
            }
        e["final_norm"] = {
            "scale": state[prefix + ".transformer.norm.weight"],
            "bias": state[prefix + ".transformer.norm.bias"],
        }
        return e

    p = {
        "text_emb": {"embedding": state["text_emb.weight"]},
        "speech_emb": {"embedding": state["speech_emb.weight"]},
        "to_text_latent": {"kernel": linear_kernel(state["to_text_latent.weight"])},
        "to_speech_latent": {"kernel": linear_kernel(state["to_speech_latent.weight"])},
        "temperature": np.asarray(state["temperature"]).reshape(()),
        "text_transformer": enc("text_transformer"),
        "speech_transformer": enc("speech_transformer"),
    }
    return {"params": p}


def convert_unified_voice(state, layers=30) -> Dict[str, Any]:
    """Reference Tortoise ``UnifiedVoice`` state dict → flax params for
    :class:`tts_tpu.models.tortoise.model.UnifiedVoice` (HF GPT2 core via
    ``convert_gpt2_core``; arch_utils attention conditioning encoder)."""
    cond: Dict[str, Any] = {
        "init": {
            "kernel": state["conditioning_encoder.init.weight"][:, :, 0].T,
            "bias": state["conditioning_encoder.init.bias"],
        }
    }
    for i in range(6):
        cond[f"attn_{i}"] = _tort_attn_block(state, f"conditioning_encoder.attn.{i}")
    p: Dict[str, Any] = {
        "conditioning_encoder": cond,
        "text_embedding": {"embedding": state["text_embedding.weight"]},
        "mel_embedding": {"embedding": state["mel_embedding.weight"]},
        "text_pos_embedding": state["text_pos_embedding.emb.weight"],
        "mel_pos_embedding": state["mel_pos_embedding.emb.weight"],
        "gpt": convert_gpt2_core(state, prefix="gpt.", layers=layers),
        "final_norm": {"scale": state["final_norm.weight"], "bias": state["final_norm.bias"]},
        "text_head": {
            "kernel": linear_kernel(state["text_head.weight"]),
            "bias": state["text_head.bias"],
        },
        "mel_head": {
            "kernel": linear_kernel(state["mel_head.weight"]),
            "bias": state["mel_head.bias"],
        },
    }
    return {"params": p}


# ---------------------------------------------------------------------------
# Bark GPTs (reference TTS/tts/layers/bark/{model,model_fine}.py — NanoGPT)
# ---------------------------------------------------------------------------

def _bark_ln(state, key):
    p = {"scale": state[key + ".weight"]}
    if key + ".bias" in state and state[key + ".bias"] is not None:
        p["bias"] = state[key + ".bias"]
    return p


def _bark_linear(state, key):
    p = {"kernel": linear_kernel(state[key + ".weight"])}
    if key + ".bias" in state:
        p["bias"] = state[key + ".bias"]
    return p


def _bark_core(state, n_layer):
    core = {"ln_f": _bark_ln(state, "transformer.ln_f")}
    for i in range(n_layer):
        k = f"transformer.h.{i}"
        core[f"h_{i}"] = {
            "ln_1": _bark_ln(state, f"{k}.ln_1"),
            "ln_2": _bark_ln(state, f"{k}.ln_2"),
            "attn": {
                "c_attn": _bark_linear(state, f"{k}.attn.c_attn"),
                "c_proj": _bark_linear(state, f"{k}.attn.c_proj"),
            },
            "mlp_fc": _bark_linear(state, f"{k}.mlp.c_fc"),
            "mlp_proj": _bark_linear(state, f"{k}.mlp.c_proj"),
        }
    return core


def convert_bark_gpt(state, n_layer=12) -> Dict[str, Any]:
    """Reference Bark ``GPT`` (semantic/coarse) → flax params for
    :class:`tts_tpu.models.bark.model.BarkGPT`."""
    return {
        "params": {
            "wte": {"embedding": state["transformer.wte.weight"]},
            "wpe": state["transformer.wpe.weight"],
            "core": _bark_core(state, n_layer),
            "lm_head": {"kernel": linear_kernel(state["lm_head.weight"])},
        }
    }


def convert_bark_fine(state, n_layer=12, n_codes_total=8, n_codes_given=1) -> Dict[str, Any]:
    """Reference Bark ``FineGPT`` → flax params for ``BarkFineGPT``."""
    p: Dict[str, Any] = {
        "wpe": state["transformer.wpe.weight"],
        "core": _bark_core(state, n_layer),
    }
    for i in range(n_codes_total):
        p[f"wte_{i}"] = {"embedding": state[f"transformer.wtes.{i}.weight"]}
    for i in range(n_codes_total - n_codes_given):
        # flax heads are named by the codebook they predict (offset by
        # n_codes_given); the reference list starts at 0
        p[f"lm_head_{i + n_codes_given}"] = {
            "kernel": linear_kernel(state[f"lm_heads.{i}.weight"])
        }
    return {"params": p}


# ---------------------------------------------------------------------------
# GST + Capacitron (reference TTS/tts/layers/tacotron/gst_layers.py,
# capacitron_layers.py; used by the blizzard2013 capacitron zoo entries)
# ---------------------------------------------------------------------------

def _ref_encoder_convs(s, prefix):
    """Shared conv-stack mapping for both reference encoders: Conv2d +
    eval-mode BatchNorm2d folded to the flax ``folded`` affine."""
    p = {}
    for i in range(6):
        p[f"conv_{i}"] = {
            "kernel": conv2d_kernel(s[f"{prefix}convs.{i}.weight"]),
            "bias": s[f"{prefix}convs.{i}.bias"],
        }
        f = _fold_bn(s, f"{prefix}bns.{i}")
        p[f"scale_{i}"], p[f"shift_{i}"] = f["scale"], f["shift"]
    return p


def convert_gst(state, prefix="gst_layer."):
    """Reference ``GST`` (gst_layers.py:6) → flax ``layers.tacotron_v1.GST``
    params (use ``norm_type="folded"`` on the flax module)."""
    s = _subdict(state, prefix)
    enc = _ref_encoder_convs(s, "encoder.")
    enc["gru"] = _gru_cell(s, "encoder.recurrence")
    stl = {
        "style_tokens": s["style_token_layer.style_tokens"],
        "W_query": _dense(s, "style_token_layer.attention.W_query"),
        "W_key": _dense(s, "style_token_layer.attention.W_key"),
        "W_value": _dense(s, "style_token_layer.attention.W_value"),
    }
    return {"encoder": enc, "style_token_layer": stl}


def convert_capacitron(state, prefix="capacitron_vae_layer."):
    """Reference ``CapacitronVAE`` (capacitron_layers.py:11) → flax
    ``layers.capacitron.CapacitronVAE`` params (``norm_type="folded"``)."""
    s = _subdict(state, prefix)
    ref = _ref_encoder_convs(s, "encoder.")
    ref["lstm"] = _lstm_cell(s, "encoder.recurrence", "_l0")
    p = {
        "ref_encoder": ref,
        "post_mlp": {
            "hidden": _dense(s, "post_encoder_mlp.net.0"),
            "out": _dense(s, "post_encoder_mlp.net.2"),
        },
        "beta": np.asarray(s["beta"]).reshape(()),
    }
    if "text_summary_net.lstm.weight_ih_l0" in s:
        p["text_summary"] = {"lstm": _lstm_cell(s, "text_summary_net.lstm", "_l0")}
    return p
