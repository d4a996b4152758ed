"""WavLM converter parity: reference torch WavLM (randomly initialized at
small dims) vs the flax port, both base-style (post-LN, no rel-pos) and
WavLM-Large-style (pre-LN, gated relative position bias, layer-norm
extractor) configs.  Reference: TTS/vc/modules/freevc/wavlm/."""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

from ref_stubs import install_reference_stubs


def _ref_wavlm(cfg_overrides):
    install_reference_stubs()
    import torch

    from TTS.vc.modules.freevc.wavlm.wavlm import WavLM as RefWavLM, WavLMConfig as RefCfg

    cfg = RefCfg()
    # tiny conv stack (still 320x downsample semantics, fewer taps)
    base = {
        "encoder_layers": 2,
        "encoder_embed_dim": 32,
        "encoder_ffn_embed_dim": 64,
        "encoder_attention_heads": 4,
        "conv_feature_layers": "[(24,10,5)] + [(24,3,2)] * 2",
        "conv_pos": 16,
        "conv_pos_groups": 4,
        "dropout": 0.0,
        "attention_dropout": 0.0,
        "activation_dropout": 0.0,
        "dropout_input": 0.0,
        "dropout_features": 0.0,
        "encoder_layerdrop": 0.0,
    }
    base.update(cfg_overrides)
    cfg.update(base)
    torch.manual_seed(0)
    model = RefWavLM(cfg)
    model.eval()
    return model, cfg


@pytest.mark.parametrize(
    "overrides",
    [
        {},  # base style: default extractor, post-LN, no rel-pos bias
        {  # WavLM-Large style
            "extractor_mode": "layer_norm",
            "layer_norm_first": True,
            "relative_position_embedding": True,
            "num_buckets": 16,
            "max_distance": 64,
            "gru_rel_pos": True,
        },
    ],
    ids=["base", "large-style"],
)
def test_wavlm_parity(overrides):
    import torch

    from tts_tpu.utils.convert import convert_wavlm_state
    from tts_tpu.vc.modules.wavlm import WavLM, WavLMConfig

    ref, ref_cfg = _ref_wavlm(overrides)
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    cfg = WavLMConfig.from_checkpoint_cfg(ref_cfg.__dict__)
    params = convert_wavlm_state(state, cfg)
    model = WavLM(cfg)

    wav = np.random.RandomState(0).randn(2, 3200).astype(np.float32)
    with torch.no_grad():
        want, _ = ref.extract_features(torch.from_numpy(wav))
    got = model.apply(params, wav)

    assert got.shape == tuple(want.shape)
    diff = np.abs(np.asarray(got) - want.numpy()).max()
    assert diff < 5e-4, f"WavLM parity diff {diff}"
