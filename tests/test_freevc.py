"""FreeVC end-to-end: raw source wav → WavLM content features → flow →
HiFiGAN → converted wav (reference ``tests/vc_tests/test_freevc.py``).
Uses a tiny random-weight WavLM as the content extractor (same code path
as WavLM-Large, small dims)."""

import os

import numpy as np
import pytest
import scipy.io.wavfile
from helpers import fast_params


def _write_wav(path, seconds=0.5, sr=16000, seed=0):
    rng = np.random.RandomState(seed)
    t = np.arange(int(seconds * sr)) / sr
    wav = 0.3 * np.sin(2 * np.pi * 220 * t) + 0.05 * rng.randn(len(t))
    scipy.io.wavfile.write(path, sr, (wav * 32767).astype(np.int16))
    return path


def test_freevc_voice_conversion_end_to_end(tmp_path):
    import jax

    from tts_tpu.vc.configs import FreeVCConfig
    from tts_tpu.vc.models.freevc import FreeVC
    from tts_tpu.vc.modules.wavlm import WavLM, WavLMConfig

    cfg = FreeVCConfig()
    a = cfg.model_args
    a.ssl_dim = 32
    a.inter_channels = 16
    a.hidden_channels = 16
    a.filter_channels = 32
    a.n_layers_q = 1
    a.n_flows = 1
    a.gin_channels = 16
    a.upsample_rates = [10, 4, 2]
    a.upsample_kernel_sizes = [16, 8, 4]
    a.upsample_initial_channel = 32
    a.resblock_kernel_sizes = [3]
    a.resblock_dilation_sizes = [[1, 3]]

    model = FreeVC(cfg)
    params = fast_params(model.init_params, jax.random.PRNGKey(0))
    model.set_params(params)

    # tiny WavLM as the content front-end (the real path uses WavLM-Large)
    wl_cfg = WavLMConfig(
        encoder_layers=1, encoder_embed_dim=32, encoder_ffn_embed_dim=32,
        encoder_attention_heads=2,
        conv_feature_layers=((16, 10, 5), (16, 4, 4), (32, 4, 4), (32, 2, 2), (32, 2, 2)),
        conv_pos=8, conv_pos_groups=2,
    )
    wl = WavLM(wl_cfg)
    wl_params = wl.init(jax.random.PRNGKey(1), np.zeros((1, 1600), np.float32))
    model.content_extractor = jax.jit(lambda w: wl.apply(wl_params, w))

    src = _write_wav(str(tmp_path / "src.wav"), seed=0)
    tgt = _write_wav(str(tmp_path / "tgt.wav"), seed=1)
    out = model.voice_conversion_from_files(src, tgt)

    assert out.ndim == 1 and len(out) > 1000
    assert np.isfinite(out).all()
    assert np.abs(out).max() > 0


def test_load_wavlm_converts_torch_checkpoint(tmp_path):
    """load_wavlm: torch .pt → one-time msgpack conversion → jitted extract."""
    import sys

    import torch

    sys.path.insert(0, "/root/repo")
    from ref_stubs import install_reference_stubs

    install_reference_stubs()
    from TTS.vc.modules.freevc.wavlm.wavlm import WavLM as RefWavLM, WavLMConfig as RefCfg

    cfg_dict = {
        "encoder_layers": 1, "encoder_embed_dim": 16, "encoder_ffn_embed_dim": 32,
        "encoder_attention_heads": 2,
        "conv_feature_layers": "[(8,10,5)] + [(16,4,4)]",
        "conv_pos": 8, "conv_pos_groups": 2,
        "dropout": 0.0, "attention_dropout": 0.0, "activation_dropout": 0.0,
        "dropout_input": 0.0, "dropout_features": 0.0, "encoder_layerdrop": 0.0,
    }
    rcfg = RefCfg()
    rcfg.update(cfg_dict)
    torch.manual_seed(0)
    ref = RefWavLM(rcfg).eval()
    pt = str(tmp_path / "WavLM-Tiny.pt")
    torch.save({"cfg": rcfg.__dict__, "model": ref.state_dict()}, pt)

    from tts_tpu.vc.modules.wavlm import load_wavlm

    extract = load_wavlm(pt)
    wav = np.random.RandomState(0).randn(1, 1600).astype(np.float32)
    got = np.asarray(extract(wav))
    with torch.no_grad():
        want, _ = ref.extract_features(torch.from_numpy(wav))
    assert np.abs(got - want.numpy()).max() < 5e-4
    assert os.path.exists(str(tmp_path / "WavLM-Tiny.msgpack"))
