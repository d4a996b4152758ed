"""Overflow torch→flax conversion parity: the reference eval-mode forward
(log-space HMM forward algorithm + glow post-flow) vs the converted flax
module on identical inputs (reference anchor ``TTS/tts/models/overflow.py:24``)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/repo/tests")
from ref_stubs import install_reference_stubs, np_state  # noqa: E402

DIMS = dict(
    num_chars=40, out_channels=20, encoder_in_out_features=32,
    state_per_phone=2, prenet_dim=16, prenet_n_layers=2, memory_rnn_dim=48,
    outputnet_size=[32, 32], prenet_dropout=0.0,
    hidden_channels_dec=24, num_flow_blocks_dec=2, num_block_layers=2,
    dropout_p_dec=0.0,
)


@pytest.fixture(scope="module")
def ref_overflow():
    install_reference_stubs()
    from TTS.tts.configs.overflow_config import OverflowConfig as RefCfg
    from TTS.tts.models.overflow import Overflow as RefOverflow

    torch.manual_seed(0)
    cfg = RefCfg(**DIMS)
    m = RefOverflow(cfg)
    m.eval()
    m.update_mean_std({"mean": 0.5, "std": 2.0})
    # data-dependent actnorm init must be OFF so weights are used as stored
    for f in m.decoder.glow_decoder.flows:
        if hasattr(f, "initialized"):
            f.initialized = True
        if hasattr(f, "set_ddi"):
            f.set_ddi(False)
    return m


def test_overflow_forward_parity(ref_overflow):
    from tts_tpu.models.overflow.config import OverflowConfig
    from tts_tpu.models.overflow.model import Overflow
    from tts_tpu.utils.convert import convert_overflow

    tm = ref_overflow
    rng = np.random.RandomState(0)
    text = np.array([[3, 7, 11, 2, 9]], dtype=np.int64)
    tl = np.array([5])
    T = 12
    mels = rng.randn(1, T, 20).astype(np.float32)  # overflow forward takes [B, T, C]
    ml = np.array([T])

    with torch.no_grad():
        out_t = tm(
            torch.from_numpy(text), torch.from_numpy(tl),
            torch.from_numpy(mels), torch.from_numpy(ml),
        )
    logp_t = out_t["log_probs"].numpy()

    cfg = OverflowConfig()
    for k, v in DIMS.items():
        setattr(cfg, k, v)
    cfg.norm_type = "folded"
    cfg.mel_statistics_mean = 0.5
    cfg.mel_statistics_std = 2.0
    jm = Overflow(cfg)
    params = convert_overflow(np_state(tm), cfg)
    out_j = jm.forward(
        params,
        {
            "text_input": jnp.asarray(text, jnp.int32),
            "text_lengths": jnp.asarray(tl, jnp.int32),
            "mel_input": jnp.asarray(mels),
            "mel_lengths": jnp.asarray(ml, jnp.int32),
        },
        train=False,
    )
    logp_j = np.asarray(out_j["log_probs"])
    np.testing.assert_allclose(logp_j, logp_t, rtol=2e-4, atol=2e-3)
