"""VITS torch→flax conversion parity: run reference submodules and our
converted flax modules on identical inputs."""

import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_vits():
    def stub(name, **attrs):
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules.setdefault(name, m)
        return sys.modules[name]

    stub("coqpit", Coqpit=object)
    lib = stub("librosa", magphase=None, pyin=None, stft=None, istft=None, resample=None,
               load=None, to_mono=None)
    lib.effects = stub("librosa.effects", trim=None)
    lib.filters = stub("librosa.filters", mel=None)
    lib.feature = stub("librosa.feature", melspectrogram=None)
    stub("soundfile", read=None, write=None)
    stub("anyascii", anyascii=lambda s: s)
    from ref_stubs import ensure_reference_importable

    ensure_reference_importable()
    # test_convert.py registers bare-module TTS/TTS.utils stubs; purge any
    # that don't come from the real reference tree so package imports work
    for key in list(sys.modules):
        if key == "TTS" or key.startswith("TTS."):
            if not str(getattr(sys.modules[key], "__file__", "")).startswith("/root/reference"):
                del sys.modules[key]
    from TTS.tts.layers.vits import networks

    return networks


def test_text_encoder_parity(ref_vits):
    from tts_tpu.models.vits.modules import TextEncoder
    from tts_tpu.utils.convert import convert_vits_text_encoder

    torch.manual_seed(0)
    tm = ref_vits.TextEncoder(40, 16, 16, 32, 2, 2, 3, 0.0)
    tm.eval()
    x = np.random.RandomState(0).randint(1, 40, (2, 11))
    xl = np.array([11, 8])
    with torch.no_grad():
        _, m_t, logs_t, mask_t = tm(torch.from_numpy(x), torch.from_numpy(xl))

    state = {k: v.numpy() for k, v in tm.state_dict().items()}
    params = convert_vits_text_encoder(state, num_layers=2)

    jm = TextEncoder(
        n_vocab=40, out_channels=16, hidden_channels=16, hidden_channels_ffn=32,
        num_heads=2, num_layers=2, kernel_size=3, dropout_p=0.0,
    )
    _, m_j, logs_j, _ = jm.apply(params, jnp.asarray(x), jnp.asarray(xl))
    np.testing.assert_allclose(
        np.asarray(m_j), m_t.numpy().transpose(0, 2, 1), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(logs_j), logs_t.numpy().transpose(0, 2, 1), atol=2e-4
    )


def test_posterior_encoder_parity(ref_vits):
    from tts_tpu.models.vits.modules import PosteriorEncoder
    from tts_tpu.utils.convert import convert_vits_posterior

    torch.manual_seed(0)
    tm = ref_vits.PosteriorEncoder(33, 16, 16, 5, 1, 4)
    tm.eval()
    spec = np.random.RandomState(0).randn(2, 33, 20).astype(np.float32)  # [B,C,T]
    sl = np.array([20, 15])
    with torch.no_grad():
        _, m_t, logs_t, _ = tm(torch.from_numpy(spec), torch.from_numpy(sl))

    state = {k: v.numpy() for k, v in tm.state_dict().items()}
    params = convert_vits_posterior(state, num_layers=4)
    jm = PosteriorEncoder(
        in_channels=33, out_channels=16, hidden_channels=16, kernel_size=5,
        dilation_rate=1, num_layers=4,
    )
    _, m_j, logs_j, _ = jm.apply(
        params, jnp.asarray(spec.transpose(0, 2, 1)), jnp.asarray(sl),
        rngs={"noise": jax.random.PRNGKey(0)},
    )
    np.testing.assert_allclose(np.asarray(m_j), m_t.numpy().transpose(0, 2, 1), atol=2e-4)
    np.testing.assert_allclose(np.asarray(logs_j), logs_t.numpy().transpose(0, 2, 1), atol=2e-4)


def test_flow_parity(ref_vits):
    from tts_tpu.models.vits.modules import ResidualCouplingBlocks
    from tts_tpu.utils.convert import convert_vits_flow

    torch.manual_seed(0)
    tm = ref_vits.ResidualCouplingBlocks(16, 16, 5, 1, 2, num_flows=2)
    tm.eval()
    z = np.random.RandomState(0).randn(2, 16, 12).astype(np.float32)
    mask_t = torch.ones(2, 1, 12)
    with torch.no_grad():
        fwd_t = tm(torch.from_numpy(z), mask_t).numpy()
        rev_t = tm(torch.from_numpy(z), mask_t, reverse=True).numpy()

    state = {k: v.numpy() for k, v in tm.state_dict().items()}
    params = convert_vits_flow(state, num_flows=2, num_layers=2)
    jm = ResidualCouplingBlocks(
        channels=16, hidden_channels=16, kernel_size=5, dilation_rate=1,
        num_layers=2, num_flows=2,
    )
    mask_j = jnp.ones((2, 12, 1))
    fwd_j = jm.apply(params, jnp.asarray(z.transpose(0, 2, 1)), mask_j)
    rev_j = jm.apply(params, jnp.asarray(z.transpose(0, 2, 1)), mask_j, reverse=True)
    np.testing.assert_allclose(np.asarray(fwd_j), fwd_t.transpose(0, 2, 1), atol=2e-4)
    np.testing.assert_allclose(np.asarray(rev_j), rev_t.transpose(0, 2, 1), atol=2e-4)


def test_sdp_inference_parity(ref_vits):
    """SDP reverse path with zero noise is deterministic — exact comparison."""
    from TTS.tts.layers.vits.stochastic_duration_predictor import (
        StochasticDurationPredictor as TorchSDP,
    )

    from tts_tpu.models.vits.modules import StochasticDurationPredictor
    from tts_tpu.utils.convert import convert_vits_sdp

    torch.manual_seed(0)
    tm = TorchSDP(16, 16, 3, 0.0, 2)
    tm.eval()
    x = np.random.RandomState(0).randn(2, 16, 9).astype(np.float32)
    mask = torch.ones(2, 1, 9)
    with torch.no_grad():
        logw_t = tm(torch.from_numpy(x), mask, reverse=True, noise_scale=0.0).numpy()

    state = {k: v.numpy() for k, v in tm.state_dict().items()}
    params = convert_vits_sdp(state, num_flows=2)
    jm = StochasticDurationPredictor(
        in_channels=16, hidden_channels=16, kernel_size=3, dropout_p=0.0, num_flows=2,
    )
    logw_j = jm.apply(
        params, jnp.asarray(x.transpose(0, 2, 1)), jnp.ones((2, 9, 1)),
        reverse=True, noise_scale=0.0, rngs={"noise": jax.random.PRNGKey(0)},
    )
    np.testing.assert_allclose(
        np.asarray(logw_j)[:, :, 0], logw_t[:, 0, :], atol=5e-4
    )


def test_glow_decoder_parity(ref_vits):
    """Glow flow decoder: forward+reverse parity with the reference."""
    from TTS.tts.layers.glow_tts.decoder import Decoder as TorchGlowDecoder

    from tts_tpu.layers.glow import GlowDecoder
    from tts_tpu.utils.convert import convert_glow_decoder

    torch.manual_seed(0)
    tm = TorchGlowDecoder(20, 24, 5, 1, num_flow_blocks=2, num_coupling_layers=2)
    tm.eval()
    tm.store_inverse()
    y = np.random.RandomState(0).randn(1, 20, 16).astype(np.float32)
    mask = torch.ones(1, 1, 8)
    with torch.no_grad():
        fwd_t, logdet_t = tm(torch.from_numpy(y), torch.ones(1, 1, 16))
        rev_t, _ = tm(torch.from_numpy(y), torch.ones(1, 1, 16), reverse=True)

    state = {k: v.numpy() for k, v in tm.state_dict().items()}
    params = {"params": convert_glow_decoder(state, "", 2, 2)}
    jm = GlowDecoder(
        in_channels=20, hidden_channels=24, kernel_size=5, dilation_rate=1,
        num_flow_blocks=2, num_coupling_layers=2,
    )
    y_j = jnp.asarray(y.transpose(0, 2, 1))
    fwd_j, logdet_j, _ = jm.apply(params, y_j, jnp.ones((1, 16, 1)))
    rev_j, _, _ = jm.apply(params, y_j, jnp.ones((1, 16, 1)), reverse=True)
    np.testing.assert_allclose(np.asarray(fwd_j), fwd_t.numpy().transpose(0, 2, 1), atol=3e-4)
    np.testing.assert_allclose(np.asarray(rev_j), rev_t.numpy().transpose(0, 2, 1), atol=3e-4)
    np.testing.assert_allclose(float(jnp.sum(logdet_j)), float(logdet_t.sum()), atol=1e-3)


def test_fairseq_rehash_mapping():
    """fairseq MMS key layout → coqui layout (reference fairseq.py:4)."""
    import numpy as np

    from tts_tpu.utils.convert import rehash_fairseq_vits

    src = {
        "enc_p.emb.weight": 0, "dec.conv_pre.weight": 1, "enc_q.pre.weight": 2,
        "flow.flows.0.pre.weight": 3, "flow.flows.2.pre.weight": 4,
        "flow.flows.4.pre.weight": 5, "flow.flows.6.pre.weight": 6,
        "dp.flows.0.m": 7, "dp.flows.0.logs": 8, "dp.flows.1.pre.weight": 9,
        "dp.flows.7.pre.weight": 10, "dp.post_flows.0.m": 11,
        "dp.post_flows.5.pre.weight": 12, "dp.pre.weight": 13,
        "emb_g.weight": 14,
    }
    out = rehash_fairseq_vits(src)
    assert out["text_encoder.emb.weight"] == 0
    assert out["waveform_decoder.conv_pre.weight"] == 1
    assert out["posterior_encoder.pre.weight"] == 2
    assert out["flow.flows.0.pre.weight"] == 3
    assert out["flow.flows.1.pre.weight"] == 4
    assert out["flow.flows.3.pre.weight"] == 6
    assert out["duration_predictor.flows.0.translation"] == 7
    assert out["duration_predictor.flows.0.log_scale"] == 8
    assert out["duration_predictor.flows.1.pre.weight"] == 9
    assert out["duration_predictor.flows.4.pre.weight"] == 10
    assert out["duration_predictor.post_flows.0.translation"] == 11
    assert out["duration_predictor.post_flows.3.pre.weight"] == 12
    assert out["duration_predictor.pre.weight"] == 13
    assert out["emb_g.weight"] == 14
    assert len(out) == len(src)


def test_fairseq_vocab(tmp_path):
    from tts_tpu.text.characters import FairseqVocab

    vf = tmp_path / "vocab.txt"
    vf.write_text("_\na\nb\nc\n \n", encoding="utf-8")
    v = FairseqVocab(str(vf))
    assert v.num_chars == 5
    assert v.blank == "_"
    assert v.pad == " "
    assert v.char_to_id("b") == 2
