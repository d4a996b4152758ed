"""Tacotron2 torch→flax conversion parity: compose the reference layers
(embedding → Encoder → Decoder → Postnet, exactly as
``TTS/tts/models/tacotron2.py`` wires them) and compare a teacher-forced
forward against our converted module."""

import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_parts():
    import importlib.machinery

    def stub(name, **attrs):
        m = sys.modules.setdefault(name, types.ModuleType(name))
        if getattr(m, "__spec__", None) is None:
            m.__spec__ = importlib.machinery.ModuleSpec(name, None)
        for k, v in attrs.items():
            if not hasattr(m, k):
                setattr(m, k, v)
        return m

    stub("coqpit", Coqpit=object)
    lib = stub("librosa", magphase=None, pyin=None, stft=None, istft=None,
               resample=None, load=None, to_mono=None)
    lib.effects = stub("librosa.effects", trim=None)
    lib.filters = stub("librosa.filters", mel=None)
    lib.feature = stub("librosa.feature", melspectrogram=None)
    stub("soundfile", read=None, write=None)
    stub("anyascii", anyascii=lambda s: s)
    from ref_stubs import ensure_reference_importable

    ensure_reference_importable()
    for key in list(sys.modules):
        if key == "TTS" or key.startswith("TTS."):
            if not str(getattr(sys.modules[key], "__file__", "")).startswith("/root/reference"):
                del sys.modules[key]
    from TTS.tts.layers.tacotron.tacotron2 import Decoder, Encoder, Postnet

    return Decoder, Encoder, Postnet


NUM_CHARS, R, T_IN, T_MEL, B = 30, 2, 9, 12, 2


@pytest.fixture(scope="module")
def ref_model(ref_parts):
    Decoder, Encoder, Postnet = ref_parts
    torch.manual_seed(0)

    class RefT2(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.embedding = torch.nn.Embedding(NUM_CHARS, 512)
            self.encoder = Encoder(512)
            self.decoder = Decoder(
                512, 80, R, "original", False, "softmax", "original", True,
                forward_attn=False, trans_agent=False, forward_attn_mask=False,
                location_attn=True, attn_K=5, separate_stopnet=True,
                max_decoder_steps=500,
            )
            self.postnet = Postnet(80)

    model = RefT2()
    model.eval()
    return model


def test_tacotron2_forward_parity(ref_model):
    from tts_tpu.models.tacotron2.model import Tacotron2Module
    from tts_tpu.utils.convert import convert_tacotron2

    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    params = convert_tacotron2(sd)

    rs = np.random.RandomState(0)
    text = rs.randint(1, NUM_CHARS, (B, T_IN))
    mel = rs.randn(B, T_MEL, 80).astype(np.float32)
    lens = torch.full((B,), T_IN)

    with torch.no_grad():
        emb = ref_model.embedding(torch.from_numpy(text)).transpose(1, 2)
        enc = ref_model.encoder(emb, lens)
        mask = torch.ones(B, T_IN, dtype=torch.bool)
        dec, aligns, stops = ref_model.decoder(enc, torch.from_numpy(mel), mask)
        post = ref_model.postnet(dec)
        ref_dec = (dec).transpose(1, 2).numpy()  # [B, T_mel, 80]
        ref_post = (dec + post).transpose(1, 2).numpy()
        ref_aligns = aligns.numpy()

    module = Tacotron2Module(num_chars=NUM_CHARS, r=R, norm_type="folded")
    out = module.apply(
        params,
        jnp.asarray(text),
        jnp.full((B,), T_IN),
        jnp.asarray(mel),
        jnp.full((B,), T_MEL),
    )
    np.testing.assert_allclose(
        np.asarray(out["decoder_outputs"]), ref_dec, atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["model_outputs"]), ref_post, atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["alignments"]), ref_aligns, atol=5e-4
    )


def test_tacotron2_dca_forward_parity(ref_parts):
    """Dynamic-convolution attention (tacotron2-DCA zoo entries,
    reference attentions.py:323)."""
    from tts_tpu.models.tacotron2.model import Tacotron2Module
    from tts_tpu.utils.convert import convert_tacotron2

    Decoder, Encoder, Postnet = ref_parts
    torch.manual_seed(1)

    class RefDCA(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.embedding = torch.nn.Embedding(NUM_CHARS, 512)
            self.encoder = Encoder(512)
            self.decoder = Decoder(
                512, 80, R, "dynamic_convolution", False, "softmax", "original", True,
                forward_attn=False, trans_agent=False, forward_attn_mask=False,
                location_attn=False, attn_K=5, separate_stopnet=True,
                max_decoder_steps=500,
            )
            self.postnet = Postnet(80)

    model = RefDCA()
    model.eval()

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert_tacotron2(sd)

    rs = np.random.RandomState(3)
    text = rs.randint(1, NUM_CHARS, (B, T_IN))
    mel = rs.randn(B, T_MEL, 80).astype(np.float32)
    lens = torch.full((B,), T_IN)

    with torch.no_grad():
        emb = model.embedding(torch.from_numpy(text)).transpose(1, 2)
        enc = model.encoder(emb, lens)
        mask = torch.ones(B, T_IN, dtype=torch.bool)
        dec, aligns, _ = model.decoder(enc, torch.from_numpy(mel), mask)
        ref_dec = dec.transpose(1, 2).numpy()
        ref_aligns = aligns.numpy()

    module = Tacotron2Module(
        num_chars=NUM_CHARS, r=R, norm_type="folded",
        attn_type="dynamic_convolution", location_attn=False,
    )
    out = module.apply(
        params,
        jnp.asarray(text),
        jnp.full((B,), T_IN),
        jnp.asarray(mel),
        jnp.full((B,), T_MEL),
    )
    np.testing.assert_allclose(np.asarray(out["decoder_outputs"]), ref_dec, atol=5e-4)
    np.testing.assert_allclose(np.asarray(out["alignments"]), ref_aligns, atol=5e-4)
