"""Tortoise wav2vec redaction tests
(reference ``TTS/tts/layers/tortoise/wav2vec_alignment.py``)."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/repo/tests")
from ref_stubs import import_reference, install_reference_stubs  # noqa: E402

install_reference_stubs()

import jax.numpy as jnp  # noqa: E402

from tts_tpu.models.tortoise.wav2vec_alignment import (  # noqa: E402
    Wav2VecAlignment,
    max_alignment,
)


def test_max_alignment_matches_reference():
    ref_mod = import_reference("TTS.tts.layers.tortoise.wav2vec_alignment")
    cases = [
        ("hello world", "xhelzlo wrld"),
        ("abc", ""),
        ("abc", "abc"),
        ("the quick fox", "thequick fx"),
        ("aaa", "aba"),
    ]
    for s1, s2 in cases:
        assert max_alignment(s1, s2) == ref_mod.max_alignment(s1, s2), (s1, s2)


def test_wav2vec2_ctc_conversion_parity():
    from transformers import Wav2Vec2Config, Wav2Vec2ForCTC

    from tts_tpu.models.tortoise.wav2vec_alignment import (
        Wav2Vec2CTC,
        convert_hf_wav2vec2_ctc,
    )
    from tts_tpu.vc.modules.wavlm import WavLMConfig

    torch.manual_seed(0)
    cfg = Wav2Vec2Config(
        hidden_size=96, num_hidden_layers=3, num_attention_heads=4,
        intermediate_size=192, vocab_size=40,
        conv_dim=(48, 48, 48), conv_kernel=(10, 3, 2), conv_stride=(5, 2, 2),
        conv_bias=True, num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        do_stable_layer_norm=True, feat_extract_norm="layer",
        feat_proj_dropout=0.0, hidden_dropout=0.0, attention_dropout=0.0,
        activation_dropout=0.0, final_dropout=0.0, layerdrop=0.0,
        layer_norm_eps=1e-5, feat_extract_activation="gelu", hidden_act="gelu",
    )
    m = Wav2Vec2ForCTC(cfg)
    m.eval()

    wav = np.random.RandomState(1).randn(1, 800).astype(np.float32) * 0.1
    with torch.no_grad():
        ref = m(torch.from_numpy(wav)).logits.numpy()

    flax_cfg = WavLMConfig(
        extractor_mode="layer_norm",
        encoder_layers=cfg.num_hidden_layers,
        encoder_embed_dim=cfg.hidden_size,
        encoder_ffn_embed_dim=cfg.intermediate_size,
        encoder_attention_heads=cfg.num_attention_heads,
        layer_norm_first=True,
        conv_feature_layers=tuple(zip(cfg.conv_dim, cfg.conv_kernel, cfg.conv_stride)),
        conv_bias=True,
        conv_pos=cfg.num_conv_pos_embeddings,
        conv_pos_groups=cfg.num_conv_pos_embedding_groups,
        relative_position_embedding=False,
    )
    params = convert_hf_wav2vec2_ctc({k: v.numpy() for k, v in m.state_dict().items()})
    jm = Wav2Vec2CTC(flax_cfg, vocab_size=cfg.vocab_size)
    got = np.asarray(jm.apply(params, jnp.asarray(wav)))
    assert got.shape == ref.shape, (got.shape, ref.shape)
    np.testing.assert_allclose(got, ref, atol=5e-4)


def _synthetic_aligner(text, sr=1600, spf=160):
    """Aligner whose logits spell out the text, one char per frame."""
    vocab = {"<pad>": 0}
    for c in "abcdefghijklmnopqrstuvwxyz ,.!?'":
        vocab[c] = len(vocab)

    chars = [c for c in text.lower() if c in vocab]
    frames = len(chars)
    V = len(vocab)

    def logits_fn(wav):
        out = np.full((frames, V), -10.0, np.float32)
        for i, c in enumerate(chars):
            out[i, vocab[c]] = 10.0
        return out

    audio = np.random.RandomState(0).randn(frames * spf).astype(np.float32)
    return Wav2VecAlignment(logits_fn, vocab), audio


def test_align_and_redact():
    text = "keep this [cut this] and keep that"
    bare = "keep this cut this and keep that"
    aligner, audio = _synthetic_aligner(bare, spf=160)

    # align: monotonically increasing sample offsets, one per character
    offsets = aligner.align(audio, bare, audio_sample_rate=16000)
    assert len(offsets) == len(bare)
    assert all(b >= a for a, b in zip(offsets, offsets[1:]))

    redacted = aligner.redact(audio, text, audio_sample_rate=16000)
    assert len(redacted) < len(audio)  # the bracketed span was cut
    assert len(redacted) > len(audio) // 2

    # no brackets → untouched
    same = aligner.redact(audio, bare, audio_sample_rate=16000)
    assert same is audio


def test_align_matches_reference_loop():
    """Behavioral equivalence of our vectorized align/redact against the
    reference's frame-popping loop (wav2vec_alignment.py:55-150), driven by
    the same synthetic logits."""
    import types

    ref_mod = import_reference("TTS.tts.layers.tortoise.wav2vec_alignment")

    vocab = {"~": 0}
    for i, c in enumerate(" abcdefghijklmnopqrstuvwxyz", start=1):
        vocab[c] = i
    inv = {v: k for k, v in vocab.items()}

    bare = "keep this cut this and keep that"
    spf = 160
    # synthetic frame tokens: each char twice, pad frames between words,
    # plus noise frames that match nothing
    ids = []
    for ch in bare:
        ids += [vocab[ch], vocab[ch], 0]
    ids += [0] * 7
    frames = len(ids)
    logits = np.zeros((frames, len(vocab)), np.float32)
    logits[np.arange(frames), ids] = 5.0

    audio_np = np.random.RandomState(0).randn(frames * spf).astype(np.float32)

    ours = Wav2VecAlignment(lambda wav: logits, vocab)
    got = ours.align(audio_np, bare, audio_sample_rate=16000)

    # reference oracle: bypass __init__ (it downloads weights), patch the
    # pieces align() touches
    ref = ref_mod.Wav2VecAlignment.__new__(ref_mod.Wav2VecAlignment)
    ref.device = "cpu"

    class _Model:
        def to(self, d):
            return self

        def cpu(self):
            return self

        def __call__(self, x):
            return types.SimpleNamespace(logits=torch.from_numpy(logits[None]))

    class _Tok:
        def encode(self, text):
            return [vocab.get(c, 0) for c in text]

        def decode(self, ids_):
            out, prev = [], None
            for t in ids_:
                if t != prev and t != 0:
                    out.append(inv[int(t)])
                prev = t
            return "".join(out)

    ref.model = _Model()
    ref.tokenizer = _Tok()
    import torchaudio as ta_stub

    ta_stub.functional = types.SimpleNamespace(resample=lambda a, s, t: a)

    want = ref.align(torch.from_numpy(audio_np), bare, audio_sample_rate=16000)
    assert got == [int(w) for w in want], (got[:8], [int(w) for w in want][:8])

    # redact equivalence
    text = "keep this [cut this] and keep that"
    got_r = ours.redact(audio_np, text, audio_sample_rate=16000)
    want_r = ref.redact(torch.from_numpy(audio_np)[None], text, audio_sample_rate=16000)
    np.testing.assert_array_equal(got_r, want_r[0].numpy())
