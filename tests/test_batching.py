"""Dynamic cross-request batching (tts_tpu/server/batching.py — TPU-native
throughput serving; the reference server only serializes)."""

import threading
import urllib.request
from types import SimpleNamespace

import jax.numpy as jnp
import numpy as np
import pytest

UP = 4  # fake model's waveform upsample factor


class _FakeTokenizer:
    def text_to_ids(self, text):
        return [ord(c) % 50 + 1 for c in text.strip()][:30]


class _FakeModel:
    """End-to-end waveform model contract: inference(params, x, xl, ...) →
    {"model_outputs": [B, T*up, 1], "y_lengths": [B]} with every sample of
    row i equal to its true text length (so cross-row mixups are visible)."""

    config = SimpleNamespace(pad_to_multiple_text=8)
    tokenizer = _FakeTokenizer()
    emits_waveform = True

    def inference(self, params, x, x_lengths, aux_input=None, max_frames=128, rng=None):
        B = x.shape[0]
        wav = jnp.broadcast_to(
            x_lengths[:, None, None].astype(jnp.float32), (B, max_frames * UP, 1)
        )
        return {"model_outputs": wav, "y_lengths": jnp.minimum(x_lengths * 2, max_frames)}


class _FakeSynthesizer:
    tts_model = None
    tts_params = {}
    vocoder_model = None
    output_sample_rate = 22050
    tts_config = None

    def __init__(self):
        self.tts_model = _FakeModel()

    def _resolve_speaker(self, speaker_name, speaker_wav):
        return (None, None)

    def _resolve_language(self, language_name):
        return None


def _expected(text):
    n = len(_FakeTokenizer().text_to_ids(text))
    # value per sample, wav length (+ the serial path's 10000-sample
    # inter-sentence silence appended after each single-sentence text)
    return n, n * 2 * UP + 10000


def test_single_request_roundtrip():
    from tts_tpu.server.batching import DynamicBatcher

    b = DynamicBatcher(_FakeSynthesizer(), max_batch=4, window_ms=5)
    try:
        wav = np.asarray(b.tts("hello there"))
        val, length = _expected("hello there")
        assert len(wav) == length
        assert np.allclose(wav[:-10000], val)
        assert np.allclose(wav[-10000:], 0.0)  # inter-sentence silence
    finally:
        b.close()


def test_multi_sentence_requests_split_like_serial():
    """long texts are split per sentence (never one capped utterance)."""
    from tts_tpu.server.batching import DynamicBatcher

    b = DynamicBatcher(_FakeSynthesizer(), max_batch=8, window_ms=5)
    try:
        wav = np.asarray(b.tts("First sentence. And a second one."))
        v1, l1 = _expected("First sentence.")
        v2, l2 = _expected("And a second one.")
        assert len(wav) == l1 + l2
        assert np.allclose(wav[: l1 - 10000], v1)
        assert np.allclose(wav[l1 : l1 + (l2 - 10000)], v2)
    finally:
        b.close()


def test_concurrent_requests_batch_and_unmix():
    from tts_tpu.server.batching import DynamicBatcher

    b = DynamicBatcher(_FakeSynthesizer(), max_batch=8, window_ms=50)
    sizes = []
    orig = b._dispatch
    b._dispatch = lambda batch: (sizes.append(len(batch)), orig(batch))[1]

    texts = ["a short one", "a somewhat longer request here", "mid size text",
             "x", "five five five five", "yet another sentence"]
    results = {}

    def worker(t):
        results[t] = np.asarray(b.tts(t))

    threads = [threading.Thread(target=worker, args=(t,)) for t in texts]
    try:
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=60)
        for t in texts:
            val, length = _expected(t)
            assert len(results[t]) == length, t
            assert np.allclose(results[t][:-10000], val), t  # no cross-request mixing
        assert sum(sizes) == len(texts)
        assert max(sizes) > 1, f"never batched: {sizes}"
    finally:
        b.close()


def test_batcher_rejects_synthesize_models():
    from tts_tpu.server.batching import DynamicBatcher

    s = _FakeSynthesizer()
    s.tts_model.synthesize = lambda **k: None
    with pytest.raises(ValueError, match="generic-inference"):
        DynamicBatcher(s)
    del s.tts_model.synthesize


def test_server_with_batching(tmp_path):
    from tts_tpu.server.server import create_server

    synth = _FakeSynthesizer()
    srv = create_server(synth, port=0, max_batch=4, batch_window_ms=30)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"

    bodies = {}

    def fetch(text):
        q = urllib.parse.quote(text)
        with urllib.request.urlopen(f"{base}/api/tts?text={q}", timeout=30) as r:
            bodies[text] = r.read()

    texts = ["first request", "the second somewhat longer request", "third"]
    threads = [threading.Thread(target=fetch, args=(t,)) for t in texts]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=60)
    srv.shutdown()
    for t in texts:
        body = bodies[t]
        assert body[:4] == b"RIFF"
        pcm = np.frombuffer(body[44:], dtype="<i2")
        _, length = _expected(t)
        assert len(pcm) == length, t


def test_api_tts_stream_passthrough():
    """TTS.tts_stream forwards to Synthesizer.tts_stream."""
    from tts_tpu.api import TTS

    t = TTS()
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="No model loaded"):
        t.tts_stream("hi")

    class _S:
        def tts_stream(self, text, **kw):
            yield np.zeros(10, np.float32)

    t.synthesizer = _S()
    chunks = list(t.tts_stream("hi", language="en"))
    assert len(chunks) == 1 and len(chunks[0]) == 10
