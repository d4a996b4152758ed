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


# ---------------------------------------------------------------------------
# duration-aware decode grouping (round 5): mixed batches split into per-
# bucket groups so short requests stop paying the longest request's padding
# ---------------------------------------------------------------------------


def test_plan_decode_groups_single_group_when_uniform():
    from tts_tpu.utils.synthesis import plan_decode_groups

    groups = plan_decode_groups([500, 480, 505, 490], multiple=32, cap=4096)
    assert len(groups) == 1
    idx, bucket = groups[0]
    assert sorted(idx) == [0, 1, 2, 3]
    assert bucket == 512


def test_plan_decode_groups_splits_bimodal():
    from tts_tpu.utils.synthesis import plan_decode_groups

    y = [100, 900, 110, 920, 95, 910]  # indices 0,2,4 short; 1,3,5 long
    groups = plan_decode_groups(y, multiple=32, cap=4096)
    assert len(groups) == 2
    (i_short, b_short), (i_long, b_long) = groups
    assert sorted(i_short) == [0, 2, 4] and b_short == 128
    assert sorted(i_long) == [1, 3, 5] and b_long == 928

    # splitting must beat the one-bucket cost by more than the overhead
    single = 928 * 6
    split = 128 * 3 + 928 * 3 + 512
    assert split < single


def test_plan_decode_groups_respects_cap_and_max_groups():
    from tts_tpu.utils.synthesis import plan_decode_groups

    groups = plan_decode_groups([10, 5000, 10_000, 20], multiple=32, cap=512, max_groups=2)
    assert len(groups) <= 2
    assert all(b <= 512 for _, b in groups)
    covered = sorted(i for idx, _ in groups for i in idx)
    assert covered == [0, 1, 2, 3]


class _FakeDurModel(_FakeModel):
    """Fake with a duration predictor: short texts predict 32 frames, long
    texts 3000 (capped to the frame budget), forcing a two-group plan."""

    def infer_durations(self, params, x, x_lengths, aux_input=None, rng=None):
        return jnp.where(x_lengths > 15, 3000, 32)


def test_grouped_dispatch_unmixes_and_buckets():
    from tts_tpu.server.batching import DynamicBatcher

    synth = _FakeSynthesizer()
    synth.tts_model = _FakeDurModel()
    b = DynamicBatcher(synth, max_batch=8, window_ms=150)
    frames_seen = []
    model = synth.tts_model
    orig_infer = model.inference

    def spy(params, x, xl, aux_input=None, max_frames=128, rng=None):
        frames_seen.append(max_frames)
        return orig_infer(params, x, xl, aux_input=aux_input, max_frames=max_frames, rng=rng)

    model.inference = spy
    # this test checks the server WIRING (per-group pad/decode/unmix), not
    # the planner's economics: the fake tokenizer caps texts at 30 ids so
    # the padded waste here never clears the real ~2048-unit dispatch
    # overhead — drop it so the planner chooses to split
    import tts_tpu.utils.synthesis as _syn

    orig_plan = _syn.plan_decode_groups
    _syn.plan_decode_groups = lambda y, **kw: orig_plan(y, overhead=64, **kw)
    texts = ["short", "tiny", "eh", "a very long sentence here ok",
             "another quite long sentence x", "third long sentence goes here"]
    results = {}

    def call(i, t):
        results[i] = np.asarray(b.tts(t))

    try:
        threads = [threading.Thread(target=call, args=(i, t)) for i, t in enumerate(texts)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
        b.close()
    finally:
        _syn.plan_decode_groups = orig_plan

    assert len(results) == len(texts)
    for i, t in enumerate(texts):
        val, length = _expected(t)
        assert len(results[i]) == length, (i, t)
        assert np.allclose(results[i][:-10000], val), (i, t)
    # the batch was actually decoded at two different frame buckets
    assert len(set(frames_seen)) >= 2, frames_seen


class _FakePackedModel(_FakeDurModel):
    """Fake with a sequence-packed decode: every slot of a packed row emits
    its owner's true text length, so slicing mixups are visible."""

    def inference_packed(
        self, params, x, x_lengths, seg_sample, seg_pos, aux_input=None,
        noise_frames=128, noise_layout="packed",
    ):
        s = jnp.maximum(seg_sample, 0)
        vals = jnp.where(seg_sample >= 0, x_lengths[s], 0).astype(jnp.float32)
        wav = jnp.repeat(vals, UP, axis=1)[..., None]  # [R, L*UP, 1]
        return {"model_outputs": wav}


def test_packed_dispatch_unmixes():
    """A model exposing inference_packed is served through ONE packed
    dispatch: the plain batched inference must not run at all, and every
    request gets its own correctly sliced waveform back."""
    from tts_tpu.server.batching import DynamicBatcher

    synth = _FakeSynthesizer()
    synth.tts_model = _FakePackedModel()
    model = synth.tts_model
    b = DynamicBatcher(synth, max_batch=8, window_ms=150)

    unpacked_calls = []
    orig_infer = model.inference

    def spy(*a, **kw):
        unpacked_calls.append(1)
        return orig_infer(*a, **kw)

    model.inference = spy
    texts = ["short", "tiny", "a very long sentence here ok",
             "another quite long sentence x"]
    results = {}

    def call(i, t):
        results[i] = np.asarray(b.tts(t))

    threads = [threading.Thread(target=call, args=(i, t)) for i, t in enumerate(texts)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    b.close()

    assert len(results) == len(texts)
    budget = 384  # _frame_budget(30-id cap): 30*12 → 384
    for i, t in enumerate(texts):
        n = len(_FakeTokenizer().text_to_ids(t))
        # packed serving slices by predicted duration (capped at the budget)
        pred = 3000 if n > 15 else 32
        expect_len = min(pred, budget) * UP + 10000
        assert len(results[i]) == expect_len, (i, t, len(results[i]))
        assert np.allclose(results[i][:-10000], n), (i, t)
    assert not unpacked_calls, "packed batch must not fall back to plain decode"
