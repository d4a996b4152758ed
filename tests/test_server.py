"""HTTP server tests (reference ``tests/bash_tests/test_demo_server.sh``
boots tts-server and curls it; here in-process against a stub synthesizer)."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from tts_tpu.server.server import create_server


class _StubManager:
    name_to_id = {"spk_a": 0, "spk_b": 1}


class _StubModel:
    speaker_manager = _StubManager()
    language_manager = None


class _StubSynthesizer:
    output_sample_rate = 22050
    tts_config = None
    tts_model = _StubModel()

    def __init__(self):
        self.calls = []

    def tts(self, text, speaker_name=None, language_name=None, style_wav=None,
            speaker_wav=None, **kwargs):
        self.calls.append(dict(text=text, speaker_name=speaker_name,
                               language_name=language_name, style_wav=style_wav))
        t = np.arange(2205) / 22050.0
        return list(0.3 * np.sin(2 * np.pi * 440 * t))


@pytest.fixture(scope="module")
def server():
    synth = _StubSynthesizer()
    srv = create_server(synth, port=0)  # ephemeral port
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield srv, synth, f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return r.status, r.headers.get("Content-Type"), r.read()


def test_index(server):
    _, _, base = server
    status, ctype, body = _get(base + "/")
    assert status == 200 and b"tts_tpu" in body


def test_api_tts(server):
    _, synth, base = server
    status, ctype, body = _get(
        base + "/api/tts?text=hello%20world&speaker_id=spk_a&style_wav=ref.wav"
    )
    assert status == 200 and ctype == "audio/wav"
    assert body[:4] == b"RIFF" and len(body) > 1000
    assert synth.calls[-1]["text"] == "hello world"
    assert synth.calls[-1]["speaker_name"] == "spk_a"
    assert synth.calls[-1]["style_wav"] == "ref.wav"


def test_details_lists_speakers(server):
    _, _, base = server
    status, _, body = _get(base + "/details")
    d = json.loads(body)
    assert status == 200 and d["speakers"] == ["spk_a", "spk_b"]


def test_marytts_process(server):
    _, _, base = server
    status, ctype, body = _get(base + "/process?INPUT_TEXT=bonjour")
    assert status == 200 and ctype == "audio/wav" and body[:4] == b"RIFF"


def test_missing_text_is_400(server):
    _, _, base = server
    try:
        _get(base + "/api/tts")
        raised = False
    except urllib.error.HTTPError as e:
        raised = e.code == 400
    assert raised


class _StreamingSynthesizer(_StubSynthesizer):
    def tts_stream(self, text, speaker_name=None, language_name=None,
                   speaker_wav=None, **kwargs):
        if not text.strip():
            raise ValueError("No text to speak.")
        self.calls.append(dict(text=text, speaker_name=speaker_name))
        for i in range(3):
            yield np.full(100, 0.1 * (i + 1), np.float32)


@pytest.fixture(scope="module")
def stream_server():
    synth = _StreamingSynthesizer()
    srv = create_server(synth, port=0)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield srv, synth, f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_api_tts_stream_progressive_wav(stream_server):
    _, synth, base = stream_server
    status, ctype, body = _get(base + "/api/tts-stream?text=stream%20me&speaker_id=spk_a")
    assert status == 200 and ctype == "audio/wav"
    assert body[:4] == b"RIFF" and body[8:12] == b"WAVE"
    pcm = np.frombuffer(body[44:], dtype="<i2")
    assert len(pcm) == 300  # 3 chunks x 100 samples
    # chunk amplitudes survive in order
    assert abs(pcm[0] / 32767 - 0.1) < 1e-3
    assert abs(pcm[250] / 32767 - 0.3) < 1e-3
    assert synth.calls[-1]["text"] == "stream me"


def test_api_tts_stream_no_streaming_model_is_501(server):
    _, _, base = server  # _StubSynthesizer has no tts_stream
    try:
        _get(base + "/api/tts-stream?text=hi")
        code = 200
    except urllib.error.HTTPError as e:
        code = e.code
    assert code == 501


def test_api_tts_stream_missing_text_is_400(stream_server):
    _, _, base = stream_server
    try:
        _get(base + "/api/tts-stream")
        code = 200
    except urllib.error.HTTPError as e:
        code = e.code
    assert code == 400
