"""TTS HTTP server (reference ``TTS/server/server.py`` Flask app), built on
stdlib ``http.server`` (no Flask dependency).

Routes (parity with the reference):
  GET  /            — minimal HTML UI
  GET  /api/tts     — ?text=...&speaker_id=...&language_id=... → wav
  GET  /api/tts-stream — same params → progressive WAV, bytes flushed per
                         decoded chunk (streaming models only; no reference
                         equivalent)
  GET  /details     — model/config info
  MaryTTS compat: GET /locales, GET /voices, GET|POST /process
A global lock serializes synthesis like the reference (``server.py:187``).
"""

from __future__ import annotations

import argparse
import io
import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

class _NullLock:
    """Stand-in lock for paths whose serialization lives elsewhere (the
    stream batcher's worker thread owns the device)."""

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


_INDEX_HTML = """<!DOCTYPE html>
<html><head><title>tts_tpu server</title></head>
<body style="font-family: sans-serif; max-width: 48em; margin: 2em auto;">
<h1>tts_tpu</h1>
<div>
  <input id="text" size="60" placeholder="Type a sentence..."/>
  <button onclick="speak()">Speak</button>
</div>
<div style="margin-top: 0.6em;">
  <label>speaker <select id="speaker"><option value=""></option></select></label>
  <label>language <select id="language"><option value=""></option></select></label>
  <label>style wav <input id="style_wav" size="24" placeholder="(server path)"/></label>
</div>
<audio id="audio" controls style="margin-top: 1em; width: 100%;"></audio>
<script>
fetch('/details').then(r => r.json()).then(d => {
  for (const [sel, names] of [["speaker", d.speakers || []], ["language", d.languages || []]]) {
    const el = document.getElementById(sel);
    for (const n of names) { const o = document.createElement('option'); o.value = o.text = n; el.add(o); }
  }
});
function speak() {
  const p = new URLSearchParams({text: document.getElementById('text').value});
  for (const [k, id] of [["speaker_id", "speaker"], ["language_id", "language"], ["style_wav", "style_wav"]]) {
    const v = document.getElementById(id).value;
    if (v) p.set(k, v);
  }
  const a = document.getElementById('audio');
  a.src = '/api/tts?' + p.toString();
  a.play();
}
</script>
</body></html>"""


def create_handler(synthesizer, lock: threading.Lock, batcher=None, stream_batcher=None):
    class TTSHandler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):
            print(" > %s" % (fmt % args))

        def _send(self, code: int, content: bytes, ctype: str = "text/html"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(content)))
            self.end_headers()
            self.wfile.write(content)

        def _synthesize(self, text: str, speaker: str = None, language: str = None,
                        style_wav: str = None, speaker_wav: str = None) -> bytes:
            wav = None
            if batcher is not None and not style_wav and not speaker_wav:
                # throughput path: concurrent requests share one batched
                # device dispatch (no lock — the batch worker serializes)
                try:
                    wav = batcher.tts(
                        text, speaker_name=speaker or None, language_name=language or None
                    )
                except ValueError:
                    wav = None  # e.g. d-vector speakers: keep the serial path
            if wav is None:
                with lock:
                    wav = synthesizer.tts(
                        text, speaker_name=speaker or None, language_name=language or None,
                        style_wav=style_wav or None, speaker_wav=speaker_wav or None,
                    )
            buf = io.BytesIO()
            import scipy.io.wavfile

            arr = np.asarray(wav)
            arr = (arr * (32767 / max(0.01, float(np.abs(arr).max())))).astype(np.int16)
            scipy.io.wavfile.write(buf, synthesizer.output_sample_rate, arr)
            return buf.getvalue()

        def _stream_tts(self, qs):
            """Chunked synthesis → progressive WAV (16-bit PCM, unknown-length
            RIFF header, bytes flushed per decoded chunk). Serving extension
            beyond the reference server: audio starts after the first XTTS
            decode chunk instead of after the full utterance."""
            text = (qs.get("text") or [""])[0]
            if not text.strip():
                self._send(400, b"missing text")
                return
            if not hasattr(synthesizer, "tts_stream") and stream_batcher is None:
                self._send(501, b"model has no streaming path")
                return
            sr = synthesizer.output_sample_rate
            empty = object()
            stream_kwargs = dict(
                speaker_name=(qs.get("speaker_id") or [None])[0],
                language_name=(qs.get("language_id") or [None])[0],
                speaker_wav=(qs.get("speaker_wav") or [None])[0],
            )
            # pull the first chunk BEFORE sending headers so bad requests
            # still get a clean error status; afterwards the lock is taken
            # per decode chunk, never across client socket writes (a slow
            # reader must not block other requests on the server)
            if stream_batcher is not None:
                # capacity path: concurrent clients share one batched decode
                # scan (no lock — the batch worker owns the device)
                gen = stream_batcher.stream(text, **stream_kwargs)
                chunk_lock = _NullLock()
            else:
                gen = synthesizer.tts_stream(text, **stream_kwargs)
                chunk_lock = lock
            try:
                with chunk_lock:
                    first = next(gen, empty)
            except NotImplementedError as e:
                self._send(501, str(e).encode())
                return
            except ValueError as e:
                self._send(400, str(e).encode())
                return

            self.send_response(200)
            self.send_header("Content-Type", "audio/wav")
            self.end_headers()
            # RIFF header with unknown (max) sizes: players treat the
            # stream as open-ended until the socket closes
            import struct

            try:
                self.wfile.write(
                    b"RIFF" + struct.pack("<I", 0xFFFFFFFF) + b"WAVEfmt "
                    + struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16)
                    + b"data" + struct.pack("<I", 0xFFFFFFFF)
                )
                chunk = first
                while chunk is not empty:
                    pcm = np.clip(np.asarray(chunk, np.float32), -1.0, 1.0)
                    self.wfile.write((pcm * 32767).astype("<i2").tobytes())
                    self.wfile.flush()
                    with chunk_lock:
                        chunk = next(gen, empty)
            except (BrokenPipeError, ConnectionResetError):
                pass  # client hung up mid-stream
            except Exception as e:  # headers already sent: stop cleanly,
                # never write an error status into the audio body
                print(f" [!] tts-stream aborted mid-stream: {e}")

        def do_GET(self):
            parsed = urllib.parse.urlparse(self.path)
            qs = urllib.parse.parse_qs(parsed.query)
            route = parsed.path
            if route == "/":
                self._send(200, _INDEX_HTML.encode())
            elif route == "/api/tts-stream":
                self._stream_tts(qs)
            elif route == "/api/tts":
                text = (qs.get("text") or [""])[0]
                if not text.strip():
                    self._send(400, b"missing text")
                    return
                wav = self._synthesize(
                    text,
                    (qs.get("speaker_id") or [None])[0],
                    (qs.get("language_id") or [None])[0],
                    (qs.get("style_wav") or [None])[0],
                    (qs.get("speaker_wav") or [None])[0],
                )
                self._send(200, wav, "audio/wav")
            elif route == "/details":
                sm = getattr(synthesizer.tts_model, "speaker_manager", None) if synthesizer.tts_model else None
                lm = getattr(synthesizer.tts_model, "language_manager", None) if synthesizer.tts_model else None
                details = {
                    "tts_config": synthesizer.tts_config.to_dict()
                    if synthesizer.tts_config
                    else None,
                    "speakers": list(getattr(sm, "name_to_id", {}) or {}) if sm else [],
                    "languages": list(getattr(lm, "name_to_id", {}) or {}) if lm else [],
                }
                self._send(200, json.dumps(details, default=str).encode(), "application/json")
            elif route == "/locales":  # MaryTTS compat
                self._send(200, b"en_US\n", "text/plain")
            elif route == "/voices":  # MaryTTS compat
                self._send(200, b"default en_US u\n", "text/plain")
            elif route == "/process":  # MaryTTS compat
                text = (qs.get("INPUT_TEXT") or [""])[0]
                wav = self._synthesize(text)
                self._send(200, wav, "audio/wav")
            else:
                self._send(404, b"not found")

        def do_POST(self):
            parsed = urllib.parse.urlparse(self.path)
            if parsed.path == "/process":  # MaryTTS compat
                length = int(self.headers.get("Content-Length", "0"))
                body = self.rfile.read(length).decode()
                qs = urllib.parse.parse_qs(body)
                text = (qs.get("INPUT_TEXT") or [""])[0]
                wav = self._synthesize(text)
                self._send(200, wav, "audio/wav")
            else:
                self._send(404, b"not found")

    return TTSHandler


def create_server(
    synthesizer,
    port: int = 5002,
    max_batch: int = 1,
    batch_window_ms: float = 10.0,
    stream_batch: int = 1,
    stream_window_ms: float = 50.0,
) -> ThreadingHTTPServer:
    lock = threading.Lock()
    batcher = None
    if max_batch and max_batch > 1:
        from tts_tpu.server.batching import DynamicBatcher

        try:
            batcher = DynamicBatcher(synthesizer, max_batch=max_batch, window_ms=batch_window_ms)
            print(f" > Dynamic batching on: up to {max_batch} requests per dispatch")
        except ValueError as e:
            print(f" [!] dynamic batching unavailable for this model ({e}); serving serially")
    stream_batcher = None
    if stream_batch and stream_batch > 1:
        from tts_tpu.server.stream_batching import StreamBatcher

        try:
            stream_batcher = StreamBatcher(
                synthesizer, max_batch=stream_batch, window_ms=stream_window_ms
            )
            print(f" > Batched streaming on: up to {stream_batch} concurrent streams per scan")
        except ValueError as e:
            print(f" [!] batched streaming unavailable for this model ({e}); streaming serially")
    return ThreadingHTTPServer(
        ("0.0.0.0", port), create_handler(synthesizer, lock, batcher, stream_batcher)
    )


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--list_models", action="store_true",
                        help="list released zoo models and exit")
    parser.add_argument("--model_name", default=None)
    parser.add_argument("--model_path", default=None)
    parser.add_argument("--config_path", default=None)
    parser.add_argument("--vocoder_name", default=None,
                        help="zoo vocoder name (overrides the model's default_vocoder)")
    parser.add_argument("--vocoder_path", default=None)
    parser.add_argument("--vocoder_config_path", default=None)
    parser.add_argument("--speakers_file_path", default=None,
                        help="JSON speakers file for a multi-speaker model")
    parser.add_argument("--port", type=int, default=5002)
    parser.add_argument("--use_cuda", action="store_true", help="ignored (JAX selects the device)")
    parser.add_argument("--debug", action="store_true", help="verbose request logging")
    parser.add_argument("--show_details", action="store_true",
                        help="accepted for reference compat (the /details route is always on)")
    parser.add_argument("--max_batch", type=int, default=1,
                        help="dynamic batching: max concurrent requests per device dispatch")
    parser.add_argument("--batch_window_ms", type=float, default=10.0,
                        help="how long the first queued request waits for batch mates")
    parser.add_argument("--stream_batch", type=int, default=1,
                        help="batched streaming: max concurrent /api/tts-stream clients "
                             "decoded in one KV-cached scan (XTTS)")
    parser.add_argument("--stream_window_ms", type=float, default=50.0,
                        help="how long the first queued stream waits for batch mates")
    args = parser.parse_args()

    if args.list_models:
        from tts_tpu.utils.manage import ModelManager

        for name in ModelManager().list_models():
            print(name)
        return

    from tts_tpu.api import TTS

    vocoder_path, vocoder_config = args.vocoder_path, args.vocoder_config_path
    if args.vocoder_name and not vocoder_path:
        from tts_tpu.utils.manage import ModelManager

        vocoder_path, vocoder_config, _ = ModelManager().download_model(args.vocoder_name)

    tts = TTS(
        model_name=args.model_name or "",
        model_path=args.model_path,
        config_path=args.config_path,
        vocoder_path=vocoder_path,
        vocoder_config_path=vocoder_config,
        speakers_file_path=args.speakers_file_path,
    )
    server = create_server(
        tts.synthesizer, args.port, max_batch=args.max_batch,
        batch_window_ms=args.batch_window_ms, stream_batch=args.stream_batch,
        stream_window_ms=args.stream_window_ms,
    )
    print(f" > Serving on http://0.0.0.0:{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
