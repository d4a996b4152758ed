"""XTTS fine-tuning demo — browser UI
(reference ``TTS/demos/xtts_ft_demo/xtts_demo.py``, a Gradio app with three
tabs: data processing → fine-tuning → inference).

This build serves the same workflow from stdlib ``http.server`` — the
environment is zero-egress, so no gradio — with the reference's tab/field
surface (reference ``xtts_demo.py:160,232,299``):

  1 Data processing  — audio dir (+ optional transcripts CSV) → train/eval
    CSVs via ``utils.formatter.format_audio_list``
  2 Fine-tuning      — epochs/batch/grad-accum/lr → ``utils.gpt_train``
  3 Inference        — load the fine-tuned checkpoint, clone from a
    reference clip, play the result in the browser

Long stages (preprocess, train) run in a background thread; the page polls
``/api/job`` for captured logs, like gradio's streaming Textbox.  One job at
a time, matching the reference app's single-user design.

Run:  python -m tts_tpu.demos.xtts_ft_demo.web_ui --port 5004
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import threading
import traceback
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

_PAGE = """<!DOCTYPE html>
<html><head><title>XTTS fine-tuning</title><style>
body { font-family: sans-serif; max-width: 52em; margin: 2em auto; }
fieldset { margin-bottom: 1.2em; }
label { display: block; margin: 0.35em 0; }
input[type=text], input[type=number] { width: 24em; }
textarea, pre.logs { width: 100%; height: 10em; overflow: auto;
  background: #f6f6f6; border: 1px solid #ccc; font-size: 0.85em; }
button { margin-top: 0.4em; }
</style></head><body>
<h1>XTTS fine-tuning</h1>

<fieldset><legend><b>1 — Data processing</b></legend>
<label>Audio directory (server path; wav/flac/mp3 clips, optional .txt sidecars)
  <input type=text id=audio_dir></label>
<label>Transcripts CSV (optional, 'audio|text' rows) <input type=text id=transcripts_csv></label>
<label>Dataset language <input type=text id=ds_lang value=en size=6></label>
<label>Output path <input type=text id=ds_out value=ft_dataset></label>
<button onclick="runJob('preprocess', {audio_dir: v('audio_dir'),
  transcripts_csv: v('transcripts_csv'), language: v('ds_lang'), out_path: v('ds_out')},
  'logs1')">Step 1 — Create dataset</button>
<pre class=logs id=logs1></pre></fieldset>

<fieldset><legend><b>2 — Fine-tuning XTTS encoder</b></legend>
<label>Train CSV <input type=text id=train_csv></label>
<label>Eval CSV <input type=text id=eval_csv></label>
<label>Language <input type=text id=tr_lang value=en size=6></label>
<label>Epochs <input type=number id=num_epochs value=6></label>
<label>Batch size <input type=number id=batch_size value=2></label>
<label>Grad accumulation <input type=number id=grad_acumm value=1></label>
<label>Learning rate <input type=text id=lr value=5e-6 size=10></label>
<label>Output path <input type=text id=tr_out value=ft_run></label>
<label>Pretrained XTTS checkpoint (optional .pth / .msgpack)
  <input type=text id=xtts_checkpoint></label>
<button onclick="runJob('train', {train_csv: v('train_csv'), eval_csv: v('eval_csv'),
  language: v('tr_lang'), num_epochs: +v('num_epochs'), batch_size: +v('batch_size'),
  grad_acumm: +v('grad_acumm'), lr: +v('lr'), out_path: v('tr_out'),
  xtts_checkpoint: v('xtts_checkpoint')}, 'logs2')">Step 2 — Run the training</button>
<pre class=logs id=logs2></pre></fieldset>

<fieldset><legend><b>3 — Inference</b></legend>
<label>XTTS config <input type=text id=inf_config></label>
<label>XTTS checkpoint <input type=text id=inf_ckpt></label>
<label>Speaker reference audio (server path) <input type=text id=speaker_wav></label>
<label>Language <input type=text id=inf_lang value=en size=6></label>
<label>Input text <input type=text id=inf_text value="This voice was fine-tuned on a TPU."></label>
<button onclick="infer()">Step 3 — Load model and synthesize</button>
<pre class=logs id=logs3></pre>
<audio id=audio controls style="width: 100%; margin-top: 0.6em;"></audio></fieldset>

<script>
function v(id) { return document.getElementById(id).value; }
function set(id, val) { document.getElementById(id).value = val; }
async function runJob(kind, payload, logEl) {
  const el = document.getElementById(logEl);
  el.textContent = 'starting...';
  const r = await fetch('/api/' + kind, {method: 'POST',
    headers: {'Content-Type': 'application/json'}, body: JSON.stringify(payload)});
  if (!r.ok) { el.textContent = await r.text(); return; }
  const poll = setInterval(async () => {
    const j = await (await fetch('/api/job')).json();
    el.textContent = j.logs; el.scrollTop = el.scrollHeight;
    if (j.status !== 'running') {
      clearInterval(poll);
      if (j.status === 'done' && j.result) {
        if (j.result.train_csv) { set('train_csv', j.result.train_csv);
                                  set('eval_csv', j.result.eval_csv); }
        if (j.result.config) { set('inf_config', j.result.config);
                               set('inf_ckpt', j.result.checkpoint); }
      }
    }
  }, 1000);
}
async function infer() {
  const el = document.getElementById('logs3');
  el.textContent = 'synthesizing...';
  const r = await fetch('/api/tts', {method: 'POST',
    headers: {'Content-Type': 'application/json'},
    body: JSON.stringify({config: v('inf_config'), checkpoint: v('inf_ckpt'),
      speaker_wav: v('speaker_wav'), language: v('inf_lang'), text: v('inf_text')})});
  if (!r.ok) { el.textContent = await r.text(); return; }
  document.getElementById('audio').src = URL.createObjectURL(await r.blob());
  el.textContent = 'done — press play.';
}
</script></body></html>
"""


class _Job:
    """One background stage at a time (matches the gradio app's workflow).

    Stage prints are captured into ``buf`` via ``redirect_stdout``, which is
    process-global — acceptable here because jobs are serialized and the
    HTTP handlers themselves never print."""

    def __init__(self):
        self.lock = threading.Lock()
        self.status = "idle"
        self.buf = io.StringIO()
        self.result = None

    def start(self, fn) -> bool:
        with self.lock:
            if self.status == "running":
                return False
            self.status = "running"
            self.buf = io.StringIO()
            self.result = None

        def run():
            try:
                with contextlib.redirect_stdout(self.buf), contextlib.redirect_stderr(self.buf):
                    result = fn()
                with self.lock:
                    self.result, self.status = result, "done"
            except BaseException:
                self.buf.write(traceback.format_exc())
                with self.lock:
                    self.status = "error"

        threading.Thread(target=run, daemon=True).start()
        return True

    def snapshot(self) -> dict:
        with self.lock:
            return {"status": self.status, "logs": self.buf.getvalue(),
                    "result": self.result}


def _preprocess(p: dict) -> dict:
    import glob

    from tts_tpu.demos.xtts_ft_demo.utils.formatter import format_audio_list

    audio_files = sorted(
        f for pat in ("*.wav", "*.flac", "*.mp3")
        for f in glob.glob(os.path.join(p["audio_dir"], pat))
    )
    if not audio_files:
        raise ValueError(f"no audio files under {p['audio_dir']!r}")
    train_csv, eval_csv, total = format_audio_list(
        audio_files,
        target_language=p.get("language") or "en",
        out_path=p.get("out_path") or "ft_dataset",
        transcripts_csv=p.get("transcripts_csv") or None,
    )
    print(f"dataset created: {total:.1f}s of audio")
    return {"train_csv": train_csv, "eval_csv": eval_csv}


def _train(p: dict) -> dict:
    from tts_tpu.demos.xtts_ft_demo.utils.gpt_train import train_gpt

    config_path, ckpt = train_gpt(
        language=p.get("language") or "en",
        num_epochs=int(p.get("num_epochs") or 6),
        batch_size=int(p.get("batch_size") or 2),
        grad_acumm=int(p.get("grad_acumm") or 1),
        train_csv=p["train_csv"],
        eval_csv=p["eval_csv"],
        output_path=p.get("out_path") or "ft_run",
        xtts_checkpoint=p.get("xtts_checkpoint") or None,
        lr=float(p.get("lr") or 5e-6),
        tiny=bool(p.get("tiny")),
    )
    print("fine-tune done")
    return {"config": config_path, "checkpoint": ckpt}


def create_server(host: str = "localhost", port: int = 5004) -> ThreadingHTTPServer:
    job = _Job()
    state = {"synth": None, "key": None}
    infer_lock = threading.Lock()

    def synthesize(p: dict) -> bytes:
        import numpy as np
        import scipy.io.wavfile

        from tts_tpu.utils.synthesizer import Synthesizer

        with infer_lock:
            key = (p["config"], p["checkpoint"])
            if state["key"] != key:  # reference Step-3 "load model" button
                state["synth"] = Synthesizer(
                    tts_checkpoint=p["checkpoint"], tts_config_path=p["config"]
                )
                state["key"] = key
            synth = state["synth"]
            wav = synth.tts(
                p["text"],
                speaker_wav=p.get("speaker_wav") or None,
                language_name=p.get("language") or None,
            )
            arr = np.asarray(wav)
            arr = (arr * (32767 / max(0.01, float(np.abs(arr).max())))).astype(np.int16)
            buf = io.BytesIO()
            scipy.io.wavfile.write(buf, synth.output_sample_rate, arr)
            return buf.getvalue()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):
            pass

        def _send(self, code: int, content: bytes, ctype: str = "text/html"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(content)))
            self.end_headers()
            self.wfile.write(content)

        def _json(self, code: int, obj) -> None:
            self._send(code, json.dumps(obj).encode(), "application/json")

        def do_GET(self):
            path = urllib.parse.urlparse(self.path).path
            if path == "/":
                self._send(200, _PAGE.encode())
            elif path == "/api/job":
                self._json(200, job.snapshot())
            else:
                self._send(404, b"not found")

        def do_POST(self):
            path = urllib.parse.urlparse(self.path).path
            length = int(self.headers.get("Content-Length") or 0)
            try:
                payload = json.loads(self.rfile.read(length) or b"{}")
            except ValueError:
                return self._send(400, b"bad JSON")
            if path == "/api/preprocess":
                started = job.start(lambda: _preprocess(payload))
                self._json(200 if started else 409,
                           {"started": started} if started
                           else {"error": "a job is already running"})
            elif path == "/api/train":
                started = job.start(lambda: _train(payload))
                self._json(200 if started else 409,
                           {"started": started} if started
                           else {"error": "a job is already running"})
            elif path == "/api/tts":
                try:
                    wav = synthesize(payload)
                except Exception as e:  # surfaced in the logs3 box
                    return self._send(500, str(e).encode(), "text/plain")
                self._send(200, wav, "audio/wav")
            else:
                self._send(404, b"not found")

    return ThreadingHTTPServer((host, port), Handler)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--host", default="localhost")
    parser.add_argument("--port", type=int, default=5004)
    args = parser.parse_args()
    server = create_server(args.host, args.port)
    print(f" > XTTS fine-tuning UI on http://{args.host}:{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
