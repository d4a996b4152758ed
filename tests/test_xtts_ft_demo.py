"""XTTS fine-tune demo workflow test
(reference ``TTS/demos/xtts_ft_demo`` — Gradio app; ours is a CLI)."""

import csv
import os
import shutil

import numpy as np
import pytest

FIXTURE = "/root/reference/tests/data/ljspeech"

pytestmark = pytest.mark.skipif(not os.path.isdir(FIXTURE), reason="fixture missing")


def _clips_with_transcripts(tmp_path, n=4):
    """Copy n fixture wavs + .txt sidecar transcripts."""
    clips = tmp_path / "clips"
    clips.mkdir()
    rows = open(os.path.join(FIXTURE, "metadata.csv")).read().splitlines()[:n]
    for row in rows:
        name, text = row.split("|")[0], row.split("|")[1]
        src = os.path.join(FIXTURE, "wavs", name + ".wav")
        shutil.copy(src, clips / (name + ".wav"))
        (clips / (name + ".txt")).write_text(text)
    return str(clips)


def test_formatter(tmp_path):
    from tts_tpu.demos.xtts_ft_demo.utils.formatter import format_audio_list

    clips = _clips_with_transcripts(tmp_path)
    audio_files = sorted(
        os.path.join(clips, f) for f in os.listdir(clips) if f.endswith(".wav")
    )
    out = str(tmp_path / "ds")
    train_csv, eval_csv, total = format_audio_list(
        audio_files, out_path=out, eval_percentage=0.25
    )
    assert os.path.isfile(train_csv) and os.path.isfile(eval_csv)
    assert total > 0
    with open(train_csv, newline="") as f:
        rows = list(csv.reader(f, delimiter="|"))
    assert rows[0] == ["audio_file", "text", "speaker_name"]
    assert len(rows) >= 2  # header + >=1 clip
    # the coqui formatter parses what we wrote
    from tts_tpu.data.formatters import coqui

    items = coqui(out, "metadata_train.csv")
    assert items and all(os.path.isfile(it["audio_file"]) for it in items)


def test_web_ui_preprocess_and_job_logs(tmp_path):
    """The browser UI (reference gradio app) drives Step 1 over HTTP:
    POST /api/preprocess starts a background job, /api/job streams its
    captured logs and yields the train/eval CSV paths on completion."""
    import json
    import threading
    import time
    import urllib.request

    from tts_tpu.demos.xtts_ft_demo.web_ui import create_server

    server = create_server(port=0)  # ephemeral port
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = f"http://localhost:{server.server_address[1]}"
    try:
        page = urllib.request.urlopen(base + "/").read().decode()
        assert "Data processing" in page and "Fine-tuning" in page and "Inference" in page

        clips = _clips_with_transcripts(tmp_path)
        req = urllib.request.Request(
            base + "/api/preprocess",
            data=json.dumps({"audio_dir": clips, "language": "en",
                             "out_path": str(tmp_path / "ds")}).encode(),
            headers={"Content-Type": "application/json"},
        )
        assert json.load(urllib.request.urlopen(req))["started"]
        for _ in range(300):
            job = json.load(urllib.request.urlopen(base + "/api/job"))
            if job["status"] != "running":
                break
            time.sleep(0.1)
        assert job["status"] == "done", job["logs"]
        assert os.path.isfile(job["result"]["train_csv"])
        assert os.path.isfile(job["result"]["eval_csv"])
        assert "dataset created" in job["logs"]

        # errors are captured per-job, not 500s: bad dir → status error
        req = urllib.request.Request(
            base + "/api/preprocess",
            data=json.dumps({"audio_dir": str(tmp_path / "nope")}).encode(),
            headers={"Content-Type": "application/json"},
        )
        assert json.load(urllib.request.urlopen(req))["started"]
        for _ in range(100):
            job = json.load(urllib.request.urlopen(base + "/api/job"))
            if job["status"] != "running":
                break
            time.sleep(0.05)
        assert job["status"] == "error"
        assert "no audio files" in job["logs"]
    finally:
        server.shutdown()


@pytest.mark.slow
def test_ft_train_smoke(tmp_path):
    from tts_tpu.demos.xtts_ft_demo.utils.formatter import format_audio_list
    from tts_tpu.demos.xtts_ft_demo.utils.gpt_train import train_gpt

    clips = _clips_with_transcripts(tmp_path)
    audio_files = sorted(
        os.path.join(clips, f) for f in os.listdir(clips) if f.endswith(".wav")
    )
    out = str(tmp_path / "ds")
    train_csv, eval_csv, _ = format_audio_list(audio_files, out_path=out, eval_percentage=0.25)
    config_path, ckpt = train_gpt(
        language="en", num_epochs=1, batch_size=2, grad_acumm=1,
        train_csv=train_csv, eval_csv=eval_csv,
        output_path=str(tmp_path / "run"), tiny=True,
    )
    assert os.path.isfile(config_path)
    assert os.path.isfile(ckpt)
