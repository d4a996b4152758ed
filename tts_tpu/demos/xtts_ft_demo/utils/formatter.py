"""Dataset formatting for XTTS fine-tuning
(reference ``TTS/demos/xtts_ft_demo/utils/formatter.py``).

The reference transcribes input clips with Whisper; this zero-egress
TPU build takes transcripts the user already has — either a sidecar
``clip.txt`` next to each ``clip.wav`` or one CSV (``audio|text``) — and
produces the coqui-format train/eval metadata the GPT fine-tune consumes:
``audio_file|text|speaker_name``.
"""

from __future__ import annotations

import csv
import os
import random
import wave
from typing import Dict, List, Optional, Tuple

import numpy as np

from tts_tpu.audio.numpy_transforms import load_wav, save_wav


def _read_transcripts(audio_files: List[str], transcripts_csv: Optional[str]) -> Dict[str, str]:
    """audio path → transcript, from a CSV or .txt sidecars."""
    table: Dict[str, str] = {}
    if transcripts_csv:
        with open(transcripts_csv, newline="", encoding="utf-8") as f:
            for row in csv.reader(f, delimiter="|"):
                if len(row) >= 2:
                    table[os.path.basename(row[0].strip())] = row[1].strip()
    out = {}
    for path in audio_files:
        base = os.path.basename(path)
        if base in table:
            out[path] = table[base]
            continue
        sidecar = os.path.splitext(path)[0] + ".txt"
        if os.path.isfile(sidecar):
            out[path] = open(sidecar, encoding="utf-8").read().strip()
        else:
            print(f" [!] no transcript for {base}; skipped")
    return out


def format_audio_list(
    audio_files: List[str],
    target_language: str = "en",
    out_path: str = "dataset",
    transcripts_csv: Optional[str] = None,
    eval_percentage: float = 0.15,
    speaker_name: str = "coqui",
    sample_rate: int = 22050,
    max_duration: float = 11.0,
    seed: int = 42,
) -> Tuple[str, str, float]:
    """Resample clips to ``sample_rate`` mono, pair them with transcripts,
    and write ``metadata_train.csv`` / ``metadata_eval.csv`` under
    ``out_path``.  Returns (train_csv, eval_csv, total_audio_seconds)."""
    os.makedirs(os.path.join(out_path, "wavs"), exist_ok=True)
    transcripts = _read_transcripts(audio_files, transcripts_csv)

    rows = []
    audio_total = 0.0
    for path, text in transcripts.items():
        wav = load_wav(filename=path, sample_rate=sample_rate, resample=True)
        if wav.ndim > 1:
            wav = wav.mean(axis=-1)
        dur = len(wav) / sample_rate
        if dur > max_duration:
            print(f" [!] {os.path.basename(path)} is {dur:.1f}s > {max_duration}s; clipped")
            wav = wav[: int(max_duration * sample_rate)]
            dur = max_duration
        audio_total += dur
        rel = os.path.join("wavs", os.path.splitext(os.path.basename(path))[0] + ".wav")
        save_wav(wav=wav, path=os.path.join(out_path, rel), sample_rate=sample_rate)
        rows.append((rel, text, speaker_name))

    if not rows:
        raise ValueError("no (audio, transcript) pairs found")
    random.Random(seed).shuffle(rows)
    n_eval = max(1, int(len(rows) * eval_percentage)) if len(rows) > 1 else 0
    eval_rows, train_rows = rows[:n_eval], rows[n_eval:]

    def _write(name: str, subset) -> str:
        p = os.path.join(out_path, name)
        with open(p, "w", newline="", encoding="utf-8") as f:
            w = csv.writer(f, delimiter="|")
            w.writerow(["audio_file", "text", "speaker_name"])
            w.writerows(subset)
        return p

    train_csv = _write("metadata_train.csv", train_rows)
    eval_csv = _write("metadata_eval.csv", eval_rows or train_rows[:1])
    print(f" > {len(train_rows)} train / {len(eval_rows)} eval clips, "
          f"{audio_total / 60:.1f} min audio, language={target_language}")
    return train_csv, eval_csv, audio_total
