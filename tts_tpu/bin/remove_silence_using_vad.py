"""Trim silence from dataset wavs (reference
``TTS/bin/remove_silence_using_vad.py``, which uses Silero-VAD; here an
energy-based VAD — no torch-hub download, works offline)."""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np

from tts_tpu.audio.numpy_transforms import load_wav, save_wav, trim_silence


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input_dir", required=True)
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--trim_db", type=float, default=40.0)
    parser.add_argument("--sample_rate", type=int, default=22050)
    args = parser.parse_args()

    files = glob.glob(os.path.join(args.input_dir, "**", "*.wav"), recursive=True)
    print(f" > Processing {len(files)} files")
    for path in files:
        wav = load_wav(filename=path, sample_rate=args.sample_rate, resample=True)
        trimmed = trim_silence(
            wav=wav, sample_rate=args.sample_rate, trim_db=args.trim_db,
            win_length=1024, hop_length=256,
        )
        if len(trimmed) < 1000:
            trimmed = wav  # VAD removed everything; keep original
        out = os.path.join(args.output_dir, os.path.relpath(path, args.input_dir))
        os.makedirs(os.path.dirname(out), exist_ok=True)
        save_wav(wav=trimmed, path=out, sample_rate=args.sample_rate)
    print(" > Done.")


if __name__ == "__main__":
    main()
