"""Trim silence from dataset wavs (reference
``TTS/bin/remove_silence_using_vad.py``, which wraps Silero-VAD).

Scoring backend: the statistical VAD by default, or the learned
Silero-v5-layout network when ``--vad_model`` (or the
``TTS_TPU_SILERO_VAD`` env var) points at the Silero checkpoint."""

from __future__ import annotations

import argparse
import glob
import os

from tts_tpu.audio.numpy_transforms import load_wav, save_wav
from tts_tpu.utils.vad import remove_silence


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input_dir", required=True)
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--sample_rate", type=int, default=22050)
    parser.add_argument("--threshold", type=float, default=0.35, help="VAD speech threshold")
    parser.add_argument(
        "--trim_just_beginning_and_end", action=argparse.BooleanOptionalAction, default=True,
        help="keep internal pauses (reference default); --no-trim_just_beginning_and_end cuts them too",
    )
    parser.add_argument(
        "--vad_model", default=None,
        help="path to a Silero-VAD checkpoint (.jit/.pth) for the learned backend",
    )
    args = parser.parse_args()

    model_params = None
    if args.vad_model:
        from tts_tpu.utils.vad_silero import load_silero_state_dict

        model_params = load_silero_state_dict(args.vad_model)

    files = glob.glob(os.path.join(args.input_dir, "**", "*.wav"), recursive=True)
    print(f" > Processing {len(files)} files")
    no_speech = 0
    for path in files:
        wav = load_wav(filename=path, sample_rate=args.sample_rate, resample=True)
        trimmed, found = remove_silence(
            wav, args.sample_rate,
            trim_just_beginning_and_end=args.trim_just_beginning_and_end,
            threshold=args.threshold,
            model_params=model_params,
        )
        if not found:
            no_speech += 1
            print(f" [!] no speech found in {path}; copied unchanged")
        out = os.path.join(args.output_dir, os.path.relpath(path, args.input_dir))
        os.makedirs(os.path.dirname(out), exist_ok=True)
        save_wav(wav=trimmed, path=out, sample_rate=args.sample_rate)
    print(f" > Done. ({no_speech} files without detected speech)")


if __name__ == "__main__":
    main()
