"""Resample a directory of wavs (reference ``TTS/bin/resample.py``)."""

from __future__ import annotations

import argparse
import glob
import os
from concurrent.futures import ThreadPoolExecutor

from tts_tpu.audio.numpy_transforms import load_wav, resample_wav, save_wav


def resample_file(path: str, output_sr: int, output_dir: str = None, input_dir: str = None):
    wav = load_wav(filename=path)
    import scipy.io.wavfile

    sr, _ = scipy.io.wavfile.read(path), None
    orig_sr = sr[0]
    wav = resample_wav(wav, orig_sr, output_sr)
    out_path = path
    if output_dir:
        out_path = os.path.join(output_dir, os.path.relpath(path, input_dir))
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
    save_wav(wav=wav, path=out_path, sample_rate=output_sr)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input_dir", required=True)
    parser.add_argument("--output_dir", default=None)
    parser.add_argument("--output_sr", type=int, required=True)
    parser.add_argument("--n_jobs", type=int, default=4)
    args = parser.parse_args()

    files = glob.glob(os.path.join(args.input_dir, "**", "*.wav"), recursive=True)
    print(f" > Resampling {len(files)} files to {args.output_sr} Hz")
    with ThreadPoolExecutor(max_workers=args.n_jobs) as ex:
        list(ex.map(lambda p: resample_file(p, args.output_sr, args.output_dir, args.input_dir), files))
    print(" > Done.")


if __name__ == "__main__":
    main()
