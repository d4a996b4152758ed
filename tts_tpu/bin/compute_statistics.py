"""Compute mel/linear mean-var normalization stats over a dataset
(reference ``TTS/bin/compute_statistics.py``)."""

from __future__ import annotations

import argparse

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_path", required=True)
    parser.add_argument("--out_path", required=True)
    parser.add_argument("--data_path", default=None)
    args = parser.parse_args()

    from tts_tpu.audio.processor import AudioProcessor
    from tts_tpu.config import load_config
    from tts_tpu.data import load_tts_samples

    config = load_config(args.config_path)
    config.audio.signal_norm = False  # raw dB features for stats
    config.audio.stats_path = None
    ap = AudioProcessor.init_from_config(config.audio, verbose=False)

    if args.data_path:
        import glob as _glob

        wavs = sorted(_glob.glob(f"{args.data_path}/**/*.wav", recursive=True))
    else:
        train, _ = load_tts_samples([d.to_dict() for d in config.datasets], eval_split=False)
        wavs = [s["audio_file"] for s in train]

    mel_sum = mel_sq = lin_sum = lin_sq = 0.0
    mel_n = lin_n = 0
    for i, path in enumerate(wavs):
        wav = ap.load_wav(path)
        mel = ap.melspectrogram(wav)
        lin = ap.spectrogram(wav)
        mel_sum = mel_sum + mel.sum(1)
        mel_sq = mel_sq + (mel**2).sum(1)
        mel_n += mel.shape[1]
        lin_sum = lin_sum + lin.sum(1)
        lin_sq = lin_sq + (lin**2).sum(1)
        lin_n += lin.shape[1]
        if i % 50 == 0:
            print(f" > {i}/{len(wavs)}", flush=True)

    stats = {
        "mel_mean": mel_sum / mel_n,
        "mel_std": np.sqrt(mel_sq / mel_n - (mel_sum / mel_n) ** 2),
        "linear_mean": lin_sum / lin_n,
        "linear_std": np.sqrt(lin_sq / lin_n - (lin_sum / lin_n) ** 2),
        "audio_config": config.audio.to_dict(),
    }
    np.save(args.out_path, stats, allow_pickle=True)
    print(f" > Stats saved to {args.out_path}")


if __name__ == "__main__":
    main()
