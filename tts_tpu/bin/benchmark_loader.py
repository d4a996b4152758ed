"""Measure dataloader throughput and loader/compute overlap.

The reference delegates loader parallelism to torch DataLoader workers and
never measures it; on TPU the loader must hide host DSP (mel/STFT/f0)
behind device steps or the chip starves. This tool times
``TTSDataset.batches`` in its three modes (serial, thread pool, forked
process pool) against a synthetic consumer that "computes" for a fixed
budget per batch, and reports batches/s plus the overlap efficiency
(measured wall / ideal overlapped wall).

Usage:
  python -m tts_tpu.bin.benchmark_loader --num_samples 64 --batch_size 8 \
      --step_ms 30 --workers 4
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile
import time

import numpy as np


def _make_synthetic_dataset(n: int, sr: int = 22050, seconds: float = 1.5):
    """Write n sine wavs + build a TTSDataset over them."""
    from tts_tpu.audio.numpy_transforms import save_wav
    from tts_tpu.audio.processor import AudioProcessor
    from tts_tpu.config import BaseAudioConfig, BaseTTSConfig
    from tts_tpu.data.dataset import TTSDataset
    from tts_tpu.text import TTSTokenizer

    tmp = tempfile.mkdtemp(prefix="loader_bench_")
    samples = []
    rng = np.random.RandomState(0)
    for i in range(n):
        f = float(rng.uniform(100, 500))
        t = np.linspace(0, seconds, int(sr * seconds), dtype=np.float32)
        save_wav(wav=0.1 * np.sin(2 * np.pi * f * t), path=os.path.join(tmp, f"{i}.wav"),
                 sample_rate=sr)
        samples.append({
            "text": "hello world " * int(rng.randint(1, 4)),
            "audio_file": os.path.join(tmp, f"{i}.wav"),
            "speaker_name": "spk",
            "language": "en",
            "audio_unique_name": str(i),
        })
    audio_cfg = BaseAudioConfig(sample_rate=sr)
    ap = AudioProcessor.init_from_config(audio_cfg, verbose=False)
    tokenizer, _ = TTSTokenizer.init_from_config(
        BaseTTSConfig(text_cleaner="english_cleaners", use_phonemes=False)
    )
    ds = TTSDataset(
        samples=samples, ap=ap, tokenizer=tokenizer,
        compute_linear_spec=False, return_wav=False,
    )
    ds.preprocess_samples()
    return ds


def _consume(ds, batch_size: int, step_s: float, **loader_kw):
    """Iterate all batches; sleep step_s per batch to model device compute.
    Returns (wall_s, n_batches, load_s) where load_s is pure-loading time
    measured by a serial pre-pass."""
    n = 0
    t0 = time.time()
    for _ in ds.batches(batch_size, shuffle=False, **loader_kw):
        time.sleep(step_s)
        n += 1
    return time.time() - t0, n


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--num_samples", type=int, default=64)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--step_ms", type=float, default=30.0,
                   help="simulated device step per batch")
    p.add_argument("--workers", type=int, default=4)
    args = p.parse_args()

    ds = _make_synthetic_dataset(args.num_samples)
    step_s = args.step_ms / 1000.0

    # pure loading cost (no consumer delay, serial)
    t0 = time.time()
    n_batches = sum(1 for _ in ds.batches(args.batch_size, shuffle=False))
    load_s = time.time() - t0

    results = {}
    for mode, kw in (
        ("serial", {}),
        ("thread", {"num_workers": args.workers, "worker_mode": "thread"}),
        ("process", {"num_workers": args.workers, "worker_mode": "process"}),
    ):
        wall, n = _consume(ds, args.batch_size, step_s, **kw)
        compute_s = n * step_s
        # ideal overlapped wall: max(load, compute) (+1 batch of latency)
        ideal = max(load_s, compute_s) + load_s / max(n, 1)
        results[mode] = {
            "wall_s": round(wall, 3),
            "batches_s": round(n / wall, 2),
            "overlap_efficiency": round(min(1.0, ideal / wall), 3),
        }

    print(json.dumps({
        "n_batches": n_batches,
        "pure_load_s": round(load_s, 3),
        "simulated_step_ms": args.step_ms,
        **results,
    }))


if __name__ == "__main__":
    main()
