"""Vocoder datasets (reference ``TTS/vocoder/datasets/``).

``GANDataset``: random fixed-length waveform segments + aligned mel
conditioning (``gan_dataset.py``).  Fixed segment lengths mean every batch
has an identical shape — zero recompiles.
"""

from __future__ import annotations

import glob
import os
from typing import Iterator, List, Optional

import numpy as np

from tts_tpu.audio.processor import AudioProcessor


def load_wav_data(data_path: str, eval_split_size: int):
    """Find wavs recursively, split eval (reference ``preprocess.py``)."""
    wav_paths = sorted(glob.glob(os.path.join(data_path, "**", "*.wav"), recursive=True))
    np.random.seed(0)
    np.random.shuffle(wav_paths)
    return wav_paths[:eval_split_size], wav_paths[eval_split_size:]


class GANDataset:
    """Random-segment dataset for GAN vocoder training."""

    def __init__(self, config, samples: List[str], is_eval: bool = False):
        self.config = config
        self.samples = samples
        self.is_eval = is_eval
        self.ap = AudioProcessor.init_from_config(config.audio, verbose=False)
        self.seq_len = config.seq_len
        self.hop_len = self.ap.hop_length
        self.pad_short = getattr(config, "pad_short", 0)
        self.use_noise_augment = getattr(config, "use_noise_augment", False) and not is_eval
        self.feat_frames = self.seq_len // self.hop_len
        self._cache = {} if getattr(config, "use_cache", False) else None

    def __len__(self):
        return len(self.samples)

    def preprocess_samples(self):
        pass

    def _load(self, path: str) -> np.ndarray:
        if self._cache is not None and path in self._cache:
            return self._cache[path]
        wav = self.ap.load_wav(path)
        if len(wav) < self.seq_len + self.pad_short:
            wav = np.pad(wav, (0, self.seq_len + self.pad_short - len(wav)))
        if self._cache is not None:
            self._cache[path] = wav
        return wav

    def __getitem__(self, idx: int):
        wav = self._load(self.samples[idx])
        max_start = len(wav) - self.seq_len - 1
        start = 0 if self.is_eval or max_start <= 0 else np.random.randint(0, max_start)
        # snap to hop boundary so mel frames align
        start = (start // self.hop_len) * self.hop_len
        seg = wav[start : start + self.seq_len]
        if self.use_noise_augment:
            seg = seg + (1.0 / 32768.0) * np.random.randn(len(seg))
        mel = self.ap.melspectrogram(seg).astype(np.float32)  # [M, T+1]
        mel = mel[:, : self.feat_frames]
        return {"waveform": seg.astype(np.float32)[:, None], "mel": mel.T}

    def batches(self, batch_size: int, shuffle: bool = True, seed: int = 0, drop_last: bool = False) -> Iterator[dict]:
        order = np.arange(len(self.samples))
        if shuffle:
            np.random.RandomState(seed).shuffle(order)
        for i in range(0, len(order), batch_size):
            idxs = order[i : i + batch_size]
            if drop_last and len(idxs) < batch_size:
                continue
            items = [self[int(j)] for j in idxs]
            yield {
                "waveform": np.stack([it["waveform"] for it in items]),
                "mel": np.stack([it["mel"] for it in items]),
            }
