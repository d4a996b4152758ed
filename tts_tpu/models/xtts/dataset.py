"""XTTS GPT fine-tune dataset (reference
``TTS/tts/layers/xtts/trainer/dataset.py``): corpus samples → padded
batches of text tokens + cloning-domain mels + conditioning mels.

TPU redesign: instead of ragged per-batch padding, batches are
length-sorted and padded to bucket boundaries (static shapes, bounded
recompiles) and the mel spectrograms are computed **on device** in one
batched :func:`wav_to_mel_cloning` call per batch instead of per-sample
torchaudio transforms.
"""

from __future__ import annotations

import random
from typing import Dict, Iterator, List, Optional

import numpy as np

from tts_tpu.data.dataset import audio_length_samples, round_up


class XTTSDataset:
    """Produces batches with the :class:`GPTTrainer` contract keys:
    ``text_input/text_lengths/mel_input/mel_lengths/cond_mels``."""

    def __init__(
        self,
        config,
        samples: List[dict],
        tokenizer,
        sample_rate: int = 22050,
        is_eval: bool = False,
        pad_to_multiple_text: int = 16,
        pad_to_multiple_wav: int = 8192,
        verbose: bool = False,
    ):
        a = config.model_args
        self.config = config
        self.tokenizer = tokenizer
        self.sample_rate = sample_rate
        self.is_eval = is_eval
        self.max_cond_len = int(a.max_conditioning_length)
        self.min_cond_len = int(a.min_conditioning_length)
        # clamp to what the GPT position tables can actually take: audio
        # codes are wav/(hop·4) (+start/stop), text +start/stop
        stride = int(getattr(a, "gpt_code_stride_len", 1024))
        self.max_wav_len = min(
            int(a.max_wav_length), (int(a.gpt_max_audio_tokens) - 2) * stride
        )
        self.max_text_len = min(int(a.max_text_length), int(a.gpt_max_text_tokens) - 2)
        self.pad_to_multiple_text = pad_to_multiple_text
        self.pad_to_multiple_wav = pad_to_multiple_wav
        self._token_cache: Dict[str, np.ndarray] = {}

        kept = []
        for s in samples:
            n = audio_length_samples(s["audio_file"], sample_rate)
            # ultra-short clips are useless for conditioning (ref dataset.py:115)
            if 0.5 * sample_rate <= n <= self.max_wav_len:
                s = dict(s)
                s["audio_length"] = n
                kept.append(s)
        if verbose:
            print(f" | > XTTSDataset: kept {len(kept)}/{len(samples)} samples")
        self.samples = kept

    # ------------------------------------------------------------------
    def __len__(self) -> int:
        return len(self.samples)

    def _tokens(self, sample: dict) -> Optional[np.ndarray]:
        key = sample["audio_file"]
        if key not in self._token_cache:
            lang = sample.get("language") or "en"
            ids = np.asarray(self.tokenizer.encode(sample["text"], lang), np.int32)
            self._token_cache[key] = ids
        ids = self._token_cache[key]
        return None if len(ids) > self.max_text_len else ids

    def _load_wav(self, path: str) -> np.ndarray:
        from tts_tpu.audio.numpy_transforms import load_wav

        return load_wav(filename=path, sample_rate=self.sample_rate, resample=True)

    def _prompt_slice(self, wav: np.ndarray, rng: random.Random) -> np.ndarray:
        """Conditioning slice from the ground-truth clip (the reference's
        masking-GT-prompt approach, ``dataset.py:26 get_prompt_slice``):
        eval = deterministic mid-length slice from 0, train = random."""
        if self.is_eval:
            length = (self.min_cond_len + self.max_cond_len) // 2
            start = 0
        else:
            length = rng.randint(self.min_cond_len, self.max_cond_len)
            start = 0
        if length > len(wav):
            length = len(wav) // 2
        if not self.is_eval:
            start = rng.randint(0, max(0, len(wav) - length))
        clip = wav[start : start + length]
        out = np.zeros((self.max_cond_len,), np.float32)
        out[: len(clip)] = clip
        return out

    # ------------------------------------------------------------------
    def batches(
        self,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = False,
        **_unused,
    ) -> Iterator[dict]:
        rng = random.Random(seed)
        order = sorted(range(len(self.samples)), key=lambda i: self.samples[i]["audio_length"])
        groups = [order[i : i + batch_size] for i in range(0, len(order), batch_size)]
        if drop_last and groups and len(groups[-1]) < batch_size:
            groups = groups[:-1]
        if shuffle and not self.is_eval:
            rng.shuffle(groups)
        for g in groups:
            batch = self._build_batch([self.samples[i] for i in g], rng)
            if batch is not None:
                yield batch

    def _build_batch(self, items: List[dict], rng: random.Random) -> Optional[dict]:
        toks, wavs, conds = [], [], []
        for s in items:
            t = self._tokens(s)
            if t is None:
                continue
            wav = self._load_wav(s["audio_file"])[: self.max_wav_len]
            toks.append(t)
            wavs.append(wav.astype(np.float32))
            conds.append(self._prompt_slice(wav, rng))
        if not toks:
            return None
        B = len(toks)
        T_text = round_up(max(len(t) for t in toks), self.pad_to_multiple_text)
        T_wav = round_up(max(len(w) for w in wavs), self.pad_to_multiple_wav)

        text = np.zeros((B, T_text), np.int32)
        wav_pad = np.zeros((B, T_wav), np.float32)
        for i, (t, w) in enumerate(zip(toks, wavs)):
            text[i, : len(t)] = t
            wav_pad[i, : len(w)] = w
        text_lengths = np.asarray([len(t) for t in toks], np.int32)
        wav_lengths = np.asarray([len(w) for w in wavs], np.int32)

        mel, cond_mel = self._wavs_to_mels(wav_pad, np.stack(conds))
        # DVAE stride is 4: trim/pad mel frames to a multiple of 4 so the
        # ×4-upsampled reconstruction matches the input
        T4 = (mel.shape[1] // 4) * 4
        if T4 == 0:
            T4 = 4
            mel = np.pad(mel, ((0, 0), (0, 4 - mel.shape[1]), (0, 0)))
        mel = mel[:, :T4]
        hop = 256  # cloning-domain hop (wav_to_mel_cloning default)
        return {
            "text_input": text,
            "text_lengths": text_lengths,
            "mel_input": mel,
            "mel_lengths": (wav_lengths // hop // 4) * 4,  # DVAE needs /4 frames
            "cond_mels": cond_mel,
            "wav_lengths": wav_lengths,
        }

    def _wavs_to_mels(self, wavs: np.ndarray, conds: np.ndarray):
        """Batched on-device cloning mels (one jitted call per bucket shape)."""
        import jax
        import jax.numpy as jnp

        from .model import wav_to_mel_cloning

        if not hasattr(self, "_mel_fn"):
            # wav_to_mel_cloning already returns time-major [B, T, 80]
            self._mel_fn = jax.jit(lambda w: wav_to_mel_cloning(jnp.asarray(w)))
        mel = np.asarray(self._mel_fn(jnp.asarray(wavs)), np.float32)  # [B, T, 80]
        cond = np.asarray(self._mel_fn(jnp.asarray(conds)), np.float32)
        return mel, cond
