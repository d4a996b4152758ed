"""Tortoise redaction: wav2vec2-CTC audio↔text alignment
(reference ``TTS/tts/layers/tortoise/wav2vec_alignment.py``).

Tortoise lets users bracket text ("[this] is redacted") and cuts the
bracketed spans out of the generated audio by CTC-aligning the expected
text against wav2vec2 logits.  The backbone runs as the flax
:class:`~tts_tpu.vc.modules.wavlm.WavLM` stack (wav2vec2-large-robust is
the pre-LN / layer-norm-extractor variant) + a CTC head; weights convert
from the HF ``Wav2Vec2ForCTC`` state dict.  The character tokenizer is a
plain vocab dict (the reference downloads ``jbetker/tacotron-symbols``;
zero-egress: pass the vocab in).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tts_tpu.vc.modules.wavlm import WavLM, WavLMConfig

__all__ = [
    "max_alignment",
    "wav2vec2_large_robust_config",
    "Wav2Vec2CTC",
    "convert_hf_wav2vec2_ctc",
    "Wav2VecAlignment",
]


def wav2vec2_large_robust_config() -> WavLMConfig:
    """wav2vec2-large-robust dims (pre-LN, layer-norm conv extractor)."""
    return WavLMConfig(
        extractor_mode="layer_norm",
        encoder_layers=24,
        encoder_embed_dim=1024,
        encoder_ffn_embed_dim=4096,
        encoder_attention_heads=16,
        layer_norm_first=True,
        conv_bias=True,
        relative_position_embedding=False,
        gru_rel_pos=False,
    )


class Wav2Vec2CTC(nn.Module):
    """wav [B, T] (zero-mean/unit-var) → CTC logits [B, T', vocab]."""

    cfg: WavLMConfig
    vocab_size: int = 182

    @nn.compact
    def __call__(self, wav: jnp.ndarray) -> jnp.ndarray:
        h = WavLM(self.cfg, name="wav2vec2")(wav)
        return nn.Dense(self.vocab_size, name="lm_head")(h)


def convert_hf_wav2vec2_ctc(state: dict) -> dict:
    """HF ``Wav2Vec2ForCTC`` state dict → flax :class:`Wav2Vec2CTC` params."""
    from tts_tpu.models.bark.hubert import convert_hf_hubert
    from tts_tpu.utils.convert import linear_kernel

    s = {k: np.asarray(v) for k, v in state.items()}
    backbone = {k[len("wav2vec2."):]: v for k, v in s.items() if k.startswith("wav2vec2.")}
    p = convert_hf_hubert(backbone)["params"]
    # layer-norm extractor mode: per-conv layer norms instead of gn_0
    fe = p["feature_extractor"]
    fe.pop("gn_0", None)
    i = 0
    while f"feature_extractor.conv_layers.{i}.conv.weight" in backbone:
        if f"feature_extractor.conv_layers.{i}.layer_norm.weight" in backbone:
            fe[f"ln_{i}"] = {
                "scale": backbone[f"feature_extractor.conv_layers.{i}.layer_norm.weight"],
                "bias": backbone[f"feature_extractor.conv_layers.{i}.layer_norm.bias"],
            }
        i += 1
    return {
        "params": {
            "wav2vec2": p,
            "lm_head": {
                "kernel": linear_kernel(s["lm_head.weight"]),
                "bias": s["lm_head.bias"],
            },
        }
    }


# ----------------------------------------------------------------------
def max_alignment(s1: str, s2: str, skip_character: str = "~") -> str:
    """Align ``s1`` into ``s2`` preserving order; characters of ``s1`` with
    no match become ``skip_character``.  Bottom-up rewrite of the
    reference's memoized recursion with its exact semantics (first-char
    matches are taken greedily; score ties prefer consuming ``s1``)."""
    assert skip_character not in s1, f"skip character {skip_character} in {s1!r}"
    n, m = len(s1), len(s2)
    # cell[i][j] = (aligned string, matched count) for s1[i:] vs s2[j:]
    cell = [[("", 0)] * (m + 1) for _ in range(n + 1)]
    for i in range(n, -1, -1):
        for j in range(m, -1, -1):
            if i == n:
                cell[i][j] = ("", 0)
            elif j == m:
                cell[i][j] = (skip_character * (n - i), 0)
            elif s1[i] == s2[j]:
                sub, sc = cell[i + 1][j + 1]
                cell[i][j] = (s1[i] + sub, sc + 1)
            else:
                t1, sc1 = cell[i][j + 1]      # skip a char of s2
                t2, sc2 = cell[i + 1][j]      # give up on s1[i]
                if sc1 > sc2:
                    cell[i][j] = (t1, sc1)
                else:
                    cell[i][j] = (skip_character + t2, sc2)
    return cell[0][0][0]


class Wav2VecAlignment:
    """CTC-based audio↔text alignment + bracket redaction (reference
    ``Wav2VecAlignment``).

    ``vocab``: char → token id (the reference's tacotron-symbols tokenizer);
    ``logits_fn(wav [1, T16k]) -> [T', vocab]`` produces CTC logits — pass
    the converted flax model's jitted apply, or any callable (tests use a
    synthetic one)."""

    def __init__(self, logits_fn, vocab: Dict[str, int], pad_token: int = 0):
        self.logits_fn = logits_fn
        self.vocab = vocab
        self.inv_vocab = {v: k for k, v in vocab.items()}
        self.pad_token = pad_token

    def _decode(self, ids: Sequence[int]) -> str:
        out = []
        prev = None
        for t in ids:  # CTC collapse: dedupe + drop pad
            if t != prev and t != self.pad_token:
                out.append(self.inv_vocab.get(int(t), ""))
            prev = t
        return "".join(out)

    def _encode(self, text: str) -> List[int]:
        return [self.vocab[c] for c in text if c in self.vocab]

    def align(self, audio: np.ndarray, expected_text: str,
              audio_sample_rate: int = 24000) -> List[int]:
        """Per-character sample offsets of ``expected_text`` in ``audio``
        (reference ``align``, wav2vec_alignment.py:55)."""
        from tts_tpu.audio.numpy_transforms import resample_wav

        orig_len = len(audio)
        wav = np.asarray(audio, np.float32)
        if audio_sample_rate != 16000:
            wav = resample_wav(wav, audio_sample_rate, 16000)
        wav = (wav - wav.mean()) / np.sqrt(wav.var() + 1e-7)
        logits = np.asarray(self.logits_fn(wav[None]))
        if logits.ndim == 3:
            logits = logits[0]

        pred_string = self._decode(logits.argmax(-1).tolist())
        fixed_expectation = max_alignment(expected_text.lower(), pred_string)
        w2v_compression = orig_len // logits.shape[0]
        # encode per character, keeping ~ placeholders aligned with chars
        expected_tokens = [self.vocab.get(c, -2) for c in fixed_expectation]
        expected_chars = list(fixed_expectation)
        if len(expected_tokens) <= 1:
            return [0]
        expected_tokens.pop(0)
        expected_chars.pop(0)

        alignments = [0]

        def pop_till_you_win():
            if not expected_tokens:
                return None
            popped = expected_tokens.pop(0)
            popped_char = expected_chars.pop(0)
            while popped_char == "~":
                alignments.append(-1)
                if not expected_tokens:
                    return None
                popped = expected_tokens.pop(0)
                popped_char = expected_chars.pop(0)
            return popped

        next_expected = pop_till_you_win()
        for i, frame in enumerate(logits):
            if next_expected == int(frame.argmax()):
                alignments.append(i * w2v_compression)
                if expected_tokens:
                    next_expected = pop_till_you_win()
                else:
                    break
        pop_till_you_win()
        if expected_tokens or len(alignments) != len(expected_text):
            raise RuntimeError(
                f"alignment failed: {len(expected_tokens)} tokens left, "
                f"{len(alignments)}/{len(expected_text)} chars aligned"
            )

        # interpolate the unmatched (-1) positions (reference :111-122)
        alignments.append(orig_len)
        for i in range(len(alignments)):
            if alignments[i] == -1:
                next_found = next(
                    j for j in range(i + 1, len(alignments)) if alignments[j] != -1
                )
                for j in range(i, next_found):
                    gap = alignments[next_found] - alignments[i - 1]
                    alignments[j] = (j - i + 1) * gap // (next_found - i + 1) + alignments[i - 1]
        return alignments[:-1]

    def redact(self, audio: np.ndarray, expected_text: str,
               audio_sample_rate: int = 24000) -> np.ndarray:
        """Cut ``[bracketed]`` spans out of the audio (reference ``redact``)."""
        if "[" not in expected_text:
            return audio
        splitted = expected_text.split("[")
        fully_split = [splitted[0]]
        for spl in splitted[1:]:
            assert "]" in spl, 'every "[" must pair with a "]" (no nesting)'
            fully_split.extend(spl.split("]"))

        non_redacted = []
        last = 0
        for i, frag in enumerate(fully_split):
            if i % 2 == 0:
                non_redacted.append((last, max(0, last + len(frag) - 1)))
            last += len(frag)

        bare_text = "".join(fully_split)
        alignments = self.align(audio, bare_text, audio_sample_rate)
        pieces = [audio[alignments[a]: alignments[b]] for a, b in non_redacted]
        return np.concatenate([p for p in pieces if len(p)]) if pieces else audio
