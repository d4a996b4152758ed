"""Synthesizer — loads TTS + vocoder models and renders text to audio
(reference ``TTS/utils/synthesizer.py:25``).

Differences from the reference: checkpoints are flax msgpack (with config
embedded), sentence splitting is a small regex splitter (pysbd-free), and
model inference is jitted with bucketed frame budgets so repeated calls
hit compiled graphs.
"""

from __future__ import annotations

import re
import time
from typing import List, Optional

import numpy as np

from tts_tpu.audio.processor import AudioProcessor
from tts_tpu.config import load_config, register_config
from tts_tpu.models import setup_model
from tts_tpu.utils.io import load_checkpoint
from tts_tpu.utils.synthesis import synthesis, trim_silence

_SENTENCE_RE = re.compile(r"(?<=[.!?;:])\s+(?=[^\s])")


def split_into_sentences(text: str) -> List[str]:
    """Sentence segmentation (replaces pysbd, ``synthesizer.py:216``)."""
    text = text.strip()
    if not text:
        return []
    parts = _SENTENCE_RE.split(text)
    return [p.strip() for p in parts if p.strip()]


class Synthesizer:
    """Load models once, synthesize many times (reference ``synthesizer.py:25``)."""

    def __init__(
        self,
        tts_checkpoint: str = "",
        tts_config_path: str = "",
        vocoder_checkpoint: str = "",
        vocoder_config: str = "",
        use_griffin_lim: bool = True,
    ):
        self.tts_model = None
        self.tts_params = None
        self.vocoder_params = None
        self.vocoder_model = None
        self.use_griffin_lim = use_griffin_lim
        if tts_checkpoint:
            self._load_tts(tts_checkpoint, tts_config_path)
        if vocoder_checkpoint:
            self._load_vocoder(vocoder_checkpoint, vocoder_config)

    # ------------------------------------------------------------------
    def _load_tts(self, checkpoint_path: str, config_path: str = "") -> None:
        """(reference ``synthesizer.py:168``)"""
        params, config_dict, _ = load_checkpoint(checkpoint_path)
        if config_path:
            config = load_config(config_path)
        else:
            model_name = config_dict.get("model", "")
            config = register_config(model_name.lower()).from_dict(config_dict)
        self.tts_config = config
        self.tts_model = setup_model(config)
        # trainer checkpoints hold named param groups; inference wants the
        # generator group
        if isinstance(params, dict) and set(params) <= {"model", "gen", "disc"}:
            params = params.get("model") or params.get("gen")
        self.tts_params = params
        self.ap = AudioProcessor.init_from_config(config.audio, verbose=False)
        self.output_sample_rate = self.ap.sample_rate

    def _load_vocoder(self, checkpoint_path: str, config_path: str = "") -> None:
        """(reference ``synthesizer.py:207``)"""
        from tts_tpu.vocoder.models.hifigan_generator import HifiganGenerator

        params, config_dict, meta = load_checkpoint(checkpoint_path)
        gen_kwargs = config_dict.get("generator_params", {})
        self.vocoder_model = HifiganGenerator(**gen_kwargs)
        self.vocoder_params = params
        if "audio" in config_dict and config_dict["audio"].get("sample_rate"):
            self.output_sample_rate = config_dict["audio"]["sample_rate"]

    # ------------------------------------------------------------------
    def tts(
        self,
        text: str,
        speaker_name: Optional[str] = None,
        language_name: Optional[str] = None,
        speaker_wav=None,
        split_sentences: bool = True,
        **kwargs,
    ) -> List[float]:
        """Render text to a waveform list (reference ``synthesizer.py:257``)."""
        start = time.time()
        sens = split_into_sentences(text) if split_sentences else [text]
        if not sens:
            raise ValueError("No text to speak.")

        speaker_id = None
        if speaker_name is not None and hasattr(self.tts_model, "speaker_manager"):
            speaker_id = self.tts_model.speaker_manager.name_to_id[speaker_name]
        language_id = None
        if language_name is not None and hasattr(self.tts_model, "language_manager"):
            language_id = self.tts_model.language_manager.name_to_id[language_name]

        wavs: List[float] = []
        for sen in sens:
            out = synthesis(
                self.tts_model,
                sen,
                self.tts_params,
                use_griffin_lim=self.vocoder_model is None and self.use_griffin_lim,
                ap=self.ap,
                speaker_id=speaker_id,
                language_id=language_id,
            )
            if out["wav"] is not None:
                wav = out["wav"]
            elif self.vocoder_model is not None:
                mel = out["model_outputs"]  # [T, M] in ap-normalized domain
                mel = self.ap.denormalize(mel.T).T
                import jax.numpy as jnp

                voc_in = jnp.asarray(mel[None])
                wav = np.asarray(
                    self.vocoder_model.apply(self.vocoder_params, voc_in)[0, :, 0], np.float32
                )
            else:
                raise RuntimeError("No vocoder or Griffin-Lim available.")
            if self.tts_config.audio.do_trim_silence:
                wav = trim_silence(np.asarray(wav), self.ap)
            wavs += list(wav)
            wavs += [0] * 10000  # inter-sentence silence (reference :441)

        process_time = time.time() - start
        audio_time = len(wavs) / self.output_sample_rate
        print(f" > Processing time: {process_time}")
        print(f" > Real-time factor: {process_time / max(audio_time, 1e-9)}")
        return wavs

    def save_wav(self, wav: List[float], path: str, pipe_out=None) -> None:
        from tts_tpu.audio.numpy_transforms import save_wav as _save

        _save(wav=np.asarray(wav), path=path, sample_rate=self.output_sample_rate, pipe_out=pipe_out)
