"""User-facing Python API (reference ``TTS/api.py:15``).

Example:
    >>> from tts_tpu.api import TTS
    >>> tts = TTS(model_path="run/checkpoint.msgpack", config_path="run/config.json")
    >>> tts.tts_to_file("Hello world", file_path="out.wav")
"""

from __future__ import annotations

import os
from typing import List, Optional

from tts_tpu.utils.synthesizer import Synthesizer


class TTS:
    """Facade over ModelManager + Synthesizer (reference ``api.py``)."""

    def __init__(
        self,
        model_name: str = "",
        model_path: Optional[str] = None,
        config_path: Optional[str] = None,
        vocoder_path: Optional[str] = None,
        vocoder_config_path: Optional[str] = None,
        progress_bar: bool = True,
        speakers_file_path: Optional[str] = None,
        language_ids_file_path: Optional[str] = None,
        encoder_path: Optional[str] = None,
        encoder_config_path: Optional[str] = None,
        voice_dir: Optional[str] = None,
    ):
        self.synthesizer: Optional[Synthesizer] = None
        self.voice_converter: Optional[Synthesizer] = None
        self.model_name = model_name
        self._speakers_file_path = speakers_file_path or ""
        self._language_ids_file_path = language_ids_file_path or ""
        self._encoder_path = encoder_path or ""
        self._encoder_config_path = encoder_config_path or ""
        self._voice_dir = voice_dir
        if model_name:
            if "voice_conversion" in model_name:
                self.load_vc_model_by_name(model_name)
            else:
                self.load_tts_model_by_name(
                    model_name, vocoder_path=vocoder_path, vocoder_config=vocoder_config_path
                )
        elif model_path:
            self.load_tts_model_by_path(
                model_path, config_path, vocoder_path=vocoder_path, vocoder_config=vocoder_config_path
            )

    # ------------------------------------------------------------------
    @property
    def is_multi_speaker(self) -> bool:
        if self.synthesizer is None or self.synthesizer.tts_model is None:
            return False
        sm = getattr(self.synthesizer.tts_model, "speaker_manager", None)
        return bool(sm and sm.num_speakers > 1)

    @property
    def speakers(self) -> List[str]:
        if not self.is_multi_speaker:
            return []
        return self.synthesizer.tts_model.speaker_manager.speaker_names

    @property
    def is_multi_lingual(self) -> bool:
        if self.synthesizer is None or self.synthesizer.tts_model is None:
            return False
        if "xtts" in (self.model_name or "") or self.synthesizer.tts_config.model == "xtts":
            return True
        lm = getattr(self.synthesizer.tts_model, "language_manager", None)
        return bool(lm and len(getattr(lm, "name_to_id", {}) or {}) > 1)

    @property
    def languages(self) -> List[str]:
        if self.synthesizer is None or not self.is_multi_lingual:
            return []
        if self.synthesizer.tts_config.model == "xtts":
            return list(getattr(self.synthesizer.tts_config.model_args, "languages", []) or [])
        return list(self.synthesizer.tts_model.language_manager.name_to_id)

    @staticmethod
    def list_models() -> List[str]:
        from tts_tpu.utils.manage import ModelManager

        return ModelManager().list_models()

    def load_tts_model_by_name(
        self, model_name: str, vocoder_path: Optional[str] = None, vocoder_config: Optional[str] = None
    ) -> None:
        from tts_tpu.utils.manage import ModelManager

        manager = ModelManager()
        model_path, config_path, model_item = manager.download_model(model_name)
        if config_path is None and os.path.isdir(model_path):
            # multi-file model dir (XTTS): Synthesizer loads it whole
            self.synthesizer = Synthesizer(model_dir=model_path, voice_dir=self._voice_dir)
            return
        if vocoder_path is None:
            # explicit vocoder override beats the zoo default (reference
            # synthesize.py --vocoder_name / --vocoder_path handling)
            vocoder_name = model_item.get("default_vocoder")
            vocoder_config = None
            if vocoder_name:
                vocoder_path, vocoder_config, _ = manager.download_model(vocoder_name)
        self.load_tts_model_by_path(
            model_path, config_path, vocoder_path=vocoder_path, vocoder_config=vocoder_config
        )

    def load_tts_model_by_path(
        self, model_path: str, config_path: Optional[str] = None, vocoder_path=None, vocoder_config=None
    ) -> None:
        self.synthesizer = Synthesizer(
            tts_checkpoint=model_path,
            tts_config_path=config_path or "",
            tts_speakers_file=self._speakers_file_path,
            tts_languages_file=self._language_ids_file_path,
            vocoder_checkpoint=vocoder_path or "",
            vocoder_config=vocoder_config or "",
            encoder_checkpoint=self._encoder_path,
            encoder_config=self._encoder_config_path,
            voice_dir=self._voice_dir,
        )

    def load_vc_model_by_name(self, model_name: str) -> None:
        """(reference ``api.py:150 load_vc_model_by_name``)"""
        from tts_tpu.utils.manage import ModelManager

        model_path, config_path, _ = ModelManager().download_model(model_name)
        self.load_vc_model_by_path(model_path, config_path)

    def load_vc_model_by_path(self, model_path: str, config_path: Optional[str] = None) -> None:
        self.voice_converter = Synthesizer(
            vc_checkpoint=model_path, vc_config=config_path or ""
        )

    # ------------------------------------------------------------------
    def tts(
        self,
        text: str,
        speaker: Optional[str] = None,
        language: Optional[str] = None,
        speaker_wav: Optional[str] = None,
        emotion: Optional[str] = None,
        speed: Optional[float] = None,
        split_sentences: bool = True,
        **kwargs,
    ):
        """Text → waveform samples (reference ``api.py:237``)."""
        if emotion is not None and speed is not None:
            # signature parity: the reference accepts these only for the
            # discontinued Coqui Studio backend and raises (api.py:234)
            raise ValueError(
                "Emotion and speed can only be used with Coqui Studio models. Which is discontinued."
            )
        if self.synthesizer is None:
            raise RuntimeError("No model loaded.")
        return self.synthesizer.tts(
            text,
            speaker_name=speaker,
            language_name=language,
            speaker_wav=speaker_wav,
            split_sentences=split_sentences,
            **kwargs,
        )

    def tts_to_file(
        self,
        text: str,
        speaker: Optional[str] = None,
        language: Optional[str] = None,
        speaker_wav: Optional[str] = None,
        emotion: Optional[str] = None,
        speed: Optional[float] = None,
        file_path: str = "output.wav",
        pipe_out=None,
        split_sentences: bool = True,
        **kwargs,
    ) -> str:
        """Text → wav file (reference ``api.py:290``)."""
        wav = self.tts(
            text, speaker=speaker, language=language, speaker_wav=speaker_wav,
            emotion=emotion, speed=speed, split_sentences=split_sentences, **kwargs,
        )
        self.synthesizer.save_wav(wav, file_path, pipe_out=pipe_out)
        return file_path

    def tts_stream(
        self,
        text: str,
        speaker: Optional[str] = None,
        language: Optional[str] = None,
        speaker_wav: Optional[str] = None,
        split_sentences: bool = True,
        **kwargs,
    ):
        """Incremental synthesis: yield float32 audio chunks as they decode
        (streaming models only, e.g. XTTS; no reference equivalent at the
        API layer — the reference streams only inside the model)."""
        if self.synthesizer is None:
            raise RuntimeError("No model loaded.")
        return self.synthesizer.tts_stream(
            text,
            speaker_name=speaker,
            language_name=language,
            speaker_wav=speaker_wav,
            split_sentences=split_sentences,
            **kwargs,
        )

    # ------------------------------------------------------------------
    def voice_conversion(self, source_wav: str, target_wav: str):
        """Convert the voice in ``source_wav`` to the voice of ``target_wav``
        (reference ``api.py:345``)."""
        converter = self.voice_converter or self.synthesizer
        if converter is None:
            raise RuntimeError("No model loaded.")
        return converter.voice_conversion(source_wav=source_wav, target_wav=target_wav)

    def voice_conversion_to_file(
        self, source_wav: str, target_wav: str, file_path: str = "output.wav"
    ) -> str:
        """(reference ``api.py:363``)"""
        wav = self.voice_conversion(source_wav=source_wav, target_wav=target_wav)
        (self.voice_converter or self.synthesizer).save_wav(wav, file_path)
        return file_path

    def tts_with_vc(
        self,
        text: str,
        language: Optional[str] = None,
        speaker_wav: Optional[str] = None,
        speaker: Optional[str] = None,
        split_sentences: bool = True,
    ):
        """Synthesize, then convert the result to the ``speaker_wav`` voice
        with FreeVC (reference ``api.py:381``)."""
        import tempfile

        with tempfile.NamedTemporaryFile(suffix=".wav", delete=False) as fp:
            self.tts_to_file(
                text=text, speaker=speaker, language=language,
                file_path=fp.name, split_sentences=split_sentences,
            )
            if self.voice_converter is None:
                self.load_vc_model_by_name("voice_conversion_models/multilingual/vctk/freevc24")
            return self.voice_converter.voice_conversion(source_wav=fp.name, target_wav=speaker_wav)

    def tts_with_vc_to_file(
        self,
        text: str,
        language: Optional[str] = None,
        speaker_wav: Optional[str] = None,
        file_path: str = "output.wav",
        speaker: Optional[str] = None,
        split_sentences: bool = True,
    ) -> str:
        """(reference ``api.py:422``)"""
        wav = self.tts_with_vc(
            text=text, language=language, speaker_wav=speaker_wav,
            speaker=speaker, split_sentences=split_sentences,
        )
        self.voice_converter.save_wav(wav, file_path)
        return file_path
