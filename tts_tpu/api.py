"""User-facing Python API (reference ``TTS/api.py:15``).

Example:
    >>> from tts_tpu.api import TTS
    >>> tts = TTS(model_path="run/checkpoint.msgpack", config_path="run/config.json")
    >>> tts.tts_to_file("Hello world", file_path="out.wav")
"""

from __future__ import annotations

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
    ):
        self.synthesizer: Optional[Synthesizer] = None
        self.model_name = model_name
        if model_name:
            self.load_tts_model_by_name(model_name)
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

    @staticmethod
    def list_models() -> List[str]:
        from tts_tpu.utils.manage import ModelManager

        return ModelManager().list_models()

    def load_tts_model_by_name(self, model_name: str) -> None:
        from tts_tpu.utils.manage import ModelManager

        manager = ModelManager()
        model_path, config_path, model_item = manager.download_model(model_name)
        vocoder_name = model_item.get("default_vocoder")
        vocoder_path = vocoder_config = None
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
            vocoder_checkpoint=vocoder_path or "",
            vocoder_config=vocoder_config or "",
        )

    # ------------------------------------------------------------------
    def tts(
        self,
        text: str,
        speaker: Optional[str] = None,
        language: Optional[str] = None,
        speaker_wav: Optional[str] = None,
        split_sentences: bool = True,
        **kwargs,
    ):
        """Text → waveform samples (reference ``api.py:237``)."""
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
        file_path: str = "output.wav",
        pipe_out=None,
        split_sentences: bool = True,
        **kwargs,
    ) -> str:
        """Text → wav file (reference ``api.py:290``)."""
        wav = self.tts(
            text, speaker=speaker, language=language, speaker_wav=speaker_wav,
            split_sentences=split_sentences, **kwargs,
        )
        self.synthesizer.save_wav(wav, file_path, pipe_out=pipe_out)
        return file_path
