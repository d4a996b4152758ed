from .config import (  # noqa: F401
    FastPitchConfig,
    FastSpeechConfig,
    Fastspeech2Config,
    ForwardTTSArgs,
    ForwardTTSConfig,
    SpeedySpeechConfig,
)
from .model import ForwardTTS, ForwardTTSModule, forward_tts_loss  # noqa: F401
