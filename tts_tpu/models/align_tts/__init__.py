from .config import AlignTTSArgs, AlignTTSConfig  # noqa: F401
from .model import AlignTTS, AlignTTSModule, align_tts_loss, mdn_loss  # noqa: F401
