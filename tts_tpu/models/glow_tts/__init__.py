from .config import GlowTTSConfig  # noqa: F401
from .model import GlowTTS, GlowTTSModule, glow_tts_loss  # noqa: F401
