from .config import DelightfulTTSConfig, DelightfulTtsArgs  # noqa: F401
from .model import DelightfulTTS, DelightfulTtsModule  # noqa: F401
