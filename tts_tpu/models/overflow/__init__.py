from .config import NeuralhmmTTSConfig, OverflowConfig  # noqa: F401
from .model import NeuralhmmTTS, Overflow  # noqa: F401
