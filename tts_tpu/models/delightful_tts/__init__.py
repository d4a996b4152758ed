from .config import DelightfulTTSConfig, DelightfulTtsArgs  # noqa: F401
from .model import DelightfulTTS  # noqa: F401
from .acoustic_model import AcousticModel  # noqa: F401
