from .config import XttsArgs, XttsAudioConfig, XttsConfig  # noqa: F401
from .gpt import XttsGPT  # noqa: F401
from .hifi_decoder import HifiDecoder  # noqa: F401
from .model import Xtts  # noqa: F401
from .tokenizer import VoiceBpeTokenizer  # noqa: F401
