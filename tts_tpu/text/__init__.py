"""Text frontend: characters, cleaners, phonemizers, tokenizer.

Host-side rebuild of reference ``TTS/tts/utils/text/``; produces token-id
lists that the data layer pads into static-shape device batches.
"""

from . import cleaners  # noqa: F401
from .characters import (  # noqa: F401
    BaseCharacters,
    BaseVocabulary,
    Graphemes,
    IPAPhonemes,
    parse_symbols,
)
from .phonemizers import (  # noqa: F401
    DEF_LANG_TO_PHONEMIZER,
    PHONEMIZERS,
    BasePhonemizer,
    ESpeak,
    MultiPhonemizer,
    get_phonemizer_by_name,
)
from .punctuation import Punctuation  # noqa: F401
from .tokenizer import TTSTokenizer  # noqa: F401
