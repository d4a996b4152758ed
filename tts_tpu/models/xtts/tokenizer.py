"""XTTS BPE tokenizer + multilingual text preprocessing
(reference ``TTS/tts/layers/xtts/tokenizer.py`` VoiceBpeTokenizer).

The BPE model loads the zoo's ``vocab.json`` via the HF ``tokenizers``
library.  Multilingual cleaning covers lowercase + symbol expansion +
number verbalization (full coverage for en; pass-through elsewhere, with
per-language expansion tables growing over time).
"""

from __future__ import annotations

import re
from typing import List, Optional

from tts_tpu.text.cleaners import collapse_whitespace, lowercase
from tts_tpu.text.english import normalize_numbers
from tts_tpu.text.numbers_multilingual import (
    expand_abbreviations_multilingual,
    expand_numbers_multilingual,
    expand_numbers_ja,
    expand_numbers_ko,
    expand_numbers_zh,
    normalize_arabic_indic_digits,
)

_CHAR_LIMITS = {
    "en": 250, "de": 253, "fr": 273, "es": 239, "it": 213, "pt": 203,
    "pl": 224, "zh": 82, "ar": 166, "cs": 186, "ru": 182, "nl": 251,
    "tr": 226, "ja": 71, "hu": 224, "ko": 95, "hi": 250,
}

_SYMBOL_MAP = {
    "en": {"&": " and ", "@": " at ", "%": " percent ", "+": " plus "},
    "fr": {"&": " et ", "@": " arobase ", "%": " pour cent ", "+": " plus "},
    "de": {"&": " und ", "@": " at ", "%": " prozent ", "+": " plus "},
    "es": {"&": " y ", "@": " arroba ", "%": " por ciento ", "+": " más "},
    "it": {"&": " e ", "@": " chiocciola ", "%": " per cento ", "+": " più "},
    "pt": {"&": " e ", "@": " arroba ", "%": " por cento ", "+": " mais "},
}


def multilingual_cleaners(text: str, lang: str) -> str:
    """(reference ``xtts/tokenizer.py`` multilingual_cleaners)"""
    text = text.replace('"', "")
    if lang == "ar":
        text = normalize_arabic_indic_digits(text)
    if lang == "tr":
        text = text.replace("İ", "i").replace("Ö", "ö").replace("Ü", "ü")
    text = lowercase(text)
    text = expand_abbreviations_multilingual(text, lang)
    for sym, replacement in _SYMBOL_MAP.get(lang, _SYMBOL_MAP["en"]).items():
        text = text.replace(sym, replacement)
    if lang == "en":
        text = normalize_numbers(text)
    elif lang == "zh":
        text = expand_numbers_zh(text)
    elif lang == "ko":
        text = expand_numbers_ko(text)
    elif lang == "ja":
        pass  # numbers expand inside japanese_to_romaji (kana without MeCab)
    elif lang == "hi":
        from tts_tpu.text.numbers_multilingual import expand_numbers_hi

        # the reference leaves Hindi at basic_cleaners (tokenizer.py:639);
        # we verbalize numbers too
        text = expand_numbers_hi(text)
    else:
        text = expand_numbers_multilingual(text, lang)
    text = re.sub(r"[\(\)\[\]]+", "", text)
    text = collapse_whitespace(text)
    # script→latin transliteration (reference preprocess_text :630-640)
    if lang == "zh":
        text = _chinese_transliterate(text)
    elif lang == "ko":
        from tts_tpu.text.korean_romanize import korean_transliterate

        text = korean_transliterate(text)
    elif lang == "ja":
        from tts_tpu.text.japanese import japanese_to_romaji

        text = japanese_to_romaji(text)
    return text


def _chinese_transliterate(text: str) -> str:
    """hanzi → TONE3 pinyin (reference uses pypinyin; gated — hanzi pass
    through unchanged when the package is missing)."""
    try:
        import pypinyin

        pypinyin.pinyin  # a test stub may register a bare module
    except (ImportError, AttributeError):
        return text
    return "".join(
        p[0]
        for p in pypinyin.pinyin(
            text, style=pypinyin.Style.TONE3, heteronym=False, neutral_tone_with_five=True
        )
    )


class VoiceBpeTokenizer:
    """(reference ``xtts/tokenizer.py:592``)"""

    def __init__(self, vocab_file: Optional[str] = None):
        self.tokenizer = None
        if vocab_file is not None:
            from tokenizers import Tokenizer

            self.tokenizer = Tokenizer.from_file(vocab_file)
        self.char_limits = dict(_CHAR_LIMITS)

    def check_input_length(self, txt: str, lang: str) -> None:
        lang = lang.split("-")[0]
        limit = self.char_limits.get(lang, 250)
        if len(txt) > limit:
            print(
                f"[!] Warning: text length exceeds the {limit}-char limit for "
                f"language '{lang}'; audio may truncate."
            )

    def preprocess_text(self, txt: str, lang: str) -> str:
        return multilingual_cleaners(txt, lang.split("-")[0])

    def encode(self, txt: str, lang: str) -> List[int]:
        lang = lang.split("-")[0]
        self.check_input_length(txt, lang)
        txt = self.preprocess_text(txt, lang)
        lang = "zh-cn" if lang == "zh" else lang
        txt = f"[{lang}]{txt}"
        txt = txt.replace(" ", "[SPACE]")
        return self.tokenizer.encode(txt).ids

    def decode(self, seq: List[int]) -> str:
        txt = self.tokenizer.decode(seq, skip_special_tokens=False).replace(" ", "")
        return txt.replace("[SPACE]", " ").replace("[STOP]", "").replace("[UNK]", "")

    @property
    def vocab_size(self) -> int:
        return self.tokenizer.get_vocab_size() if self.tokenizer else 0
