"""Bundled kanji→kana lexicon (``tts_tpu.text.ja_kanji``): Japanese text
with kanji must romanize without fugashi/MeCab installed (the reference
fails hard there — ``TTS/tts/utils/text/japanese/phonemizer.py`` imports
MeCab unconditionally)."""

import warnings

import pytest

from tts_tpu.text.ja_kanji import CHARS, WORDS, kanji_to_kata
from tts_tpu.text.japanese import japanese_text_to_phonemes, japanese_to_romaji


def _no_tagger(monkeypatch):
    import tts_tpu.text.japanese as ja

    monkeypatch.setattr(ja, "_TAGGER", False)


GOLD_ROMAJI = {
    "今日は良い天気ですね。": "kyouwayoitenkidesune",
    "私は日本語を勉強しています。": "watashiwanihongoobenkyoushiteimasu",
    "明日、東京へ行きます。": "ashita, toukyoueikimasu",
    "こんにちは、元気ですか。": "konnichiwa, genkidesuka",
    "これは本です。": "korewahondesu",
    "人々は毎日電車で会社へ行く。": "hitobitowamainichidenshadekaishaeiku",
    "山の上から海が見えます。": "yamanouekaraumigamiemasu",
    "音声合成の技術は面白いです。": "onseigouseinogijutsuwaomoshiroidesu",
    "はい、そうです。": "hai, soudesu",  # word-initial は is NOT a particle
}


@pytest.mark.parametrize("text,want", sorted(GOLD_ROMAJI.items()))
def test_kanji_sentences_romanize_without_mecab(monkeypatch, text, want):
    _no_tagger(monkeypatch)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        got = japanese_to_romaji(text).strip().rstrip(". ")
    assert got == want


def test_phonemes_contain_no_kanji(monkeypatch):
    _no_tagger(monkeypatch)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        phones = japanese_text_to_phonemes("私は毎朝新聞を読みます。")
    assert not any("一" <= c <= "鿿" for c in phones), phones


def test_unmatched_kanji_warns_once(monkeypatch):
    import tts_tpu.text.japanese as ja

    _no_tagger(monkeypatch)
    monkeypatch.setattr(ja, "_WARNED_KANJI", False)
    with pytest.warns(UserWarning, match="bundled lexicon"):
        ja.japanese_text_to_phonemes("鬱蒼とした森。")  # 鬱蒼 not in lexicon


def test_longest_match_beats_single_chars():
    # 今日 must read キョウ, not 今(イマ)+日(ヒ)
    out, unmatched = kanji_to_kata("今日")
    assert out == "キョウ" and unmatched == 0
    # repetition mark repeats the previous reading
    out, _ = kanji_to_kata("人々")
    assert out == "ヒトビト"  # lexicon word, not ヒトヒト


def test_lexicon_values_are_katakana():
    for d in (WORDS, CHARS):
        for k, v in d.items():
            assert all("ァ" <= c <= "ヶ" or c == "ー" for c in v), (k, v)


def test_lexicon_scale():
    """The bundled lexicon should cover everyday text: hundreds of words
    plus per-character defaults."""
    assert len(WORDS) >= 550
    assert len(CHARS) >= 300
