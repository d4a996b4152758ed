"""Text frontend tests (reference model: tests/text_tests/)."""

import pytest

from tts_tpu.config import BaseTTSConfig, CharactersConfig
from tts_tpu.text import (
    BaseVocabulary,
    Graphemes,
    IPAPhonemes,
    Punctuation,
    TTSTokenizer,
    cleaners,
)
from tts_tpu.text.english import normalize_numbers, number_to_words, ordinal_to_words


def test_number_to_words():
    assert number_to_words(0) == "zero"
    assert number_to_words(7) == "seven"
    assert number_to_words(21) == "twenty-one"
    assert number_to_words(105) == "one hundred five"
    assert number_to_words(1234) == "one thousand two hundred thirty-four"
    assert number_to_words(1000000) == "one million"
    assert number_to_words(-3) == "minus three"


def test_ordinals():
    assert ordinal_to_words(1) == "first"
    assert ordinal_to_words(2) == "second"
    assert ordinal_to_words(3) == "third"
    assert ordinal_to_words(4) == "fourth"
    assert ordinal_to_words(12) == "twelfth"
    assert ordinal_to_words(20) == "twentieth"
    assert ordinal_to_words(21) == "twenty-first"


def test_normalize_numbers():
    assert normalize_numbers("I have 2 cats") == "I have two cats"
    assert normalize_numbers("the 3rd time") == "the third time"
    assert normalize_numbers("pi is 3.14") == "pi is three point one four"
    assert normalize_numbers("$5") == "five dollars"
    assert normalize_numbers("$1.50") == "one dollar, fifty cents"
    assert normalize_numbers("in 1999") == "in nineteen ninety-nine"
    assert normalize_numbers("in 2005") == "in two thousand five"
    assert normalize_numbers("1,000 ships") == "one thousand ships"


def test_english_cleaners():
    assert cleaners.english_cleaners("Dr.  Smith   reads") == "doctor smith reads"
    assert cleaners.english_cleaners("It's 14:06.") == "it's fourteen oh six."
    assert cleaners.basic_cleaners("  Hello   WORLD ") == "hello world"


def test_punctuation_strip_restore():
    punc = Punctuation()
    assert punc.strip("This is. example !") == "This is example"
    split, puncs = punc.strip_to_restore("This is. example !")
    assert split == ["This is", "example"]
    restored = Punctuation.restore(split, puncs)
    assert restored[0] == "This is. example !"


def test_punctuation_only_text():
    punc = Punctuation()
    split, puncs = punc.strip_to_restore("!!")
    assert split == []
    assert Punctuation.restore([], puncs) == ["!!"]


def test_graphemes_roundtrip():
    chars = Graphemes()
    tok = TTSTokenizer(use_phonemes=False, characters=chars)
    text = "Hello world!"
    ids = tok.text_to_ids(text)
    assert tok.ids_to_text(ids) == text


def test_tokenizer_blank_and_eos_bos():
    chars = Graphemes()
    tok = TTSTokenizer(use_phonemes=False, characters=chars, add_blank=True, use_eos_bos=True)
    ids = tok.text_to_ids("ab")
    # blanks interspersed: [blank a blank b blank] + bos/eos wrap
    assert len(ids) == 2 * 2 + 1 + 2
    assert ids[0] == chars.bos_id
    assert ids[-1] == chars.eos_id
    assert ids[1] == chars.blank_id


def test_vocab_order_stability():
    """Vocab layout must match the reference ([pad][eos][bos][blank]+chars+puncs)."""
    chars = Graphemes()
    assert chars.vocab[0] == "<PAD>"
    assert chars.vocab[1] == "<EOS>"
    assert chars.vocab[2] == "<BOS>"
    assert chars.vocab[3] == "<BLNK>"
    assert chars.pad_id == 0
    # punctuations at the tail
    assert chars.vocab[-1] == " " or chars.vocab[-1] in "!'(),-.:;? "
    ipa = IPAPhonemes()
    assert ipa.num_chars == len(ipa.vocab)


def test_base_vocabulary():
    vocab = BaseVocabulary({"a": 0, "b": 1}, pad="a")
    assert vocab.pad_id == 0
    assert vocab.num_chars == 2


def test_oov_discarded():
    chars = Graphemes()
    tok = TTSTokenizer(use_phonemes=False, characters=chars)
    ids = tok.text_to_ids("a€b")
    assert tok.ids_to_text(ids) == "ab"
    assert "€" in tok.not_found_characters


def test_tokenizer_init_from_config():
    cfg = BaseTTSConfig(text_cleaner="english_cleaners", use_phonemes=False)
    tok, new_cfg = TTSTokenizer.init_from_config(cfg)
    ids = tok.text_to_ids("Hello")
    assert len(ids) == 5
    assert new_cfg.characters is not None
    assert new_cfg.characters.characters_class.endswith("Graphemes")


def test_characters_config_roundtrip():
    chars = Graphemes()
    cc = chars.to_config()
    assert isinstance(cc, CharactersConfig)
    rebuilt = Graphemes(
        characters=cc.characters,
        punctuations=cc.punctuations,
        pad=cc.pad,
        eos=cc.eos,
        bos=cc.bos,
        blank=cc.blank,
        is_unique=cc.is_unique,
        is_sorted=cc.is_sorted,
    )
    assert rebuilt.vocab == chars.vocab


def test_japanese_phonemizer():
    """Julius phoneme set (reference tests/text_tests/test_japanese_phonemizer.py
    cases that need no MeCab)."""
    from tts_tpu.text.japanese import japanese_text_to_phonemes
    from tts_tpu.text.phonemizers import JA_JP_Phonemizer

    assert japanese_text_to_phonemes("どういたしまして") == "d o u i t a sh i m a sh i t e"
    assert japanese_text_to_phonemes("ラーメン") == "r a: m e N"
    assert japanese_text_to_phonemes("がっこう") == "g a q k o u"
    assert japanese_text_to_phonemes("キャンセル") == "ky a N s e r u"
    ph = JA_JP_Phonemizer().phonemize("こんにちは", separator="|")
    assert "k|o|N" in ph


def test_korean_romanize():
    from tts_tpu.text.korean_romanize import korean_transliterate

    assert korean_transliterate("안녕하세요") == "annyeonghaseyo"
    assert korean_transliterate("한국어") == "hangugeo"
    assert korean_transliterate("abc 123") == "abc 123"


def test_cmudict():
    import io

    from tts_tpu.text.cmudict import CMUDict, get_arpabet

    data = io.StringIO(
        ";;; comment\n"
        "HELLO  HH AH0 L OW1\n"
        "WORLD  W ER1 L D\n"
        "READ  R EH1 D\n"
        "READ(1)  R IY1 D\n"
    )
    d = CMUDict(data)
    assert len(d) == 3
    assert d.lookup("hello") == ["HH AH0 L OW1"]
    assert d.lookup("read") == ["R EH1 D", "R IY1 D"]
    assert get_arpabet("hello,", d) == "{HH AH0 L OW1},"
    assert get_arpabet("xyzzy", d) == "xyzzy"


def test_hindi_numbers():
    from tts_tpu.text.numbers_multilingual import expand_numbers_hi, hi_number_to_words

    assert hi_number_to_words(0) == "शून्य"
    assert hi_number_to_words(21) == "इक्कीस"
    assert hi_number_to_words(105) == "एक सौ पाँच"
    assert hi_number_to_words(250000) == "दो लाख पचास हज़ार"
    assert expand_numbers_hi("१२ सेब") == "बारह सेब"


def test_english_g2p_fallback():
    """Built-in rule-based English G2P engages when espeak is absent, so
    `use_phonemes: true` configs produce IPA rather than graphemes
    (reference would silently degrade: espeak_wrapper.py:47)."""
    from tts_tpu.config.shared import BaseTTSConfig
    from tts_tpu.text.en_g2p import EnglishG2P, word_to_arpabet
    from tts_tpu.text.phonemizers import (
        DEF_LANG_TO_PHONEMIZER,
        ESpeak,
        get_phonemizer_by_name,
    )
    from tts_tpu.text.tokenizer import TTSTokenizer

    # rules: regular words come out as plausible ARPAbet
    assert word_to_arpabet("cat") == ["K", "AE1", "T"]
    assert word_to_arpabet("make") == ["M", "EY1", "K"]
    assert word_to_arpabet("ship")[0] == "SH"
    assert word_to_arpabet("night") == ["N", "AY1", "T"]
    g = EnglishG2P()
    ipa = g.phonemize("hello world")
    assert "ɛ" in ipa and "ɜ" in ipa  # actual IPA, not letters
    assert ipa.count("ˈ") == 2  # one primary stress per word

    # English always resolves to SOME phonemizer in this registry
    assert "en" in DEF_LANG_TO_PHONEMIZER

    # requesting espeak for English on an espeak-less machine falls back
    if not ESpeak.is_available():
        # the fallback warning is emitted once per process; reset the
        # module-level guard so this test is order-independent
        from tts_tpu.text import phonemizers as _ph_mod

        _ph_mod._WARNED_FALLBACK.discard("en_g2p")
        with pytest.warns(UserWarning, match="rule-based English G2P"):
            ph = get_phonemizer_by_name("espeak", language="en")
        assert ph.name() == "en_g2p"
        out = ph.phonemize("the quick brown fox", separator="|")
        assert "ð" in out

    # end to end: a phoneme config builds a tokenizer that emits phoneme ids
    cfg = BaseTTSConfig(
        text_cleaner="english_cleaners", use_phonemes=True, phoneme_language="en"
    )
    tok, _ = TTSTokenizer.init_from_config(cfg)
    ids = tok.text_to_ids("hello world")
    text_back = tok.ids_to_text(ids)
    assert "h" != text_back[:1] or "ˈ" in text_back  # phonemes, not letters
    assert any(c in text_back for c in "ɛɜʃðæ")
