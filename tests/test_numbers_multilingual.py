"""Multilingual number verbalization (replaces the reference's num2words
dependency, ``xtts/tokenizer.py:518``)."""

import pytest

from tts_tpu.text.numbers_multilingual import (
    expand_abbreviations_multilingual,
    expand_numbers_multilingual,
    number_to_words,
)


@pytest.mark.parametrize(
    "lang,n,expected",
    [
        ("es", 0, "cero"), ("es", 21, "veintiuno"), ("es", 31, "treinta y uno"),
        ("es", 100, "cien"), ("es", 101, "ciento uno"), ("es", 555, "quinientos cincuenta y cinco"),
        ("es", 1000, "mil"), ("es", 2023, "dos mil veintitrés"), ("es", 1000000, "un millón"),
        ("fr", 17, "dix-sept"), ("fr", 21, "vingt et un"), ("fr", 71, "soixante et onze"),
        ("fr", 80, "quatre-vingts"), ("fr", 81, "quatre-vingt-un"),
        ("fr", 99, "quatre-vingt-dix-neuf"), ("fr", 200, "deux cents"),
        ("fr", 201, "deux cent un"), ("fr", 1999, "mille neuf cent quatre-vingt-dix-neuf"),
        ("de", 21, "einundzwanzig"), ("de", 35, "fünfunddreißig"),
        ("de", 101, "einhunderteins"), ("de", 1001, "eintausendeins"),
        ("de", 21000, "einundzwanzigtausend"), ("de", 2000000, "zwei millionen"),
        ("it", 21, "ventuno"), ("it", 23, "ventitré"), ("it", 28, "ventotto"),
        ("it", 103, "centotré"), ("it", 1000, "mille"), ("it", 2000, "duemila"),
        ("it", 1000000, "un milione"),
        ("pt", 16, "dezesseis"), ("pt", 100, "cem"), ("pt", 101, "cento e um"),
        ("pt", 121, "cento e vinte e um"), ("pt", 2000, "dois mil"),
        ("pt", 1000000, "um milhão"),
    ],
)
def test_cardinals(lang, n, expected):
    assert number_to_words(n, lang) == expected


def test_decimals_and_currency():
    assert expand_numbers_multilingual("3,5 euros", "es") == "tres coma cinco euros"
    assert expand_numbers_multilingual("$2", "es") == "dos dólares"
    assert expand_numbers_multilingual("$1", "en") == "$1"  # en handled elsewhere
    assert expand_numbers_multilingual("2€", "fr") == "deux euros"
    assert expand_numbers_multilingual("1,5", "de") == "eins komma fünf"


def test_unsupported_language_passthrough():
    assert expand_numbers_multilingual("我有42个", "zh") == "我有42个"
    assert number_to_words(42, "xx") == "42"


def test_abbreviations():
    assert expand_abbreviations_multilingual("sr. garcía", "es") == "señor garcía"
    assert expand_abbreviations_multilingual("mme. curie", "fr") == "madame curie"
    assert expand_abbreviations_multilingual("dr. house", "en") == "doctor house"


def test_tokenizer_preprocess_path():
    from tts_tpu.models.xtts.tokenizer import multilingual_cleaners

    assert multilingual_cleaners("Tengo 21 euros", "es") == "tengo veintiuno euros"
    assert multilingual_cleaners("Il a 80 ans", "fr") == "il a quatre-vingts ans"


def test_chinese_cardinals():
    from tts_tpu.text.numbers_multilingual import expand_numbers_zh, zh_number_to_words

    assert zh_number_to_words(42) == "四十二"
    assert zh_number_to_words(101) == "一百零一"
    assert zh_number_to_words(2000) == "两千"
    assert zh_number_to_words(20005) == "两万零五"
    assert zh_number_to_words(12345) == "一万两千三百四十五"
    assert expand_numbers_zh("我有42个苹果和3.5元") == "我有四十二个苹果和三点五元"

    from tts_tpu.models.xtts.tokenizer import multilingual_cleaners

    assert multilingual_cleaners("我有42个", "zh") == "我有四十二个"


@pytest.mark.parametrize(
    "lang,n,expected",
    [
        ("ru", 21, "двадцать один"), ("ru", 1000, "одна тысяча"),
        ("ru", 2000, "две тысячи"), ("ru", 5000, "пять тысяч"),
        ("ru", 11000, "одиннадцать тысяч"), ("ru", 21000, "двадцать одна тысяча"),
        ("ru", 2000000, "два миллиона"),
        ("nl", 21, "eenentwintig"), ("nl", 22, "tweeëntwintig"),
        ("nl", 33, "drieëndertig"), ("nl", 2100, "tweeduizend honderd"),
        ("nl", 1000000, "een miljoen"),
    ],
)
def test_ru_nl_cardinals(lang, n, expected):
    assert number_to_words(n, lang) == expected


@pytest.mark.parametrize(
    "lang,n,expected",
    [
        ("tr", 42, "kırk iki"), ("tr", 100, "yüz"), ("tr", 250, "iki yüz elli"),
        ("tr", 1000, "bin"), ("tr", 2023, "iki bin yirmi üç"),
        ("pl", 21, "dwadzieścia jeden"), ("pl", 2000, "dwa tysiące"),
        ("pl", 5000, "pięć tysięcy"), ("pl", 12000, "dwanaście tysięcy"),
        ("pl", 22000, "dwadzieścia dwa tysiące"),
        ("hu", 12, "tizenkettő"), ("hu", 21, "huszonegy"),
        ("hu", 200, "kétszáz"), ("hu", 365, "háromszázhatvanöt"),
        ("hu", 2023, "kétezer-huszonhárom"), ("hu", 22000, "huszonkétezer"),
    ],
)
def test_tr_pl_hu_cardinals(lang, n, expected):
    assert number_to_words(n, lang) == expected


def test_cs_ko_cardinals():
    from tts_tpu.text.numbers_multilingual import _ko_cardinal, expand_numbers_ko

    assert number_to_words(200, "cs") == "dvě stě"
    assert number_to_words(2000, "cs") == "dva tisíce"
    assert number_to_words(5000, "cs") == "pět tisíc"
    assert _ko_cardinal(16) == "십육"
    assert _ko_cardinal(12345) == "만이천삼백사십오"
    assert expand_numbers_ko("42개") == "사십이개"

    from tts_tpu.models.xtts.tokenizer import multilingual_cleaners

    # reference preprocess_text romanizes Korean after cleaning
    # (xtts/tokenizer.py:636 korean_transliterate)
    assert multilingual_cleaners("42개", "ko") == "sasibigae"
    assert multilingual_cleaners("Mám 200 korun", "cs") == "mám dvě stě korun"


def test_arabic():
    from tts_tpu.text.numbers_multilingual import normalize_arabic_indic_digits

    assert number_to_words(25, "ar") == "خمسة وعشرون"
    assert number_to_words(345, "ar") == "ثلاثمئة وخمسة وأربعون"
    assert number_to_words(3000, "ar") == "ثلاثة آلاف"
    assert normalize_arabic_indic_digits("٤٢") == "42"

    from tts_tpu.models.xtts.tokenizer import multilingual_cleaners

    assert multilingual_cleaners("لدي ٤٢ تفاحة", "ar") == "لدي اثنان وأربعون تفاحة"


def test_japanese():
    from tts_tpu.text.numbers_multilingual import ja_number_to_words

    assert ja_number_to_words(16) == "十六"
    assert ja_number_to_words(1000) == "千"
    assert ja_number_to_words(10000) == "一万"
    assert ja_number_to_words(12345) == "一万二千三百四十五"

    from tts_tpu.models.xtts.tokenizer import multilingual_cleaners

    # reference runs cutlet romaji for ja; without MeCab our pipeline
    # romanizes kana (numbers via kana readings) and common kanji via the
    # bundled lexicon (text/ja_lexicon.py); unknown kanji pass through
    out = multilingual_cleaners("私は42個", "ja")
    assert out.startswith("watashiha") and "yonjuuni" in out, out
