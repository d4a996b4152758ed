# -*- coding: utf-8 -*-
"""Offline G2P fallback, extension set: sk/hr/sl/lt/lv/et/bg/uk/el
(``tts_tpu.text.rule_g2p_ext``).

Same contract as ``tests/test_latin_g2p.py``: the reference reaches these
languages only through the espeak binary
(``TTS/tts/utils/text/phonemizers/espeak_wrapper.py:47-83``); with espeak
absent its ``use_phonemes`` zoo configs degrade to graphemes.  Gold lists
are standard phonemic dictionary transcriptions (broad — no narrow
diacritics; approximations called out per engine docstring).
"""

import warnings

import pytest

from tts_tpu.text.characters import IPAPhonemes
from tts_tpu.text.latin_g2p import get_latin_g2p

GOLD_SK = {
    "dobrý": "ˈdobriː",
    "ďakujem": "ˈɟakujem",
    "škola": "ˈʃkola",
    "dieťa": "ˈɟjeca",
    "chlieb": "xʎjep",
    "mesto": "ˈmesto",
    "žena": "ˈʒena",
    "ulica": "ˈuʎitsa",
    "hodina": "ˈɦoɟina",
    "ľudia": "ˈʎuɟja",
    "piatok": "ˈpjatok",
    "koniec": "ˈkoɲjets",
    "ráno": "ˈraːno",
    "hrad": "ɦrat",
    "kôň": "kuoɲ",
    "slovensko": "ˈslovensko",
}

GOLD_HR = {
    "hvala": "ˈxvala",
    "dobro": "ˈdobro",
    "čovjek": "ˈtʃovjek",
    "noć": "notɕ",
    "đak": "dʑak",
    "škola": "ˈʃkola",
    "ljubav": "ˈʎubav",
    "knjiga": "ˈkɲiɡa",
    "žena": "ˈʒena",
    "grad": "ɡrad",  # no final devoicing in Croatian
    "jutro": "ˈjutro",
    "more": "ˈmore",
    "ruka": "ˈruka",
}

GOLD_SL = {
    "hvala": "ˈxʋala",
    "dobro": "ˈdɔbrɔ",
    "čas": "tʃas",
    "šola": "ˈʃɔla",
    "žena": "ˈʒɛna",
    "mesto": "ˈmɛstɔ",
    "otrok": "ˈɔtrɔk",
    "voda": "ˈʋɔda",
}

GOLD_LT = {
    "labas": "ˈlabas",
    "ačiū": "ˈatʃuː",
    "namas": "ˈnamas",
    "saulė": "ˈsaʊleː",
    "duona": "ˈduona",
    "vanduo": "ˈvanduo",
    "miestas": "ˈmiɛstas",
    "vaikas": "ˈvaɪkas",
    "šuo": "ʃuo",
    "žodis": "ˈʒoːdɪs",
}

GOLD_LV = {
    "paldies": "ˈpaldiɛs",
    "labdien": "ˈlabdiɛn",
    "roka": "ˈruoka",
    "māja": "ˈmaːja",
    "zeme": "ˈzɛmɛ",
    "ģimene": "ˈɟimɛnɛ",
    "ļoti": "ˈʎuoti",
    "diena": "ˈdiɛna",
    "skola": "ˈskuola",
    "upe": "ˈupɛ",
    "ķēniņš": "ˈcɛːniɲʃ",
}

GOLD_ET = {
    "tere": "ˈtere",
    "maja": "ˈmaja",
    "kool": "koːl",
    "õnn": "ɤnː",
    "ülikool": "ˈylikoːl",
    "sõber": "ˈsɤber",
    "öö": "øː",
    "raamat": "ˈraːmat",
    "keel": "keːl",
    "linn": "linː",
    "päike": "ˈpæike",
    "aitäh": "ˈaitæh",
}

GOLD_BG = {
    "майка": "ˈmajka",
    "книга": "ˈkniɡa",
    "маса": "ˈmasa",
    "куче": "ˈkutʃɛ",
    "риба": "ˈriba",
    "хляб": "xljap",  # final devoicing
    "град": "ɡrat",
    "нощ": "noʃt",
    "цвете": "ˈtsvɛtɛ",
    "шапка": "ˈʃapka",
    "ключ": "kljutʃ",
    "център": "ˈtsɛntɤr",
    "утро": "ˈutro",
    "вода": "voˈda",  # exceptions lexicon (final stress)
    "жена": "ʒɛˈna",
    "благодаря": "blaɡodaˈrja",
}

GOLD_UK = {
    "мова": "ˈmɔʋa",
    "книга": "ˈknɪɦa",
    "хліб": "xlib",  # NO final devoicing in Ukrainian
    "день": "dɛnʲ",
    "ніч": "nitʃ",
    "щастя": "ˈʃtʃastʲa",
    "сонце": "ˈsɔntsɛ",
    "ранок": "ˈranɔk",
    "море": "ˈmɔrɛ",
    "мрія": "ˈmrija",
    "дякую": "ˈdʲakuju",  # exceptions lexicon (initial stress)
    "вода": "ʋɔˈda",
}

GOLD_EL = {
    "καλημέρα": "kaliˈmɛra",
    "ευχαριστώ": "ɛfxariˈstɔ",
    "νερό": "nɛˈrɔ",
    "θάλασσα": "ˈθalasa",
    "άνθρωπος": "ˈanθrɔpɔs",
    "παιδί": "pɛˈði",
    "ψωμί": "psɔˈmi",
    "αγάπη": "aˈɣapi",
    "όχι": "ˈɔçi",
    "ημέρα": "iˈmɛra",
    "μπλε": "blɛ",
    "ντομάτα": "dɔˈmata",
    "ελλάδα": "ɛˈlaða",
    "ουρανός": "uraˈnɔs",
    "γεια": "ʝa",
    "και": "kɛ",
}

ALL = [
    ("sk", GOLD_SK), ("hr", GOLD_HR), ("sl", GOLD_SL), ("lt", GOLD_LT),
    ("lv", GOLD_LV), ("et", GOLD_ET), ("bg", GOLD_BG), ("uk", GOLD_UK),
    ("el", GOLD_EL),
]


@pytest.mark.parametrize("lang,gold", ALL)
def test_gold_words(lang, gold):
    eng = get_latin_g2p(lang)
    import unicodedata

    nfd = lambda s: unicodedata.normalize("NFD", s)  # noqa: E731
    misses = {
        w: (eng.phonemize_word(w), ipa)
        for w, ipa in gold.items()
        if nfd(eng.phonemize_word(w)) != nfd(ipa)
    }
    assert not misses, f"{lang} G2P misses: {misses}"


@pytest.mark.parametrize("lang,gold", ALL)
def test_output_within_ipa_charset(lang, gold):
    """Every emitted symbol must be encodable by IPAPhonemes — and in
    particular no source-script letter may leak through (the whole point
    over graphemes for the Cyrillic/Greek engines)."""
    charset = set(IPAPhonemes().characters) | set("ˈ")
    eng = get_latin_g2p(lang)
    for word in gold:
        out = eng.phonemize_word(word)
        assert set(out) <= charset, (word, out, set(out) - charset)


def test_region_variants():
    assert get_latin_g2p("sk-SK") is get_latin_g2p("sk")
    assert get_latin_g2p("uk-UA") is get_latin_g2p("uk")
    assert get_latin_g2p("ru") is None  # still unsupported


@pytest.mark.parametrize("lang,text,expect", [
    ("sk", "Dobrý deň, ako sa máte?", "ˈdobriː"),
    ("hr", "Dobar dan svima!", "ˈdobar"),
    ("bg", "Добро утро, приятели.", "ˈutro"),
    ("uk", "Доброго ранку, друзі!", "ˈranku"),
    ("el", "Καλημέρα σε όλους.", "kaliˈmɛra"),
])
def test_tokenizer_resolves_ipa_not_graphemes(lang, text, expect):
    """A ``use_phonemes: true`` config for these zoo languages produces IPA
    ids with espeak absent (previously degraded to graphemes)."""
    from tts_tpu.models.vits.config import VitsConfig
    from tts_tpu.text.tokenizer import TTSTokenizer

    cfg = VitsConfig()
    cfg.use_phonemes = True
    cfg.phoneme_language = lang
    cfg.phonemizer = None
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        tok, _ = TTSTokenizer.init_from_config(cfg)
        decoded = tok.ids_to_text(tok.text_to_ids(text))
    assert expect in decoded.replace("<BLNK>", "")
