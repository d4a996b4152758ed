"""Gold-word oracles for the third offline rule-G2P set (da/sv/ga/mt/fa)
plus the zoo audit: every phoneme-based zoo language must resolve to a
non-grapheme offline phonemizer with espeak absent (the reference reaches
all of these only through the espeak binary,
``TTS/tts/utils/text/phonemizers/espeak_wrapper.py:47-83``)."""

import unicodedata

import pytest

from tts_tpu.text.characters import IPAPhonemes
from tts_tpu.text.latin_g2p import get_latin_g2p

# Broad transcriptions (see the engine docstring for the simplifications:
# no Danish stød, no Swedish word accents, Connacht-leaning Irish with ʲ
# slenderization, Persian short vowels from lexicon/epenthesis).

GOLD_DA = {
    "hund": "hun", "gade": "ˈɡæːðə", "mad": "mað", "dag": "dæː",
    "tak": "tɑk", "bog": "boː", "vand": "van", "mor": "moɐ",
    "rød": "ʁøð", "kage": "ˈkæːɡə", "spise": "ˈspiːsə", "år": "ɔɐ",
    "sol": "soːl", "måne": "ˈmɔːnə", "hjem": "jɛm", "hvad": "væð",
    "jeg": "jɑj", "ikke": "ˈeɡə",
}

GOLD_SV = {
    "sju": "ɧʉː", "kök": "ɕøːk", "stjärna": "ˈɧɛɳa", "katt": "kat",
    "god": "ɡuːd", "skina": "ˈɧiːna", "barn": "baɳ", "flicka": "ˈflɪka",
    "björn": "bjœɳ", "hus": "hʉːs", "vatten": "ˈvatɛn", "sol": "suːl",
    "bok": "buːk", "läsa": "ˈlɛːsa", "tala": "ˈtɑːla", "och": "ɔk",
    "jag": "jɑː",
}

GOLD_GA = {
    "maith": "mah", "bóthar": "ˈboːhaɾ", "sláinte": "ˈslaːnʲtʲə",
    "fear": "faɾ", "bean": "ban", "uisce": "ˈiʃcə", "oíche": "ˈiːçə",
    "ceol": "coːl", "teach": "tʲax", "cailín": "ˈkalʲiːnʲ",
    "madra": "ˈmadɾa", "séimh": "ʃeːvʲ", "lá": "laː", "mór": "moːɾ",
    "síol": "ʃiːl", "agus": "ˈaɡəs",
}

GOLD_MT = {
    "ħobż": "ħobs", "xemx": "ʃemʃ", "qattus": "ˈʔatːus", "ilma": "ˈilma",
    "triq": "triʔ", "għajn": "ajn", "kelb": "kelp", "dar": "dar",
    "ġbejna": "ˈdʒbejna", "ħamsa": "ˈħamsa", "missier": "ˈmisːiːr",
    "belt": "belt", "żejt": "zejt", "qamar": "ˈʔamar",
}

GOLD_FA = {
    "سلام": "sæˈlɒːm", "کتاب": "keˈtɒːb", "دوست": "duːst",
    "تهران": "teˈhɾɒːn", "بزرگ": "boˈzoɾɡ", "فارسی": "fɒːɾˈsiː",
    "شیراز": "ʃiːˈɾɒːz", "دیدن": "diːˈdæn", "گفتن": "ɡefˈtæn",
    "آمدن": "ɒːmˈdæn", "من": "mæn", "روز": "ɾuːz", "خانه": "xɒːˈne",
}

_CASES = [("da", GOLD_DA), ("sv", GOLD_SV), ("ga", GOLD_GA),
          ("mt", GOLD_MT), ("fa", GOLD_FA)]


@pytest.mark.parametrize("lang,gold", _CASES)
def test_gold_words(lang, gold):
    eng = get_latin_g2p(lang)
    nfd = lambda s: unicodedata.normalize("NFD", s)  # noqa: E731
    misses = {
        w: (eng.phonemize_word(w), ipa)
        for w, ipa in gold.items()
        if nfd(eng.phonemize_word(w)) != nfd(ipa)
    }
    assert not misses, f"{lang} G2P misses: {misses}"


@pytest.mark.parametrize("lang,gold", _CASES)
def test_output_within_ipa_charset(lang, gold):
    charset = set(IPAPhonemes().characters) | set("ˈ")
    eng = get_latin_g2p(lang)
    for word in gold:
        out = eng.phonemize_word(word)
        assert set(out) <= charset, (word, out, set(out) - charset)


def test_region_variants():
    assert get_latin_g2p("fa-IR") is get_latin_g2p("fa")
    assert get_latin_g2p("sv-SE") is get_latin_g2p("sv")


def test_persian_zwnj_compound():
    fa = get_latin_g2p("fa")
    # ZWNJ-joined compound phonemizes both members, stress on the last
    out = fa.phonemize_word("کتاب‌خانه")
    assert out.count("ˈ") <= 1
    assert "ketɒːb" in out.replace("ˈ", "")


def test_persian_sentence():
    fa = get_latin_g2p("fa")
    out = fa.phonemize("سلام دوست من")
    assert "sæ" in out and "duːst" in out and "mæn" in out
    # no raw Arabic script may survive into the phoneme stream
    assert not any("؀" <= c <= "ۿ" for c in out)


# ---------------------------------------------------------------------------
# zoo audit
# ---------------------------------------------------------------------------

# zoo languages whose REFERENCE configs are grapheme-based (no phonemizer):
# the African-language VITS set and the grapheme multilingual models
_GRAPHEME_LANGS = {"ewe", "hau", "lin", "tw_akuapem", "tw_asante", "yor", "multilingual"}
# languages served by dedicated (non-espeak) phonemizers
_DEDICATED = {"en": "en_g2p", "ja": "ja_jp_phonemizer", "zh-cn": "zh_cn_phonemizer",
              "ko": "ko_kr_phonemizer", "bn": "bn_phonemizer", "be": "bel_phonemizer"}


def test_zoo_use_phonemes_languages_have_offline_g2p():
    """Every language in ``zoo/models.json`` with a phoneme-based reference
    config must resolve to a non-grapheme offline phonemizer even with
    espeak/gruut absent (reference would silently degrade to graphemes)."""
    import json
    from pathlib import Path

    import tts_tpu
    from tts_tpu.text.phonemizers import DEF_LANG_TO_PHONEMIZER

    manifest = Path(tts_tpu.__file__).parent / "zoo" / "models.json"
    zoo = json.loads(manifest.read_text())
    missing = []
    for lang in zoo["tts_models"]:
        base = lang.lower()
        if base in _GRAPHEME_LANGS:
            continue
        if base in _DEDICATED:
            continue
        name = DEF_LANG_TO_PHONEMIZER.get(base) or DEF_LANG_TO_PHONEMIZER.get(base.split("-")[0])
        offline_ok = name in ("latin_g2p", "en_g2p") or (
            name is not None and get_latin_g2p(base) is not None
        )
        if not offline_ok:
            missing.append((lang, name))
    assert not missing, f"zoo languages without offline G2P: {missing}"
