"""Offline es/it/de/fr/pt/tr/pl/cs/hu G2P fallback (``tts_tpu.text.latin_g2p``).

The reference phonemizes these languages only through the espeak binary
(``TTS/tts/utils/text/phonemizers/espeak_wrapper.py:47-83``); with espeak
absent its ``use_phonemes`` configs silently degrade to graphemes.  Here a
rule transducer must produce IPA instead.  Gold word lists are standard
phonemic dictionary transcriptions (stress marks included, no narrow
diacritics).
"""

import warnings

import pytest

from tts_tpu.text.characters import IPAPhonemes
from tts_tpu.text.latin_g2p import get_latin_g2p

GOLD_ES = {
    "hola": "ˈola",
    "gracias": "ˈɡɾaθjas",
    "mucho": "ˈmutʃo",
    "zapato": "θaˈpato",
    "guerra": "ˈɡera",
    "año": "ˈaɲo",
    "ciudad": "θjuˈdad",
    "corazón": "koɾaˈθon",
    "caballo": "kaˈbaʎo",
    "general": "xeneˈɾal",
    "querer": "keˈɾeɾ",
    "agua": "ˈaɡwa",
    "noche": "ˈnotʃe",
    "tiempo": "ˈtjempo",
    "bueno": "ˈbweno",
    "trabajo": "tɾaˈbaxo",
    "español": "espaˈɲol",
    "verdad": "beɾˈdad",
    "hacer": "aˈθeɾ",
    "gente": "ˈxente",
    "palabra": "paˈlabɾa",
    "entrar": "enˈtɾaɾ",
    "días": "ˈdias",
    "señora": "seˈɲoɾa",
}

GOLD_IT = {
    "ciao": "tʃao",
    "grazie": "ˈɡrattsje",
    "buongiorno": "bwonˈdʒorno",
    "casa": "ˈkaza",
    "scienza": "ˈʃentsa",
    "famiglia": "faˈmiʎa",
    "perché": "perˈke",
    "città": "tʃitˈta",
    "pesce": "ˈpeʃe",
    "gnocchi": "ˈɲokki",
    "amore": "aˈmore",
    "parlare": "parˈlare",
    "giorno": "ˈdʒorno",
    "chiesa": "ˈkjeza",
    "ragazzo": "raˈɡattso",
    "stagione": "staˈdʒone",
    "bagno": "ˈbaɲo",
    "problema": "proˈblema",
    "libro": "ˈlibro",
}

GOLD_DE = {
    "sprechen": "ˈʃpʁɛçən",
    "deutsch": "dɔʏtʃ",
    "schön": "ʃøːn",
    "ich": "ɪç",
    "buch": "buːx",
    "nacht": "naxt",
    "wasser": "ˈvasɐ",
    "zeitung": "ˈtsaɪtʊŋ",
    "verstehen": "fɛɐˈʃteːən",
    "mädchen": "ˈmɛːtçən",
    "freundlich": "ˈfʁɔʏntlɪç",
    "universität": "univɛʁziˈtɛːt",
    "morgen": "ˈmɔʁɡən",
    "haben": "ˈhaːbən",
    "möglich": "ˈmøːklɪç",
    "station": "ʃtaˈtsjoːn",
    "tag": "taːk",
    "hund": "hʊnt",
    "sagen": "ˈzaːɡən",
    "schule": "ˈʃuːlə",
    "jahr": "jaːʁ",
    "gut": "ɡuːt",
    "kommen": "ˈkɔmən",
    "singen": "ˈzɪŋən",
}

# French: standard phonemic dictionary transcriptions with the uniform
# final-syllable stress marked; nasal vowels use the combining tilde
GOLD_FR = {
    "bonjour": "bɔ̃ˈʒuʁ",
    "merci": "mɛʁˈsi",
    "maison": "mɛˈzɔ̃",
    "oiseau": "waˈzo",
    "français": "fʁɑ̃ˈsɛ",
    "garçon": "ɡaʁˈsɔ̃",
    "chien": "ʃjɛ̃",
    "temps": "tɑ̃",
    "vingt": "vɛ̃",
    "beaucoup": "boˈku",
    "toujours": "tuˈʒuʁ",
    "petit": "pəˈti",
    "cheval": "ʃəˈval",
    "question": "kɛsˈtjɔ̃",
    "nation": "naˈsjɔ̃",
    "heureux": "øˈʁø",
    "fleur": "flœʁ",
    "deux": "dø",
    "yeux": "jø",
    "voiture": "vwaˈtyʁ",
    "rue": "ʁy",
    "loin": "lwɛ̃",
    "monsieur": "məsjø",
    "femme": "fam",
    "ville": "vil",
    "fille": "fij",
    "soleil": "sɔˈlɛj",
    "travail": "tʁaˈvaj",
    "nuit": "nɥi",
    "bien": "bjɛ̃",
    "lundi": "lœ̃ˈdi",
    "parfum": "paʁˈfœ̃",
    "école": "eˈkɔl",
    "musique": "myˈzik",
    "baguette": "baˈɡɛt",
    "chose": "ʃoz",
    "homme": "ɔm",
    "avec": "aˈvɛk",
    "être": "ɛtʁ",
    "hôtel": "oˈtɛl",
    "garage": "ɡaˈʁaʒ",
    "croissant": "kʁwaˈsɑ̃",
    "restaurant": "ʁɛstoˈʁɑ̃",
    "trois": "tʁwa",
    "blanc": "blɑ̃",
    "grand": "ɡʁɑ̃",
    "monde": "mɔ̃d",
    "gouvernement": "ɡuvɛʁnəˈmɑ̃",
    "depuis": "dəˈpɥi",
    "cinéma": "sineˈma",
    "pourquoi": "puʁˈkwa",
    "guerre": "ɡɛʁ",
    "champagne": "ʃɑ̃ˈpaɲ",
    "parler": "paʁˈle",
    "poisson": "pwaˈsɔ̃",
    "poison": "pwaˈzɔ̃",
    "bouteille": "buˈtɛj",
    "huit": "ɥit",
    "aujourd'hui": "oʒuʁdɥi",
    "vie": "vi",
    "oui": "wi",
}


# Brazilian Portuguese (the zoo's YourTTS/CV variants are pt-br); golds are
# NFD-normalized in the test: nasal vowels are emitted as base + combining
# tilde (espeak-compatible; ɛ̃-style vowels have no precomposed form)
GOLD_PT = {
    "obrigado": "obɾiˈɡadu",
    "casa": "ˈkazɐ",
    "você": "voˈse",
    "não": "nɐ̃w",
    "coração": "koɾaˈsɐ̃w",
    "trabalho": "tɾaˈbaʎu",
    "português": "poʁtuˈɡes",
    "brasil": "bɾaˈziw",
    "cidade": "siˈdadʒi",
    "gente": "ˈʒẽtʃi",
    "tempo": "ˈtẽpu",
    "falar": "faˈlaʁ",
    "dinheiro": "dʒiˈɲejɾu",
    "amigo": "aˈmiɡu",
    "livro": "ˈlivɾu",
    "chuva": "ˈʃuvɐ",
    "queijo": "ˈkejʒu",
    "peixe": "ˈpejʃi",
    "junho": "ˈʒuɲu",
    "filho": "ˈfiʎu",
    "carro": "ˈkaʁu",
    "caro": "ˈkaɾu",
    "estação": "estaˈsɐ̃w",
    "noite": "ˈnojtʃi",
    "leite": "ˈlejtʃi",
    "homem": "ˈomẽj",
    "bem": "bẽj",
    "também": "tɐ̃ˈbẽj",
    "depois": "deˈpojs",
    "muito": "ˈmũjtu",
    "coisa": "ˈkojzɐ",
    "branco": "ˈbɾɐ̃ku",
    "longe": "ˈlõʒi",
    "ontem": "ˈõtẽj",
    "sempre": "ˈsẽpɾi",
    "grande": "ˈɡɾɐ̃dʒi",
    "verdade": "veʁˈdadʒi",
    "universidade": "univeʁsiˈdadʒi",
    "quando": "ˈkwɐ̃du",
    "mãe": "mɐ̃j",
    "feliz": "feˈlis",
    "praia": "ˈpɾajɐ",
}


# Turkish / Polish / Czech / Hungarian: regular orthographies with fixed
# stress (final / penult / initial / initial)
GOLD_TR = {
    "merhaba": "meɾhaˈba", "teşekkür": "teʃekˈkyɾ", "günaydın": "ɡynajˈdɯn",
    "evet": "eˈvet", "hayır": "haˈjɯɾ", "çok": "tʃok", "güzel": "ɡyˈzel",
    "kitap": "kiˈtap", "türkçe": "tyɾkˈtʃe", "bir": "biɾ", "ekmek": "ekˈmek",
    "şehir": "ʃeˈhiɾ", "dağ": "daː", "yağmur": "jaːˈmuɾ",
    "öğretmen": "øːɾetˈmen", "araba": "aɾaˈba", "deniz": "deˈniz",
    "kedi": "keˈdi", "köpek": "køˈpek", "elma": "elˈma", "balık": "baˈlɯk",
    "beyaz": "beˈjaz", "su": "su", "iyi": "iˈji",
}

GOLD_PL = {
    "dziękuję": "dʑɛ̃ˈkujɛ", "proszę": "ˈprɔʂɛ", "tak": "tak", "nie": "ɲɛ",
    "kot": "kɔt", "pies": "pjɛs", "miasto": "ˈmjastɔ", "szkoła": "ˈʂkɔwa",
    "czas": "tʂas", "być": "bɨtɕ", "człowiek": "ˈtʂwɔvjɛk",
    "dobrze": "ˈdɔbʐɛ", "przepraszam": "pʂɛˈpraʂam", "trzy": "tʂɨ",
    "warszawa": "varˈʂava", "język": "ˈjɛ̃zɨk", "ziemia": "ˈʑɛmja",
    "łódź": "wutɕ", "chleb": "xlɛp", "miód": "mjut", "śnieg": "ɕɲɛk",
    "mąka": "ˈmɔ̃ka", "serce": "ˈsɛrtsɛ", "wszystko": "ˈfʂɨstkɔ",
    "kocham": "ˈkɔxam", "jestem": "ˈjɛstɛm", "właśnie": "ˈvwaɕɲɛ",
    "dzień": "dʑɛɲ", "dobry": "ˈdɔbrɨ",
}

GOLD_CS = {
    "děkuji": "ˈɟɛkujɪ", "dobrý": "ˈdobriː", "ahoj": "ˈaɦoj",
    "žena": "ˈʒɛna", "muž": "muʃ", "hrad": "ɦrat", "město": "ˈmɲɛsto",
    "voda": "ˈvoda", "kniha": "ˈkɲɪɦa", "pivo": "ˈpɪvo",
    "česky": "ˈtʃɛskɪ", "dnes": "dnɛs", "noc": "nots", "svět": "svjɛt",
    "led": "lɛt", "sníh": "sɲiːx", "ryba": "ˈrɪba", "chléb": "xlɛːp",
    # ř ≈ /rʒ/ (devoiced /rʃ/ after voiceless obstruents): the raised
    # alveolar trill r̝ has no symbol inside the IPAPhonemes charset
    "přítel": "ˈprʃiːtɛl", "škola": "ˈʃkola",
}

GOLD_HU = {
    "köszönöm": "ˈkøsønøm", "magyar": "ˈmɒɟɒr", "szia": "ˈsiɒ",
    "család": "ˈtʃɒlaːd", "ember": "ˈɛmbɛr", "szép": "seːp",
    "könyv": "køɲv", "gyerek": "ˈɟɛrɛk", "iskola": "ˈiʃkolɒ",
    "asztal": "ˈɒstɒl", "nyelv": "ɲɛlv", "olyan": "ˈojɒn", "ház": "haːz",
    "víz": "viːz", "kutya": "ˈkucɒ", "macska": "ˈmɒtʃkɒ",
    "kenyér": "ˈkɛɲeːr", "tanár": "ˈtɒnaːr", "hideg": "ˈhidɛɡ",
    "meleg": "ˈmɛlɛɡ", "fiú": "ˈfiuː",
}


GOLD_FI = {
    "kiitos": "ˈkiːtos", "hyvää": "ˈhyʋæː", "suomi": "ˈsuomi",
    "kissa": "ˈkisːɑ", "talo": "ˈtɑlo", "järvi": "ˈjærʋi",
    "kaunis": "ˈkɑunis", "minä": "ˈminæ", "sauna": "ˈsɑunɑ",
    "helsinki": "ˈhelsiŋki", "rakkaus": "ˈrɑkːɑus", "ystävä": "ˈystæʋæ",
    "päivää": "ˈpæiʋæː", "koulu": "ˈkoulu", "mustikka": "ˈmustikːɑ",
    "tyttö": "ˈtytːø", "sininen": "ˈsininen", "kahvi": "ˈkɑhʋi",
}

GOLD_NL = {
    "huis": "hœys", "maan": "maːn", "boek": "buk", "ijs": "ɛis",
    "nacht": "nɑxt", "school": "sxoːl", "vrouw": "vrɑu",
    "water": "ˈʋaːtər", "spreken": "ˈspreːkən", "fiets": "fits",
    "tijd": "tɛit", "zeven": "ˈzeːvən", "dank": "dɑŋk",
    "mooi": "moːj", "klein": "klɛin", "drinken": "ˈdrɪŋkən",
    "appel": "ˈɑpəl", "lekker": "ˈlɛkər", "goed": "ɣut",
    "nieuw": "niu", "vriend": "vrint", "straat": "straːt",
}

GOLD_RO = {
    "bună": "ˈbunə", "mulțumesc": "multsuˈmesk", "română": "roˈmɨnə",
    "școală": "ˈʃkoalə", "frate": "ˈfrate", "noapte": "ˈnoapte",
    "limba": "ˈlimba", "seară": "ˈsearə", "copil": "koˈpil",
    "bine": "ˈbine", "ghid": "ɡid", "oraș": "oˈraʃ",
    "țară": "ˈtsarə", "apă": "ˈapə", "pâine": "ˈpɨjne",
    "mâncare": "mɨnˈkare", "carte": "ˈkarte",
}

GOLD_CA = {
    "gràcies": "ˈɡɾasiəs", "català": "kətəˈla", "dia": "ˈdiə",
    "taula": "ˈtawlə", "carrer": "kəˈre", "menjar": "mənˈʒa",
    "casa": "ˈkazə", "això": "əˈʃɔ", "barcelona": "bəɾsəˈlonə",
    "feliç": "fəˈlis", "nit": "nit", "platja": "ˈpladʒə",
    "vell": "beʎ", "família": "fəˈmiliə", "petit": "pəˈtit",
}


@pytest.mark.parametrize(
    "lang,gold",
    [("es", GOLD_ES), ("it", GOLD_IT), ("de", GOLD_DE), ("fr", GOLD_FR),
     ("pt", GOLD_PT), ("tr", GOLD_TR), ("pl", GOLD_PL), ("cs", GOLD_CS),
     ("hu", GOLD_HU), ("fi", GOLD_FI), ("nl", GOLD_NL), ("ro", GOLD_RO),
     ("ca", GOLD_CA)],
)
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


def test_region_variants_and_unknown():
    assert get_latin_g2p("es-ES") is get_latin_g2p("es")
    assert get_latin_g2p("de-DE") is get_latin_g2p("de")
    assert get_latin_g2p("fr-FR") is get_latin_g2p("fr")
    assert get_latin_g2p("pt-br") is get_latin_g2p("pt")
    assert get_latin_g2p("ru") is None


@pytest.mark.parametrize(
    "lang,gold",
    [("es", GOLD_ES), ("it", GOLD_IT), ("de", GOLD_DE), ("fr", GOLD_FR),
     ("pt", GOLD_PT), ("tr", GOLD_TR), ("pl", GOLD_PL), ("cs", GOLD_CS),
     ("hu", GOLD_HU), ("fi", GOLD_FI), ("nl", GOLD_NL), ("ro", GOLD_RO),
     ("ca", GOLD_CA)],
)
def test_output_within_ipa_charset(lang, gold):
    """Every emitted symbol must be encodable by IPAPhonemes (otherwise the
    tokenizer drops it and the model never sees the phoneme)."""
    # the combining tilde (French nasal vowels) is standard espeak IPA; a
    # default-charset config drops it (denasalizes) rather than failing
    charset = set(IPAPhonemes().characters) | set("ˈ \u0303")
    eng = get_latin_g2p(lang)
    for word in gold:
        out = eng.phonemize_word(word)
        assert set(out) <= charset, (word, out, set(out) - charset)


def test_sentence_keeps_punctuation():
    es = get_latin_g2p("es")
    out = es.phonemize("¿Dónde está la biblioteca?")
    assert out.startswith("¿") and out.endswith("?")
    assert "ˈdonde" in out and "esˈta" in out


def test_espeak_request_falls_back_when_absent():
    """``get_phonemizer_by_name('espeak', language='de')`` on a machine
    without the binary must return the rule G2P (with a warning), not fail
    or degrade to graphemes."""
    from tts_tpu.text.phonemizers import ESpeak, get_phonemizer_by_name

    if ESpeak.is_available():
        pytest.skip("espeak installed; fallback path not reachable")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        p = get_phonemizer_by_name("espeak", language="de")
    assert p.name() == "latin_g2p"
    out = p.phonemize("Guten Morgen")
    assert "ˈmɔʁɡən" in out


@pytest.mark.parametrize("lang,text,expect", [
    ("es", "Buenos días, señora.", "ˈdias"),
    ("it", "La vita è bella!", "ˈvita"),
    ("de", "Das Wetter ist schön.", "ʃøːn"),
    ("fr", "Bonjour tout le monde.", "ʒuʁ"),
    ("pt-br", "Muito obrigado, até amanhã!", "ɡadu"),
    ("tr", "Çok teşekkür ederim.", "teʃekˈkyɾ"),
    ("pl", "Dzień dobry wszystkim!", "ˈdɔbrɨ"),
    ("cs", "Dobrý den, jak se máte?", "ˈdobriː"),
    ("hu", "Jó napot kívánok!", "ˈnɒpot"),
])
def test_tokenizer_resolves_ipa_not_graphemes(lang, text, expect):
    """A ``use_phonemes: true`` config for es/it/de produces IPA ids (the
    round-3 gap: these silently degraded to graphemes without espeak)."""
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
