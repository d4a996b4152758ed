"""Public-corpus download helpers (reference ``TTS/utils/downloaders.py``).

One table of dataset → archive URL(s); one fetch-and-extract worker. The
recipes call these to materialize their training corpora. In an
egress-blocked environment the fetch raises ``URLError`` — the extraction
half is still usable on a manually supplied archive via
``extract_archive``.
"""

from __future__ import annotations

import os
import tarfile
import zipfile
from typing import Optional

_LIBRI_SUBSETS = (
    "train-clean-100", "train-clean-360", "train-other-500",
    "dev-clean", "dev-other", "test-clean", "test-other",
)

DATASET_URLS = {
    "ljspeech": "https://data.keithito.com/data/speech/LJSpeech-1.1.tar.bz2",
    "vctk": "https://datashare.ed.ac.uk/bitstream/handle/10283/3443/VCTK-Corpus-0.92.zip",
    "thorsten-de": "https://www.openslr.org/resources/95/thorsten-de_v02.tgz",
    **{f"libri-tts-{s}": f"http://www.openslr.org/resources/60/{s}.tar.gz" for s in _LIBRI_SUBSETS},
    **{
        f"mailabs-{lang}": f"https://data.solak.de/data/Training/stt_tts/{code}.tgz"
        for lang, code in [
            ("english", "en_US"), ("german", "de_DE"), ("french", "fr_FR"),
            ("italian", "it_IT"), ("spanish", "es_ES"),
        ]
    },
}


def extract_archive(archive_path: str, to_path: Optional[str] = None) -> None:
    """Unpack a .zip / .tar[.gz|.bz2] archive next to itself (or ``to_path``)."""
    out = to_path or os.path.dirname(archive_path)
    if zipfile.is_zipfile(archive_path):
        with zipfile.ZipFile(archive_path) as z:
            z.extractall(out)
    elif tarfile.is_tarfile(archive_path):
        with tarfile.open(archive_path) as t:
            try:
                t.extractall(out, filter="data")  # refuse path-escape members
            except TypeError:  # Python < 3.11.4: no filter kwarg
                t.extractall(out)
    else:
        raise ValueError(f"Unknown archive format: {archive_path}")


def download_dataset(name: str, path: str) -> None:
    """Fetch + extract one named corpus from :data:`DATASET_URLS` into ``path``."""
    import urllib.request

    if name not in DATASET_URLS:
        raise KeyError(f"Unknown dataset {name!r}; known: {sorted(DATASET_URLS)}")
    url = DATASET_URLS[name]
    os.makedirs(path, exist_ok=True)
    archive = os.path.join(path, os.path.basename(url))
    print(f" > Downloading {name} from {url} ...", flush=True)
    urllib.request.urlretrieve(url, archive)
    print(" > Extracting archive file...", flush=True)
    extract_archive(archive)


# -- reference-named entry points --------------------------------------------

def download_ljspeech(path: str) -> None:
    download_dataset("ljspeech", path)


def download_vctk(path: str, use_kaggle: Optional[bool] = False) -> None:
    if use_kaggle:
        raise NotImplementedError(
            "Kaggle mirror needs the kaggle package + API key; use the "
            "datashare.ed.ac.uk default (use_kaggle=False)."
        )
    download_dataset("vctk", path)


def download_thorsten_de(path: str) -> None:
    download_dataset("thorsten-de", path)


def download_libri_tts(path: str, subset: Optional[str] = "all") -> None:
    """``subset`` is a reference-style key like ``libri-tts-clean-100`` or
    ``all`` (every LibriTTS split, ~600 hours)."""
    alias = {
        f"libri-tts-clean-{n}": f"libri-tts-train-clean-{n}" for n in (100, 360)
    }
    alias["libri-tts-other-500"] = "libri-tts-train-other-500"
    if subset == "all":
        for s in _LIBRI_SUBSETS:
            download_dataset(f"libri-tts-{s}", path)
        print(" > All subsets downloaded")
    else:
        download_dataset(alias.get(subset, subset), path)


def download_mailabs(path: str, language: str = "english") -> None:
    download_dataset(f"mailabs-{language}", path)
