"""Dataset downloader table + archive extraction (reference
``TTS/utils/downloaders.py``; fetch itself is egress-gated here)."""

import os
import tarfile
import zipfile

import pytest


def test_dataset_url_table_covers_reference_corpora():
    from tts_tpu.utils.downloaders import DATASET_URLS

    for key in (
        "ljspeech", "vctk", "thorsten-de",
        "libri-tts-train-clean-100", "libri-tts-dev-clean",
        "mailabs-english", "mailabs-german", "mailabs-french",
        "mailabs-italian", "mailabs-spanish",
    ):
        assert key in DATASET_URLS, key
        assert DATASET_URLS[key].startswith("http")


def test_extract_archive_tar_and_zip(tmp_path):
    from tts_tpu.utils.downloaders import extract_archive

    src = tmp_path / "payload.txt"
    src.write_text("hello corpus")

    tar_path = tmp_path / "a.tar.gz"
    with tarfile.open(tar_path, "w:gz") as t:
        t.add(src, arcname="inner/payload.txt")
    extract_archive(str(tar_path))
    assert (tmp_path / "inner" / "payload.txt").read_text() == "hello corpus"

    zip_path = tmp_path / "b.zip"
    with zipfile.ZipFile(zip_path, "w") as z:
        z.write(src, arcname="zinner/payload.txt")
    out = tmp_path / "zout"
    extract_archive(str(zip_path), str(out))
    assert (out / "zinner" / "payload.txt").read_text() == "hello corpus"

    bad = tmp_path / "c.bin"
    bad.write_bytes(b"\x00\x01")
    with pytest.raises(ValueError, match="Unknown archive"):
        extract_archive(str(bad))


def test_download_dataset_unknown_name(tmp_path):
    from tts_tpu.utils.downloaders import download_dataset

    with pytest.raises(KeyError, match="Unknown dataset"):
        download_dataset("not-a-corpus", str(tmp_path))


def test_download_entry_points_resolve_urls(tmp_path, monkeypatch):
    """Each reference-named helper resolves to the right URL (network stubbed)."""
    import tts_tpu.utils.downloaders as dl

    fetched = []
    monkeypatch.setattr(
        "urllib.request.urlretrieve", lambda url, fn: fetched.append(url) or (fn, None)
    )
    monkeypatch.setattr(dl, "extract_archive", lambda *a, **k: None)

    dl.download_ljspeech(str(tmp_path))
    dl.download_libri_tts(str(tmp_path), subset="libri-tts-clean-100")
    dl.download_mailabs(str(tmp_path), language="german")
    dl.download_thorsten_de(str(tmp_path))
    assert fetched[0].endswith("LJSpeech-1.1.tar.bz2")
    assert fetched[1].endswith("train-clean-100.tar.gz")
    assert fetched[2].endswith("de_DE.tgz")
    assert fetched[3].endswith("thorsten-de_v02.tgz")


def test_api_emotion_speed_signature_parity():
    """reference api.py:234 — emotion+speed together raise (Studio gone)."""
    from tts_tpu.api import TTS

    t = TTS()
    with pytest.raises(ValueError, match="Coqui Studio"):
        t.tts("hi", emotion="sad", speed=1.2)
    # only one of the two set → falls through to the no-model error
    with pytest.raises(RuntimeError, match="No model loaded"):
        t.tts("hi", speed=1.2)
