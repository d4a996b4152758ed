"""List unique phonemes in a dataset after phonemization
(reference ``TTS/bin/find_unique_phonemes.py``)."""

from __future__ import annotations

import argparse


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_path", required=True)
    args = parser.parse_args()

    from tts_tpu.config import load_config
    from tts_tpu.data import load_tts_samples
    from tts_tpu.text.phonemizers import get_phonemizer_by_name

    config = load_config(args.config_path)
    # no split: the tool scans every transcript, and a 1% eval split
    # asserts on datasets under 100 clips
    items, _ = load_tts_samples([d.to_dict() for d in config.datasets], eval_split=False)
    phonemizer = get_phonemizer_by_name(
        config.phonemizer or "espeak", language=config.phoneme_language or "en-us"
    )
    phones = set()
    for item in items:
        ph = phonemizer.phonemize(item["text"], separator="")
        phones.update(set(ph))
    print(f" > Number of unique phonemes: {len(phones)}")
    print(f" > Unique phonemes: {''.join(sorted(phones))}")


if __name__ == "__main__":
    main()
