"""List the unique characters in a dataset's transcripts
(reference ``TTS/bin/find_unique_chars.py``)."""

from __future__ import annotations

import argparse


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_path", required=True)
    args = parser.parse_args()

    from tts_tpu.config import load_config
    from tts_tpu.data import load_tts_samples

    config = load_config(args.config_path)
    # no split: the tool scans every transcript, and a 1% eval split
    # asserts on datasets under 100 clips
    items, _ = load_tts_samples([d.to_dict() for d in config.datasets], eval_split=False)
    texts = "".join(item["text"] for item in items)
    chars = set(texts)
    lower_chars = {c for c in chars if c.islower()}
    chars_force_lower = {c.lower() for c in chars}
    print(f" > Number of unique characters: {len(chars)}")
    print(f" > Unique characters: {''.join(sorted(chars))}")
    print(f" > Unique lower characters: {''.join(sorted(lower_chars))}")
    print(f" > Unique all forced to lower characters: {''.join(sorted(chars_force_lower))}")


if __name__ == "__main__":
    main()
