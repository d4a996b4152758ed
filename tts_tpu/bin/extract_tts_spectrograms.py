"""Extract teacher-forced spectrograms from a trained TTS model for vocoder
fine-tuning (reference ``TTS/bin/extract_tts_spectrograms.py``)."""

from __future__ import annotations

import argparse
import os

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_path", required=True)
    parser.add_argument("--checkpoint_path", required=True)
    parser.add_argument("--output_path", required=True)
    args = parser.parse_args()

    from tts_tpu.audio.processor import AudioProcessor
    from tts_tpu.config import load_config
    from tts_tpu.data import load_tts_samples
    from tts_tpu.data.dataset import TTSDataset
    from tts_tpu.models import setup_model
    from tts_tpu.utils.io import load_checkpoint

    config = load_config(args.config_path)
    params, _, _ = load_checkpoint(args.checkpoint_path)
    if isinstance(params, dict) and set(params) <= {"model", "gen", "disc"}:
        params = params.get("model") or params.get("gen")
    model = setup_model(config)
    ap = AudioProcessor.init_from_config(config.audio, verbose=False)
    train, _ = load_tts_samples([d.to_dict() for d in config.datasets], eval_split=False)
    ds = TTSDataset(samples=train, ap=ap, tokenizer=model.tokenizer)
    ds.preprocess_samples()
    os.makedirs(args.output_path, exist_ok=True)
    metadata = []
    for batch in ds.batches(batch_size=8, shuffle=False):
        outputs = model.forward(params, {k: v for k, v in batch.items() if not isinstance(v, list)})
        mels = np.asarray(outputs["model_outputs"])
        for i, name in enumerate(batch["audio_unique_names"]):
            T = int(batch["mel_lengths"][i])
            # audio_unique_name can embed path separators (dataset#rel/path);
            # flatten so every .npy lands directly in output_path (the reference
            # writes flat files, TTS/bin/extract_tts_spectrograms.py:216-222).
            flat = name.replace("#", "_").replace(os.sep, "_").replace("/", "_")
            mel_path = os.path.join(args.output_path, flat + ".npy")
            np.save(mel_path, mels[i, :T])
            metadata.append(f"{batch['item_idxs'][i]}|{mel_path}")
    with open(os.path.join(args.output_path, "metadata.txt"), "w") as f:
        f.write("\n".join(metadata))
    print(f" > Extracted {len(metadata)} spectrograms to {args.output_path}")


if __name__ == "__main__":
    main()
