"""Extract attention masks (alignments) from a trained Tacotron/Tacotron2
model (reference ``TTS/bin/compute_attention_masks.py``).

Teacher-forced forward over the dataset; each alignment matrix is written
next to its wav file with an ``.npy`` extension (``path/x.wav`` →
``path/x.npy``) unless ``--output_path`` is given.  The masks can train a
duration predictor (ForwardTTS ``use_aligner=False`` path).
"""

from __future__ import annotations

import argparse
import os
from argparse import RawTextHelpFormatter

import numpy as np


def main():
    parser = argparse.ArgumentParser(
        description="Extract attention masks from a trained Tacotron/Tacotron2 model.\n"
        "Example:\n"
        "  python -m tts_tpu.bin.compute_attention_masks --model_path ckpt.msgpack "
        "--config_path config.json --data_path /data/LJSpeech-1.1 "
        "--dataset ljspeech --dataset_metafile metadata.csv --batch_size 16",
        formatter_class=RawTextHelpFormatter,
    )
    parser.add_argument("--model_path", type=str, required=True)
    parser.add_argument("--config_path", type=str, required=True)
    parser.add_argument("--dataset", type=str, required=True, help="Formatter name (e.g. ljspeech).")
    parser.add_argument("--dataset_metafile", type=str, required=True)
    parser.add_argument("--data_path", type=str, required=True)
    parser.add_argument("--output_path", type=str, default=None,
                        help="Optional dir for the .npy masks (default: beside each wav).")
    parser.add_argument("--batch_size", type=int, default=16)
    args = parser.parse_args()

    from tts_tpu.audio.processor import AudioProcessor
    from tts_tpu.config import load_config
    from tts_tpu.data import load_tts_samples
    from tts_tpu.data.dataset import TTSDataset
    from tts_tpu.models import setup_model
    from tts_tpu.utils.io import load_checkpoint

    config = load_config(args.config_path)
    params, _, _ = load_checkpoint(args.model_path)
    if isinstance(params, dict) and set(params) <= {"model", "gen", "disc"}:
        params = params.get("model") or params.get("gen")
    model = setup_model(config)
    ap = AudioProcessor.init_from_config(config.audio, verbose=False)

    dataset_cfg = {
        "formatter": args.dataset,
        "dataset_name": args.dataset,
        "path": args.data_path,
        "meta_file_train": args.dataset_metafile,
        "meta_file_val": "",
        "language": getattr(config, "language", "en"),
    }
    samples, _ = load_tts_samples([dataset_cfg], eval_split=False)
    ds = TTSDataset(
        samples=samples, ap=ap, tokenizer=model.tokenizer,
        outputs_per_step=int(getattr(config, "r", 1) or 1),
    )
    ds.preprocess_samples()
    if args.output_path:
        os.makedirs(args.output_path, exist_ok=True)

    n = 0
    r = int(getattr(config, "r", 1) or 1)
    for batch in ds.batches(batch_size=args.batch_size, shuffle=False):
        outputs = model.forward(
            params, {k: v for k, v in batch.items() if not isinstance(v, list)}
        )
        aligns = np.asarray(outputs["alignments"])  # [B, T_de/r, T_en]
        # batch["item_idxs"] carries the audio file path per item (dataset.py:372
        # collates "item_idx", which is the wav path), not a dataset row index.
        for i, wav_path in enumerate(batch["item_idxs"]):
            T_de = int(batch["mel_lengths"][i]) // r
            T_en = int(batch["text_lengths"][i])
            align = aligns[i, :T_de, :T_en]
            if args.output_path:
                out_file = os.path.join(
                    args.output_path,
                    os.path.splitext(os.path.basename(wav_path))[0] + ".npy",
                )
            else:
                out_file = os.path.splitext(wav_path)[0] + ".npy"
            np.save(out_file, align)
            n += 1
    print(f" > Wrote {n} attention masks.")


if __name__ == "__main__":
    main()
