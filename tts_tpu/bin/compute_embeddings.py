"""Precompute speaker d-vectors for a dataset → ``speakers.json``/``.npz``
(reference ``TTS/bin/compute_embeddings.py``)."""

from __future__ import annotations

import argparse
import os


def compute_embeddings(
    model_path: str,
    config_path: str,
    output_path: str,
    formatter_name: str,
    dataset_name: str,
    dataset_path: str,
    meta_file_train: str = "",
    meta_file_val: str = "",
    disable_cuda: bool = True,
):
    from tts_tpu.data import load_tts_samples
    from tts_tpu.utils.managers import EmbeddingManager, save_file

    samples, eval_samples = load_tts_samples(
        {
            "formatter": formatter_name,
            "dataset_name": dataset_name,
            "path": dataset_path,
            "meta_file_train": meta_file_train,
            "meta_file_val": meta_file_val,
            "ignored_speakers": None,
            "language": "",
        },
        eval_split=bool(meta_file_val),
    )
    if eval_samples:
        samples = samples + eval_samples

    manager = EmbeddingManager(
        encoder_model_path=model_path, encoder_config_path=config_path
    )
    embeddings = {}
    for idx, sample in enumerate(samples):
        emb = manager.compute_embedding_from_clip(sample["audio_file"])
        embeddings[sample["audio_unique_name"]] = {
            "name": sample["speaker_name"],
            "embedding": emb,
        }
        if idx % 10 == 0:
            print(f" > {idx}/{len(samples)}", flush=True)
    save_file(embeddings, output_path)
    print(f" > Saved {len(embeddings)} embeddings to {output_path}")


def main():
    parser = argparse.ArgumentParser(description="Compute speaker embeddings for a dataset")
    parser.add_argument("--model_path", required=True)
    parser.add_argument("--config_path", required=True)
    parser.add_argument("--output_path", default="speakers.json")
    parser.add_argument("--formatter_name", required=True)
    parser.add_argument("--dataset_name", default="")
    parser.add_argument("--dataset_path", required=True)
    parser.add_argument("--meta_file_train", default="")
    parser.add_argument("--meta_file_val", default="")
    args = parser.parse_args()
    compute_embeddings(
        args.model_path, args.config_path, args.output_path, args.formatter_name,
        args.dataset_name, args.dataset_path, args.meta_file_train, args.meta_file_val,
    )


if __name__ == "__main__":
    main()
