"""Evaluate a speaker/emotion encoder on a dataset
(reference ``TTS/bin/eval_encoder.py``).

Computes an embedding per utterance and reports per-class and total
accuracy.  Without a trained softmax head, prediction = nearest class
centroid by cosine similarity over the evaluated set (two passes), which
matches the reference's intent (encoder separability) without requiring
the optional criterion checkpoint.
"""

import argparse
from argparse import RawTextHelpFormatter

import numpy as np

from tts_tpu.config import load_config
from tts_tpu.data import load_tts_samples
from tts_tpu.utils.managers import SpeakerManager


def compute_encoder_accuracy(dataset_items, encoder_manager, class_name_key: str = "speaker_name"):
    names, embeds = [], []
    for item in dataset_items:
        emb = encoder_manager.compute_embedding_from_clip(item["audio_file"])
        names.append(item.get(class_name_key))
        embeds.append(np.asarray(emb, np.float32))
    embeds = np.stack(embeds)
    embeds = embeds / np.maximum(np.linalg.norm(embeds, axis=-1, keepdims=True), 1e-8)

    classes = sorted({n for n in names if n is not None})
    centroids = np.stack([embeds[[i for i, n in enumerate(names) if n == c]].mean(0) for c in classes])
    centroids = centroids / np.maximum(np.linalg.norm(centroids, axis=-1, keepdims=True), 1e-8)

    sims = embeds @ centroids.T  # [N, C]
    pred = [classes[i] for i in sims.argmax(-1)]

    class_acc_dict = {}
    for name, p in zip(names, pred):
        if name is None:
            continue
        class_acc_dict.setdefault(name, []).append(int(name == p))

    acc_avg = 0.0
    for key, values in class_acc_dict.items():
        acc = sum(values) / len(values)
        print(f" > {key} class accuracy: {acc:.3f}")
        acc_avg += acc
    if class_acc_dict:
        acc_avg /= len(class_acc_dict)
    print(f" > Average class accuracy: {acc_avg:.3f}")
    return acc_avg


def main():
    parser = argparse.ArgumentParser(
        description="Compute encoder accuracy on a dataset.\n"
        "Example:\n"
        "  python -m tts_tpu.bin.eval_encoder --model_path enc.msgpack "
        "--config_path enc_config.json --config_dataset_path data_config.json",
        formatter_class=RawTextHelpFormatter,
    )
    parser.add_argument("--model_path", type=str, required=True, help="Encoder checkpoint path.")
    parser.add_argument("--config_path", type=str, required=True, help="Encoder config path.")
    parser.add_argument(
        "--config_dataset_path", type=str, required=True,
        help="Training config with the dataset definition to evaluate on.",
    )
    parser.add_argument(
        "--eval", action=argparse.BooleanOptionalAction, default=True,
        help="Include the eval split (--no-eval to exclude).",
    )
    args = parser.parse_args()

    c_dataset = load_config(args.config_dataset_path)
    meta_train, meta_eval = load_tts_samples(c_dataset.datasets, eval_split=args.eval)
    # eval_split=False returns meta_eval=None (reference TTS/bin/eval_encoder.py:85-88
    # concatenates both splits only when the eval split exists).
    items = meta_train + (meta_eval or [])

    manager = SpeakerManager(encoder_model_path=args.model_path, encoder_config_path=args.config_path)
    compute_encoder_accuracy(items, manager)


if __name__ == "__main__":
    main()
