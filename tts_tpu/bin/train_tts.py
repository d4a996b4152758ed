"""Train a TTS model from a config file
(reference ``TTS/bin/train_tts.py``).

    python -m tts_tpu.bin.train_tts --config_path config.json
    python -m tts_tpu.bin.train_tts --config_path config.json --coqpit.batch_size 8
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_path", type=str, required=True)
    parser.add_argument("--continue_path", type=str, default="")
    parser.add_argument("--restore_path", type=str, default="")
    parser.add_argument("--output_path", type=str, default=None)
    args, rest = parser.parse_known_args(argv)

    from tts_tpu.config import load_config
    from tts_tpu.data import load_tts_samples
    from tts_tpu.models import setup_model
    from tts_tpu.trainer.trainer import Trainer, TrainerArgs

    config = load_config(args.config_path)
    rest = config.parse_args(rest)  # dotted --coqpit.* overrides
    if rest:
        print(f" [!] Unused CLI args: {rest}")

    if args.output_path:
        output_path = args.output_path
    elif config.output_path:
        # config.output_path is the experiment ROOT: stamp a fresh
        # <run_name>-<date>-<git hash> run dir under it (reference
        # ``get_experiment_folder_path``, trainer-pkg semantics)
        from tts_tpu.utils.generic import get_experiment_folder_path

        output_path = get_experiment_folder_path(config.output_path, config.run_name or "run")
    else:
        output_path = os.path.join(os.getcwd(), "run")
    if args.continue_path:
        output_path = args.continue_path

    train_samples, eval_samples = load_tts_samples(
        [d.to_dict() for d in config.datasets],
        eval_split=True,
        eval_split_max_size=config.eval_split_max_size,
        eval_split_size=config.eval_split_size,
    )
    model = setup_model(config)
    trainer = Trainer(
        TrainerArgs(continue_path=args.continue_path, restore_path=args.restore_path),
        config,
        output_path,
        model,
        train_samples,
        eval_samples,
    )
    trainer.fit()


if __name__ == "__main__":
    main()
