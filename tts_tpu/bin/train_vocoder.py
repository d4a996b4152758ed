"""Train a vocoder from a config (reference ``TTS/bin/train_vocoder.py``)."""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_path", type=str, required=True)
    parser.add_argument("--continue_path", type=str, default="")
    parser.add_argument("--restore_path", type=str, default="")
    parser.add_argument("--output_path", type=str, default=None)
    args, rest = parser.parse_known_args(argv)

    from tts_tpu.config import load_config
    from tts_tpu.trainer.trainer import Trainer, TrainerArgs
    from tts_tpu.vocoder.dataset import load_wav_data
    from tts_tpu.vocoder.models import setup_model

    config = load_config(args.config_path)
    rest = config.parse_args(rest)
    output_path = args.output_path or config.output_path or os.path.join(os.getcwd(), "run_vocoder")

    eval_samples, train_samples = load_wav_data(config.data_path, config.eval_split_size)
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
