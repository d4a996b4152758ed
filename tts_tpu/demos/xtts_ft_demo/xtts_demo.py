"""XTTS fine-tuning demo — CLI workflow
(reference ``TTS/demos/xtts_ft_demo/xtts_demo.py``, a Gradio app; this
zero-egress TPU build drives the same three stages from the command line).

Stages:
  1. preprocess  — clips (+ transcripts) → coqui-format train/eval CSVs
  2. train       — GPT fine-tune via GPTTrainer (optionally from a
                   pretrained XTTS checkpoint)
  3. test        — synthesize with the fine-tuned model, cloning from a
                   reference clip

Example:
  python -m tts_tpu.demos.xtts_ft_demo.xtts_demo preprocess \
      --audio_dir clips/ --language en --out_path ft_data/
  python -m tts_tpu.demos.xtts_ft_demo.xtts_demo train \
      --train_csv ft_data/metadata_train.csv --eval_csv ft_data/metadata_eval.csv \
      --language en --num_epochs 6 --batch_size 2 --grad_acumm 1 --out_path ft_run/
  python -m tts_tpu.demos.xtts_ft_demo.xtts_demo test \
      --config ft_run/run/training/config.json \
      --checkpoint ft_run/run/training/best_model.msgpack \
      --speaker_wav clips/ref.wav --text "Hello there." --language en
"""

from __future__ import annotations

import argparse
import glob
import os
import sys


def _cmd_preprocess(args):
    from tts_tpu.demos.xtts_ft_demo.utils.formatter import format_audio_list

    audio_files = sorted(
        f
        for pat in ("*.wav", "*.flac", "*.mp3")
        for f in glob.glob(os.path.join(args.audio_dir, pat))
    )
    if not audio_files:
        sys.exit(f"no audio files under {args.audio_dir}")
    train_csv, eval_csv, total = format_audio_list(
        audio_files,
        target_language=args.language,
        out_path=args.out_path,
        transcripts_csv=args.transcripts_csv,
        eval_percentage=args.eval_percentage,
        speaker_name=args.speaker_name,
    )
    print(f" > train: {train_csv}\n > eval:  {eval_csv}\n > audio: {total:.1f}s")


def _cmd_train(args):
    from tts_tpu.demos.xtts_ft_demo.utils.gpt_train import train_gpt

    config_path, ckpt = train_gpt(
        language=args.language,
        num_epochs=args.num_epochs,
        batch_size=args.batch_size,
        grad_acumm=args.grad_acumm,
        train_csv=args.train_csv,
        eval_csv=args.eval_csv,
        output_path=args.out_path,
        xtts_checkpoint=args.xtts_checkpoint,
        tokenizer_file=args.tokenizer_file,
        lr=args.lr,
        tiny=args.tiny,
    )
    print(f" > Fine-tune done.\n > config: {config_path}\n > checkpoint: {ckpt}")


def _cmd_test(args):
    import numpy as np

    from tts_tpu.audio.numpy_transforms import save_wav
    from tts_tpu.utils.synthesizer import Synthesizer

    synth = Synthesizer(tts_checkpoint=args.checkpoint, tts_config_path=args.config)
    wav = synth.tts(args.text, speaker_wav=args.speaker_wav, language_name=args.language)
    save_wav(wav=np.asarray(wav), path=args.out_wav, sample_rate=synth.output_sample_rate)
    print(f" > Wrote {args.out_wav}")


def main():
    parser = argparse.ArgumentParser(description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("preprocess", help="format clips into train/eval CSVs")
    p.add_argument("--audio_dir", required=True)
    p.add_argument("--language", default="en")
    p.add_argument("--out_path", default="ft_dataset")
    p.add_argument("--transcripts_csv", default=None,
                   help="optional 'audio|text' CSV; otherwise clip.txt sidecars")
    p.add_argument("--eval_percentage", type=float, default=0.15)
    p.add_argument("--speaker_name", default="coqui")
    p.set_defaults(fn=_cmd_preprocess)

    p = sub.add_parser("train", help="GPT fine-tune")
    p.add_argument("--train_csv", required=True)
    p.add_argument("--eval_csv", required=True)
    p.add_argument("--language", default="en")
    p.add_argument("--num_epochs", type=int, default=6)
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--grad_acumm", type=int, default=1)
    p.add_argument("--lr", type=float, default=5e-6)
    p.add_argument("--out_path", default="ft_run")
    p.add_argument("--xtts_checkpoint", default=None,
                   help="pretrained model.pth (torch) or .msgpack to start from")
    p.add_argument("--tokenizer_file", default=None, help="vocab.json (BPE)")
    p.add_argument("--tiny", action="store_true", help="smoke-scale GPT")
    p.set_defaults(fn=_cmd_train)

    p = sub.add_parser("test", help="synthesize with the fine-tuned model")
    p.add_argument("--config", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--speaker_wav", required=True)
    p.add_argument("--text", required=True)
    p.add_argument("--language", default="en")
    p.add_argument("--out_wav", default="ft_test.wav")
    p.set_defaults(fn=_cmd_test)

    args = parser.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
