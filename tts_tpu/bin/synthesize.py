"""`tts` CLI — synthesize speech from the command line
(reference ``TTS/bin/synthesize.py:144``).

Examples:
    python -m tts_tpu.bin.synthesize --text "Hello" \
        --model_path run/best_model.msgpack --out_path out.wav
    python -m tts_tpu.bin.synthesize --list_models
"""

from __future__ import annotations

import argparse
import sys


def str2bool(v):
    if isinstance(v, bool):
        return v
    return v.lower() in ("yes", "true", "t", "y", "1")


def make_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="TPU-native TTS synthesis CLI")
    parser.add_argument("--list_models", action="store_true", help="list released zoo models")
    parser.add_argument("--text", type=str, default=None, help="Text to synthesize.")
    parser.add_argument("--model_name", type=str, default=None, help="Zoo model name.")
    parser.add_argument("--model_path", type=str, default=None, help="Path to model checkpoint.")
    parser.add_argument("--config_path", type=str, default=None, help="Path to model config.")
    parser.add_argument("--vocoder_name", type=str, default=None)
    parser.add_argument("--vocoder_path", type=str, default=None)
    parser.add_argument("--vocoder_config_path", type=str, default=None)
    parser.add_argument("--out_path", type=str, default="tts_output.wav")
    parser.add_argument("--pipe_out", action="store_true", help="stream wav to stdout")
    parser.add_argument("--speaker_idx", type=str, default=None)
    parser.add_argument("--language_idx", type=str, default=None)
    parser.add_argument("--speaker_wav", nargs="+", default=None)
    parser.add_argument("--list_speaker_idxs", action="store_true")
    parser.add_argument("--list_language_idxs", action="store_true")
    # same-model voice transfer (reference synthesize.py:370-382)
    parser.add_argument("--reference_wav", type=str, default=None,
                        help="transfer this wav's content to --speaker_idx's voice")
    parser.add_argument("--reference_speaker_idx", type=str, default=None)
    parser.add_argument("--style_wav", type=str, default=None, help="GST style reference")
    # voice conversion (reference synthesize.py:383-397)
    parser.add_argument("--source_wav", type=str, default=None, help="VC source wav")
    parser.add_argument("--target_wav", type=str, default=None, help="VC target-voice wav")
    return parser


def main():
    args = make_parser().parse_args()

    if args.list_models:
        from tts_tpu.utils.manage import ModelManager

        for name in ModelManager().list_models():
            print(name)
        return

    from tts_tpu.api import TTS

    tts = TTS(
        model_name=args.model_name or "",
        model_path=args.model_path,
        config_path=args.config_path,
        vocoder_path=args.vocoder_path,
        vocoder_config_path=args.vocoder_config_path,
    )

    if args.list_speaker_idxs:
        print(tts.speakers)
        return
    if args.list_language_idxs:
        print(tts.languages)
        return

    if args.source_wav is not None and args.target_wav is not None:
        tts.voice_conversion_to_file(
            source_wav=args.source_wav, target_wav=args.target_wav, file_path=args.out_path
        )
        print(f" > Saving output to {args.out_path}")
        return

    if args.reference_wav is not None:
        wav = tts.synthesizer.tts(
            reference_wav=args.reference_wav,
            speaker_name=args.speaker_idx,
            reference_speaker_name=args.reference_speaker_idx,
        )
        tts.synthesizer.save_wav(wav, args.out_path)
        print(f" > Saving output to {args.out_path}")
        return

    if args.text is None:
        print(" [!] Provide --text", file=sys.stderr)
        sys.exit(1)

    pipe_out = sys.stdout if args.pipe_out else None
    tts.tts_to_file(
        args.text,
        speaker=args.speaker_idx,
        language=args.language_idx,
        speaker_wav=args.speaker_wav,
        style_wav=args.style_wav,
        file_path=args.out_path,
        pipe_out=pipe_out,
    )
    print(f" > Saving output to {args.out_path}")


if __name__ == "__main__":
    main()
