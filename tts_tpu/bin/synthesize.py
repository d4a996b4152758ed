"""`tts` CLI — synthesize speech from the command line
(reference ``TTS/bin/synthesize.py:144``).

Examples:
    python -m tts_tpu.bin.synthesize --text "Hello" \
        --model_path run/best_model.msgpack --out_path out.wav
    python -m tts_tpu.bin.synthesize --list_models
    python -m tts_tpu.bin.synthesize --model_info_by_idx tts_models/3
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
    parser.add_argument("--model_info_by_idx", type=str, default=None,
                        help="model info by query idx: <model_type>/<model_query_idx>")
    parser.add_argument("--model_info_by_name", type=str, default=None,
                        help="model info by full name: <model_type>/<language>/<dataset>/<model_name>")
    parser.add_argument("--text", type=str, default=None, help="Text to synthesize.")
    parser.add_argument("--model_name", type=str, default=None, help="Zoo model name.")
    parser.add_argument("--model_path", type=str, default=None, help="Path to model checkpoint.")
    parser.add_argument("--config_path", type=str, default=None, help="Path to model config.")
    parser.add_argument("--vocoder_name", type=str, default=None)
    parser.add_argument("--vocoder_path", type=str, default=None)
    parser.add_argument("--vocoder_config_path", type=str, default=None)
    parser.add_argument("--encoder_path", type=str, default=None,
                        help="speaker-encoder checkpoint for on-the-fly d-vectors")
    parser.add_argument("--encoder_config_path", type=str, default=None)
    parser.add_argument("--speakers_file_path", type=str, default=None,
                        help="JSON speakers file for a multi-speaker model")
    parser.add_argument("--language_ids_file_path", type=str, default=None,
                        help="JSON language-ids file for a multi-lingual model")
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
    parser.add_argument("--style_wav", "--gst_style", "--capacitron_style_wav",
                        dest="style_wav", type=str, default=None,
                        help="GST/Capacitron style-reference wav")
    parser.add_argument("--capacitron_style_text", dest="style_text", type=str, default=None,
                        help="transcription of the Capacitron style reference")
    parser.add_argument("--voice_dir", type=str, default=None,
                        help="directory of voice-cloning reference wavs (Bark/Tortoise)")
    # voice conversion (reference synthesize.py:383-397)
    parser.add_argument("--source_wav", type=str, default=None, help="VC source wav")
    parser.add_argument("--target_wav", type=str, default=None, help="VC target-voice wav")
    # accepted-for-compat flags (reference CLI has them; the first two select
    # torch devices — moot here, JAX picks TPU/CPU via JAX_PLATFORMS; the
    # reference defines --save_spectogram but never reads it either)
    parser.add_argument("--device", type=str, default=None, help="ignored (JAX selects the device)")
    parser.add_argument("--use_cuda", action="store_true", help="ignored (JAX selects the device)")
    parser.add_argument("--save_spectogram", action="store_true",
                        help="accepted for reference-CLI compat (no-op there too)")
    parser.add_argument("--progress_bar", type=str2bool, nargs="?", const=True, default=True,
                        help="show a download progress bar")
    return parser


def main():
    args = make_parser().parse_args()

    if args.list_models or args.model_info_by_idx or args.model_info_by_name:
        from tts_tpu.utils.manage import ModelManager

        manager = ModelManager(progress_bar=args.progress_bar)
        if args.list_models:
            for name in manager.list_models():
                print(name)
        if args.model_info_by_idx:
            manager.model_info_by_idx(args.model_info_by_idx)
        if args.model_info_by_name:
            manager.model_info_by_name(args.model_info_by_name)
        return

    if args.device or args.use_cuda:
        print(" > --device/--use_cuda are ignored: JAX selects TPU (or CPU via "
              "JAX_PLATFORMS=cpu).", file=sys.stderr)

    from tts_tpu.api import TTS

    vocoder_path, vocoder_config_path = args.vocoder_path, args.vocoder_config_path
    if args.vocoder_name and not vocoder_path:
        from tts_tpu.utils.manage import ModelManager

        vocoder_path, vocoder_config_path, _ = ModelManager(
            progress_bar=args.progress_bar
        ).download_model(args.vocoder_name)

    tts = TTS(
        model_name=args.model_name or "",
        model_path=args.model_path,
        config_path=args.config_path,
        vocoder_path=vocoder_path,
        vocoder_config_path=vocoder_config_path,
        speakers_file_path=args.speakers_file_path,
        language_ids_file_path=args.language_ids_file_path,
        encoder_path=args.encoder_path,
        encoder_config_path=args.encoder_config_path,
        voice_dir=args.voice_dir,
        progress_bar=args.progress_bar,
    )

    if args.list_speaker_idxs:
        print(" > Available speaker ids: (set --speaker_idx to one of these):")
        print(tts.speakers)
        return
    if args.list_language_idxs:
        print(" > Available language ids: (set --language_idx to one of these):")
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

    # guard: multi-speaker model with no speaker selected (reference
    # synthesize.py:456-461)
    if tts.is_multi_speaker and not (args.speaker_idx or args.speaker_wav):
        print(" [!] This is a multi-speaker model: set --speaker_idx (see "
              "--list_speaker_idxs) or --speaker_wav.", file=sys.stderr)
        sys.exit(1)

    pipe_out = sys.stdout if args.pipe_out else None
    tts.tts_to_file(
        args.text,
        speaker=args.speaker_idx,
        language=args.language_idx,
        speaker_wav=args.speaker_wav,
        style_wav=args.style_wav,
        style_text=args.style_text,
        file_path=args.out_path,
        pipe_out=pipe_out,
    )
    print(f" > Saving output to {args.out_path}")


if __name__ == "__main__":
    main()
