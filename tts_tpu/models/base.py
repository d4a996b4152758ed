"""Shared model-wrapper helpers (reference ``TTS/tts/models/base_tts.py``
init plumbing)."""

from __future__ import annotations


def init_speaker_manager(model, config, samples=None):
    """Attach speaker/language managers and sync num_speakers fields
    (reference ``base_tts.py:79`` init_multispeaker)."""
    from tts_tpu.utils.managers import LanguageManager, SpeakerManager

    speaker_manager = SpeakerManager.init_from_config(config, samples)
    language_manager = LanguageManager.init_from_config(config)
    model.speaker_manager = speaker_manager
    model.language_manager = language_manager
    num_speakers = speaker_manager.num_speakers if speaker_manager else 0
    for target in (config, getattr(config, "model_args", None)):
        if target is None:
            continue
        if hasattr(target, "num_speakers") and num_speakers:
            target.num_speakers = num_speakers
        if language_manager and hasattr(target, "num_languages"):
            target.num_languages = language_manager.num_languages
    return model


def init_tokenizer(config):
    """Build the tokenizer for a model config and sync ``num_chars``.

    Always constructs the tokenizer (needed at synthesis time even when
    ``num_chars`` is already present in a checkpoint config).
    Returns (tokenizer, config).
    """
    from tts_tpu.text import TTSTokenizer

    tokenizer, config = TTSTokenizer.init_from_config(config)
    num_chars = tokenizer.characters.num_chars
    if hasattr(config, "model_args") and hasattr(config.model_args, "num_chars"):
        if config.model_args.num_chars is None:
            config.model_args.num_chars = num_chars
    if hasattr(config, "num_chars") and config.num_chars is None:
        config.num_chars = num_chars
    return tokenizer, config
