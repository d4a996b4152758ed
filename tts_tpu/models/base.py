"""Shared model-wrapper helpers (reference ``TTS/tts/models/base_tts.py``
init plumbing)."""

from __future__ import annotations


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
