"""Vocoder model registry (reference ``TTS/vocoder/models/__init__.py``)."""

from __future__ import annotations

import importlib

_GENERATORS = {
    "hifigan_generator": "tts_tpu.vocoder.models.hifigan_generator:HifiganGenerator",
    "melgan_generator": "tts_tpu.vocoder.models.melgan_generator:MelganGenerator",
    "multiband_melgan_generator": "tts_tpu.vocoder.models.melgan_generator:MultibandMelganGenerator",
    "fullband_melgan_generator": "tts_tpu.vocoder.models.melgan_generator:FullbandMelganGenerator",
    "parallel_wavegan_generator": "tts_tpu.vocoder.models.parallel_wavegan_generator:ParallelWaveganGenerator",
    "univnet_generator": "tts_tpu.vocoder.models.univnet_generator:UnivnetGenerator",
    "istft_hifigan_generator": "tts_tpu.vocoder.models.istft_hifigan:IstftHifiganGenerator",
    "wavegrad": "tts_tpu.vocoder.models.wavegrad:Wavegrad",
    "wavernn": "tts_tpu.vocoder.models.wavernn:Wavernn",
}

_DISCRIMINATORS = {
    "hifigan_discriminator": "tts_tpu.vocoder.models.hifigan_discriminator:HifiganDiscriminator",
    "melgan_multiscale_discriminator": "tts_tpu.vocoder.models.melgan_discriminator:MelganMultiscaleDiscriminator",
    "univnet_discriminator": "tts_tpu.vocoder.models.univnet_discriminator:UnivnetDiscriminator",
    "parallel_wavegan_discriminator": "tts_tpu.vocoder.models.parallel_wavegan_generator:ParallelWaveganDiscriminator",
    "random_window_discriminator": "tts_tpu.vocoder.models.random_window_discriminator:RandomWindowDiscriminator",
    "melgan_discriminator": "tts_tpu.vocoder.models.melgan_discriminator:MelganDiscriminator",
}


def _resolve(table, name):
    key = name.lower().replace("melgan", "melgan")  # normalized lookup
    if key not in table:
        raise ModuleNotFoundError(f" [!] Unknown vocoder module {name!r}")
    mod_name, cls_name = table[key].split(":")
    return getattr(importlib.import_module(mod_name), cls_name)


def setup_model(config):
    """Config → Trainer-contract vocoder model (reference
    ``vocoder/models/__init__.py:12`` setup_model dispatch by
    ``config.model``)."""
    name = (config.model or "gan").lower()
    if name == "wavegrad":
        from tts_tpu.vocoder.models.wavegrad import WavegradVocoder

        return WavegradVocoder(config)
    if name == "wavernn":
        from tts_tpu.vocoder.models.wavernn import WavernnVocoder

        return WavernnVocoder(config)
    # every GAN-family config (hifigan, melgan, multiband_melgan,
    # fullband_melgan, parallel_wavegan, univnet, gan) trains through the
    # generic generator × discriminator wrapper
    from tts_tpu.vocoder.models.gan import GAN

    return GAN(config)


def setup_generator(name: str):
    return _resolve(_GENERATORS, name)


def setup_discriminator(name: str):
    return _resolve(_DISCRIMINATORS, name)
