"""torch.hub entry point (reference ``hubconf.py:7-40``):

    synthesizer = torch.hub.load('<this repo>', 'tts',
                                 model_name='tts_models/en/ljspeech/glow-tts')
    wav = synthesizer.tts("Hello.")

Returns the tts_tpu :class:`Synthesizer` (JAX/TPU inference under the
hood); kept so reference users' hub workflows keep working.
"""

dependencies = ["jax", "flax", "numpy"]


def tts(
    model_name: str = "tts_models/en/ljspeech/glow-tts",
    vocoder_name: str = None,
    use_cuda: bool = False,  # accepted for reference-API compat; ignored
):
    """Download (once) and load a zoo model, return a ready Synthesizer."""
    from tts_tpu.utils.manage import ModelManager
    from tts_tpu.utils.synthesizer import Synthesizer

    manager = ModelManager()
    model_path, config_path, model_item = manager.download_model(model_name)
    if vocoder_name is None:
        vocoder_name = model_item.get("default_vocoder")
    vocoder_path, vocoder_config_path = None, None
    if vocoder_name is not None:
        vocoder_path, vocoder_config_path, _ = manager.download_model(vocoder_name)

    return Synthesizer(
        tts_checkpoint=model_path,
        tts_config_path=config_path,
        vocoder_checkpoint=vocoder_path,
        vocoder_config=vocoder_config_path,
    )


if __name__ == "__main__":
    synthesizer = tts()
    synthesizer.tts("This is a test.")
