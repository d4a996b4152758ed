"""tts_tpu — a TPU-native (JAX/XLA/Pallas) text-to-speech framework.

A ground-up rebuild of the capabilities of coqui-ai/TTS (reference
v0.22.0) designed for TPUs: functional flax models compiled with XLA,
static-shape bucketing, pjit/shard_map data- and model-parallelism over
device meshes, Pallas kernels on the hot paths, and a host-side runtime
(datasets, text frontend, DSP, model zoo) with no torch dependency.
"""

__version__ = "0.1.0"


def _lazy_api():
    from tts_tpu.api import TTS

    return TTS


def __getattr__(name):
    if name == "TTS":
        return _lazy_api()
    raise AttributeError(name)
