"""Shared NN building blocks (flax.linen, time-major [B, T, C]).

TPU-native rebuild of reference ``TTS/tts/layers/``: channels ride the TPU
lane dimension (channels-last), convs lower to MXU matmuls, and every
module is a pure flax module safe under jit/pjit.
"""

from .common import Conv1d, LayerNorm, ConvLayerNormBlock, DurationPredictor  # noqa: F401
from .transformer import RelativePositionTransformer  # noqa: F401
from .wavenet import WN  # noqa: F401
