"""XTTS config (reference ``TTS/tts/configs/xtts_config.py`` +
``models/xtts.py`` XttsArgs/XttsAudioConfig)."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

from tts_tpu.config.base import Config
from tts_tpu.config.shared import BaseTTSConfig


@dataclass
class XttsAudioConfig(Config):
    sample_rate: int = 22050
    output_sample_rate: int = 24000


@dataclass
class XttsArgs(Config):
    """(reference ``xtts.py`` XttsArgs; defaults = XTTS-v2)"""

    gpt_batch_size: int = 1
    enable_redaction: bool = False
    kv_cache: bool = True
    gpt_checkpoint: Optional[str] = None
    clvp_checkpoint: Optional[str] = None
    decoder_checkpoint: Optional[str] = None
    num_chars: int = 255

    # GPT
    gpt_max_audio_tokens: int = 605
    gpt_max_text_tokens: int = 402
    gpt_max_prompt_tokens: int = 70
    gpt_layers: int = 30
    gpt_n_model_channels: int = 1024
    gpt_n_heads: int = 16
    gpt_number_text_tokens: int = 6681
    gpt_start_text_token: Optional[int] = None
    gpt_stop_text_token: Optional[int] = None
    gpt_num_audio_tokens: int = 1026
    gpt_start_audio_token: int = 1024
    gpt_stop_audio_token: int = 1025
    gpt_code_stride_len: int = 1024
    gpt_use_masking_gt_prompt_approach: bool = True
    gpt_use_perceiver_resampler: bool = True
    # rematerialize GPT block activations during fine-tuning
    # (jax.checkpoint: ~1/3 extra FLOPs for O(layers) less HBM)
    gpt_use_remat: bool = False
    # sequence-parallel fine-tuning: run the GPT core under shard_map with
    # the (cond+text+mel) sequence sharded over the mesh "seq" axis and
    # ring attention rotating K/V over ICI (parallel/ring_attention.py).
    # Requires passing a mesh with a "seq" axis to
    # GPTTrainer.make_train_step; see docs/parallelism.md.
    gpt_seq_parallel: bool = False
    # serving: store GPT matmul kernels as int8 + per-channel scales and
    # dequantize inside the jitted decode (ops/quant.py) — AR decode is
    # HBM-bound, so int8 weights nearly halve step time on TPU
    gpt_int8_weights: bool = False

    # fine-tune dataset limits (reference ``gpt_trainer.py`` GPTArgs :41-48)
    min_conditioning_length: int = 66150
    max_conditioning_length: int = 132300
    max_wav_length: int = 255995  # ~11.6 s @ 22050
    max_text_length: int = 200

    # HiFi decoder
    input_sample_rate: int = 22050
    output_sample_rate: int = 24000
    output_hop_length: int = 256
    decoder_input_dim: int = 1024
    d_vector_dim: int = 512
    cond_d_vector_in_each_upsampling_layer: bool = True

    # inference
    duration_const: int = 102400


@dataclass
class XttsConfig(BaseTTSConfig):
    """(reference ``configs/xtts_config.py``)"""

    model: str = "xtts"
    model_args: XttsArgs = field(default_factory=XttsArgs)
    audio: XttsAudioConfig = field(default_factory=XttsAudioConfig)
    model_dir: Optional[str] = None
    languages: List[str] = field(
        default_factory=lambda: [
            "en", "es", "fr", "de", "it", "pt", "pl", "tr", "ru", "nl",
            "cs", "ar", "zh-cn", "hu", "ko", "ja", "hi",
        ]
    )
    # inference sampling defaults (reference xtts_config.py)
    temperature: float = 0.75
    length_penalty: float = 1.0
    repetition_penalty: float = 5.0
    top_k: int = 50
    top_p: float = 0.85
    num_gpt_outputs: int = 1
    gpt_cond_len: int = 30
    gpt_cond_chunk_len: int = 4
    max_ref_len: int = 30
    sound_norm_refs: bool = False
