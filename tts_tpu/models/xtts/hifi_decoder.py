"""XTTS HiFi decoder: GPT latents → 24 kHz waveform
(reference ``TTS/tts/layers/xtts/hifigan_decoder.py:615`` HifiDecoder).

Latents are linearly upsampled from the GPT code rate (1024 samples/code)
to the decoder frame rate, then run through a speaker-conditioned HiFiGAN.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from tts_tpu.encoder.model import ResNetSpeakerEncoder
from tts_tpu.vocoder.models.hifigan_generator import HifiganGenerator


class HifiDecoder(nn.Module):
    input_sample_rate: int = 22050
    output_sample_rate: int = 24000
    output_hop_length: int = 256
    ar_mel_length_compression: int = 1024
    decoder_input_dim: int = 1024
    d_vector_dim: int = 512
    cond_d_vector_in_each_upsampling_layer: bool = True

    def setup(self):
        self.waveform_decoder = HifiganGenerator(
            in_channels=self.decoder_input_dim,
            out_channels=1,
            resblock_type="1",
            resblock_dilation_sizes=((1, 3, 5), (1, 3, 5), (1, 3, 5)),
            resblock_kernel_sizes=(3, 7, 11),
            upsample_kernel_sizes=(16, 16, 4, 4),
            upsample_initial_channel=512,
            upsample_factors=(8, 8, 2, 2),
            inference_padding=0,
            cond_channels=self.d_vector_dim,
            conv_post_bias=False,
            cond_in_each_up_layer=self.cond_d_vector_in_each_upsampling_layer,
            name="waveform_decoder",
        )
        # "folded" norm = eval-mode BatchNorm as elementwise affine, which is
        # what converted reference checkpoints carry (running stats folded in)
        self.speaker_encoder = ResNetSpeakerEncoder(
            input_dim=64, proj_dim=512, log_input=True, norm_type="folded",
            name="speaker_encoder",
        )

    @staticmethod
    def _linear_interp(x: jnp.ndarray, scale: float) -> jnp.ndarray:
        """Time-axis linear upsample matching ``F.interpolate(scale_factor=s,
        mode="linear")``: the GIVEN scale drives the coordinate map (not the
        in/out shape ratio, which differs for non-integer scales)."""
        T_in = x.shape[1]
        T_out = int(T_in * scale)
        pos = (jnp.arange(T_out) + 0.5) / scale - 0.5
        pos = jnp.clip(pos, 0.0, T_in - 1)
        lo = jnp.floor(pos).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, T_in - 1)
        w = (pos - lo)[None, :, None]
        return x[:, lo] * (1.0 - w) + x[:, hi] * w

    def __call__(self, latents: jnp.ndarray, g: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """latents [B, T_codes, D] → wav [B, T_wav, 1]."""
        z = self._linear_interp(latents, self.ar_mel_length_compression / self.output_hop_length)
        if self.output_sample_rate != self.input_sample_rate:
            z = self._linear_interp(z, self.output_sample_rate / self.input_sample_rate)
        return self.waveform_decoder(z, g=g)

    def embed_speaker(self, mel: jnp.ndarray) -> jnp.ndarray:
        """Speaker mel features [B, T, 64] → d-vector [B, 512]."""
        return self.speaker_encoder(mel, l2_norm=True)

    def init_all(self, latents, g, mel):
        """Trace both sub-nets so ``init`` creates every parameter."""
        return self(latents, g), self.embed_speaker(mel)
