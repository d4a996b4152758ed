"""UnivNet discriminator: multi-resolution spectrogram D + MPD
(reference ``TTS/vocoder/models/univnet_discriminator.py``)."""

from __future__ import annotations

from typing import List, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from tts_tpu.audio import jax_transforms as jt
from tts_tpu.vocoder.models.hifigan_discriminator import MultiPeriodDiscriminator


class SpecDiscriminator(nn.Module):
    """2-D convs over an STFT magnitude (reference ``univnet_discriminator.py``)."""

    fft_size: int = 1024
    hop_length: int = 120
    win_length: int = 600

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        # x: [B, T, 1] waveform -> magnitude [B, T', F, 1]
        mag = jt.stft_magnitude(x[..., 0], self.fft_size, self.hop_length, self.win_length)
        h = jnp.swapaxes(mag, 1, 2)[..., None]
        feats = []
        for i, (ch, stride) in enumerate([(32, (1, 1)), (32, (2, 2)), (32, (1, 2)), (32, (2, 2))]):
            h = nn.Conv(ch, (3, 9) if i < 3 else (3, 3), strides=stride, padding="SAME", name=f"conv_{i}")(h)
            h = nn.leaky_relu(h, 0.2)
            feats.append(h)
        score = nn.Conv(1, (3, 3), padding="SAME", name="conv_post")(h)
        feats.append(score)
        return score.reshape(score.shape[0], -1), feats


class MultiResSpecDiscriminator(nn.Module):
    fft_sizes: Sequence[int] = (1024, 2048, 512)
    hop_lengths: Sequence[int] = (120, 240, 50)
    win_lengths: Sequence[int] = (600, 1200, 240)

    @nn.compact
    def __call__(self, x):
        scores, feats = [], []
        for i, (f, h, w) in enumerate(zip(self.fft_sizes, self.hop_lengths, self.win_lengths)):
            s, ft = SpecDiscriminator(f, h, w, name=f"spec_{i}")(x)
            scores.append(s)
            feats.append(ft)
        return scores, feats


class UnivnetDiscriminator(nn.Module):
    """MRSD + MPD composite."""

    @nn.compact
    def __call__(self, x):
        s1, f1 = MultiResSpecDiscriminator(name="mrsd")(x)
        s2, f2 = MultiPeriodDiscriminator(name="mpd")(x)
        return s1 + s2, f1 + f2
