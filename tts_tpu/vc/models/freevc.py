"""FreeVC — any-to-any voice conversion (reference ``TTS/vc/models/freevc.py:298``).

VITS-style architecture: content (WavLM SSL) features → prior encoder;
linear spec → posterior encoder; residual-coupling flow bridges them,
conditioned on a speaker embedding; HiFiGAN decodes.  The WavLM content
encoder is the native flax port in :mod:`tts_tpu.vc.modules.wavlm`
(converted from the torch WavLM-Large checkpoint on first use via
``tts_tpu.utils.convert.convert_wavlm``); any callable
``wav → [B, T, ssl_dim]`` can be substituted.
"""

from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from tts_tpu.layers.wavenet import WN
from tts_tpu.models.vits.modules import PosteriorEncoder, ResidualCouplingBlocks
from tts_tpu.ops import rand_segments, sequence_mask
from tts_tpu.vocoder.models.hifigan_generator import HifiganGenerator

from tts_tpu.vc.configs import FreeVCConfig


class ContentEncoder(nn.Module):
    """SSL features → prior stats (reference freevc Encoder: WN-based)."""

    out_channels: int
    hidden_channels: int
    kernel_size: int = 5
    n_layers: int = 16

    @nn.compact
    def __call__(self, x, x_lengths, train: bool = False):
        x_mask = sequence_mask(x_lengths, x.shape[1])[:, :, None].astype(jnp.float32)
        h = nn.Dense(self.hidden_channels, name="pre")(x) * x_mask
        h = WN(
            hidden_channels=self.hidden_channels,
            kernel_size=self.kernel_size,
            dilation_rate=1,
            num_layers=self.n_layers,
            name="enc",
        )(h, x_mask, train=train)
        stats = nn.Dense(self.out_channels * 2, name="proj")(h) * x_mask
        m, logs = jnp.split(stats, 2, axis=-1)
        return m, logs, x_mask


class FreeVCSpeakerEncoder(nn.Module):
    """Reference in-model speaker encoder (``freevc.py:256``): plain
    3-layer LSTM over mels [B, T, 80] → final hidden of the last layer →
    Linear → ReLU → L2 normalize."""

    mel_n_channels: int = 80
    num_layers: int = 3
    hidden_size: int = 256
    embedding_size: int = 256

    @nn.compact
    def __call__(self, mels):  # [B, T, M] → [B, E]
        h = mels
        carry = None
        for l in range(self.num_layers):
            cell = nn.OptimizedLSTMCell(self.hidden_size, name=f"lstm_{l}")
            carry, h = nn.RNN(cell, return_carry=True)(h)
        final_h = carry[1]  # LSTM carry = (c, h)
        e = nn.relu(nn.Dense(self.embedding_size, name="linear")(final_h))
        return e / jnp.maximum(jnp.linalg.norm(e, axis=1, keepdims=True), 1e-12)


def embed_utterance_partials(apply_fn, mel, partial_frames: int = 128,
                             partial_hop: int = 64):
    """Reference ``SpeakerEncoder.embed_utterance`` (``freevc.py:277``):
    mean embedding over 128-frame windows hopped by 64 (+ the final
    window), single window for short inputs.  ``apply_fn([N, F, M]) →
    [N, E]``; ``mel`` is [1, T, M]."""
    T = mel.shape[1]
    last = mel[:, -partial_frames:]
    if T > partial_frames:
        starts = list(range(0, T - partial_frames, partial_hop))
        windows = [mel[0, s : s + partial_frames] for s in starts]
        windows.append(last[0])
        embeds = apply_fn(jnp.stack(windows))
        return jnp.mean(embeds, axis=0, keepdims=True)
    return apply_fn(last)


class FreeVCModule(nn.Module):
    args: "FreeVCArgs"

    def setup(self):
        a = self.args
        self.enc_p = ContentEncoder(
            out_channels=a.inter_channels, hidden_channels=a.hidden_channels, name="enc_p"
        )
        self.enc_q = PosteriorEncoder(
            in_channels=a.spec_channels,
            out_channels=a.inter_channels,
            hidden_channels=a.hidden_channels,
            kernel_size=5,
            dilation_rate=1,
            num_layers=16,
            cond_channels=a.gin_channels,
            name="enc_q",
        )
        self.flow = ResidualCouplingBlocks(
            channels=a.inter_channels,
            hidden_channels=a.hidden_channels,
            kernel_size=5,
            dilation_rate=1,
            num_layers=4,
            cond_channels=a.gin_channels,
            name="flow",
        )
        self.dec = HifiganGenerator(
            in_channels=a.inter_channels,
            out_channels=1,
            resblock_type=a.resblock,
            resblock_dilation_sizes=tuple(map(tuple, a.resblock_dilation_sizes)),
            resblock_kernel_sizes=tuple(a.resblock_kernel_sizes),
            upsample_kernel_sizes=tuple(a.upsample_kernel_sizes),
            upsample_initial_channel=a.upsample_initial_channel,
            upsample_factors=tuple(a.upsample_rates),
            cond_channels=a.gin_channels,
            conv_post_bias=False,  # reference freevc.py:127
            name="dec",
        )
        if not a.use_spk:
            self.enc_spk = FreeVCSpeakerEncoder(
                hidden_size=a.gin_channels, embedding_size=a.gin_channels,
                name="enc_spk",
            )

    def __call__(self, c, c_lengths, spec, spec_lengths, g, train: bool = False):
        """Training forward: c = SSL content [B, T, ssl_dim], spec = linear
        spec [B, T, C], g = speaker embedding [B, gin]."""
        m_p, logs_p, _ = self.enc_p(c, c_lengths, train=train)
        z, m_q, logs_q, y_mask = self.enc_q(spec, spec_lengths, g=g, train=train)
        z_p = self.flow(z, y_mask, g=g, train=train)
        seg_rng = self.make_rng("segments")
        z_slice, ids = rand_segments(
            seg_rng, z, spec_lengths, segment_size=32, let_short_samples=True, pad_short=True
        )
        o = self.dec(z_slice, g=g)
        return {
            "model_outputs": o,
            "m_p": m_p,
            "logs_p": logs_p,
            "z_p": z_p,
            "m_q": m_q,
            "logs_q": logs_q,
            "slice_ids": ids,
            "y_mask": y_mask,
        }

    def init_all(self, c, c_lengths, spec, spec_lengths, g):
        """Init trace covering the training forward AND the in-model
        speaker encoder (not reached by ``__call__``, which takes g)."""
        out = self(c, c_lengths, spec, spec_lengths, g)
        if not self.args.use_spk:
            _ = self.enc_spk(jnp.zeros((1, 9, 80)))
        return out

    def voice_conversion(self, c, c_lengths, g_tgt):
        """Content features + target speaker → converted waveform
        (reference ``freevc.py`` voice_conversion)."""
        m_p, logs_p, x_mask = self.enc_p(c, c_lengths, train=False)
        z_p = m_p + jnp.exp(logs_p) * jax.random.normal(self.make_rng("noise"), m_p.shape) * 0.5
        z = self.flow(z_p * x_mask, x_mask, g=g_tgt, reverse=True)
        return self.dec(z * x_mask, g=g_tgt)


class FreeVC:
    """Host wrapper (reference ``FreeVC``)."""

    def __init__(self, config: FreeVCConfig):
        self.config = config
        self.args = config.model_args
        self.module = FreeVCModule(args=self.args)
        self.params = None
        # wav [B, T] @16 kHz → SSL content features [B, T', ssl_dim]
        # (WavLM; see tts_tpu.vc.modules.wavlm)
        self.content_extractor = None
        self.speaker_encoder = None  # external d-vector model when use_spk

    def set_params(self, params):
        self.params = params

    def voice_conversion_from_files(self, source_wav: str, target_wav) -> "np.ndarray":
        """Raw file paths → converted waveform (reference
        ``freevc.py voice_conversion`` driven from ``synthesizer.py:250``)."""
        import numpy as np

        from tts_tpu.audio.numpy_transforms import load_wav

        if self.params is None:
            raise RuntimeError("FreeVC params not set (set_params).")
        if self.content_extractor is None:
            self._init_default_content_extractor()
        src = load_wav(filename=source_wav, sample_rate=self.config.audio.input_sample_rate, resample=True)
        tgt_path = target_wav[0] if isinstance(target_wav, (list, tuple)) else target_wav
        tgt = load_wav(filename=tgt_path, sample_rate=self.config.audio.input_sample_rate, resample=True)

        c = self.content_extractor(jnp.asarray(src)[None])  # [1, T', ssl]
        c_lengths = jnp.asarray([c.shape[1]], jnp.int32)
        g = self._embed_target_speaker(np.asarray(tgt))
        wav = self.voice_conversion(self.params, c, c_lengths, g)
        return np.asarray(wav, np.float32).reshape(-1)

    def _init_default_content_extractor(self) -> None:
        from tts_tpu.vc.modules.wavlm import load_wavlm

        self.content_extractor = load_wavlm()

    def _embed_target_speaker(self, wav_16k) -> jnp.ndarray:
        """Target wav → speaker embedding: external encoder when ``use_spk``
        (reference pretrained LSTM encoder), else the in-model ``enc_spk``."""
        import numpy as np

        if self.args.use_spk:
            if self.speaker_encoder is None:
                raise RuntimeError(
                    "FreeVC config has use_spk=True (external speaker encoder) "
                    "but no speaker_encoder is attached; set model.speaker_encoder "
                    "or use a checkpoint with the in-model enc_spk (use_spk=False)."
                )
            return jnp.asarray(
                np.asarray(self.speaker_encoder.embed_utterance(wav_16k)).reshape(1, -1)
            )
        from tts_tpu.audio import jax_transforms as jt

        a = self.config.audio
        mel = jt.wav_to_mel(
            jnp.asarray(wav_16k)[None],
            n_fft=a.filter_length,
            num_mels=a.n_mel_channels,
            sample_rate=a.input_sample_rate,
            hop_length=a.hop_length,
            win_length=a.win_length,
            fmin=a.mel_fmin,
            fmax=a.mel_fmax,
            center=False,
        )
        feats = jnp.swapaxes(mel, 1, 2)
        # reference embed_utterance: mean over 128-frame windows (freevc.py:277)
        return embed_utterance_partials(
            lambda windows: self.module.apply(
                self.params, windows, method=lambda m, f: m.enc_spk(f)
            ),
            feats,
        )

    @classmethod
    def init_from_config(cls, config: FreeVCConfig, samples=None):
        return cls(config)

    def init_params(self, rng, t: int = 16):
        a = self.args
        return self.module.init(
            {"params": rng, "noise": jax.random.fold_in(rng, 1),
             "segments": jax.random.fold_in(rng, 2)},
            jnp.zeros((1, t, a.ssl_dim)),
            jnp.full((1,), t, jnp.int32),
            jnp.zeros((1, t, a.spec_channels)),
            jnp.full((1,), t, jnp.int32),
            jnp.zeros((1, a.gin_channels)),
            method=self.module.init_all,
        )

    def voice_conversion(self, params, content_features, content_lengths, target_speaker_emb, rng=None):
        return self.module.apply(
            params,
            content_features,
            content_lengths,
            target_speaker_emb,
            method=self.module.voice_conversion,
            rngs={"noise": rng if rng is not None else jax.random.PRNGKey(0)},
        )
