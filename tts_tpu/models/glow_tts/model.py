"""GlowTTS — flow-based TTS with monotonic alignment search.

TPU-native rebuild of reference ``TTS/tts/models/glow_tts.py`` +
``TTS/tts/layers/glow_tts/encoder.py``: time-major tensors, MAS as an
on-device ``lax.scan`` (no Cython round trip), and static-shape inference
via an explicit frame budget instead of data-dependent output shapes.

Architecture: text embedding → (prenet) → relative-position transformer →
(mean, log-scale, log-durations); mel → glow flow decoder; training aligns
encoder stats to flow latents with MAS; inference expands tokens by
predicted durations and runs the flow in reverse.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from tts_tpu.layers.common import ConvLayerNormBlock, DurationPredictor
from tts_tpu.layers.glow import GlowDecoder
from tts_tpu.layers.transformer import RelativePositionTransformer
from tts_tpu.ops import generate_path, maximum_path, sequence_mask

from .config import GlowTTSConfig


class GlowTTSEncoder(nn.Module):
    """Text encoder (reference ``glow_tts/encoder.py:15``)."""

    num_chars: int
    out_channels: int
    hidden_channels: int
    hidden_channels_dp: int
    encoder_params: dict
    dropout_p_dp: float = 0.1
    mean_only: bool = False
    use_prenet: bool = True
    c_in_channels: int = 0

    @nn.compact
    def __call__(self, x, x_lengths, g=None, train: bool = False):
        """x: ``[B, T_en]`` int ids → (mean, log_scale, log_dur, x_mask)."""
        h = nn.Embed(self.num_chars, self.hidden_channels, name="emb")(x)
        h = h * math.sqrt(self.hidden_channels)
        x_mask = sequence_mask(x_lengths, x.shape[1])[:, :, None].astype(h.dtype)
        if self.use_prenet:
            h = ConvLayerNormBlock(
                hidden_channels=self.hidden_channels,
                out_channels=self.hidden_channels,
                kernel_size=5,
                num_layers=3,
                dropout_p=0.5,
                name="prenet",
            )(h, x_mask, train=train)
        h = RelativePositionTransformer(
            hidden_channels=self.hidden_channels,
            out_channels=self.hidden_channels,
            hidden_channels_ffn=self.encoder_params.get("hidden_channels_ffn", 768),
            num_heads=self.encoder_params.get("num_heads", 2),
            num_layers=self.encoder_params.get("num_layers", 6),
            kernel_size=self.encoder_params.get("kernel_size", 3),
            dropout_p=self.encoder_params.get("dropout_p", 0.1),
            rel_attn_window_size=self.encoder_params.get("rel_attn_window_size", 4),
            name="encoder",
        )(h, x_mask, train=train)

        # duration predictor sees detached features (+ broadcast speaker vec)
        h_dp = jax.lax.stop_gradient(h)
        if g is not None:
            g_exp = jnp.broadcast_to(g[:, None, :], (h.shape[0], h.shape[1], g.shape[-1]))
            h_dp = jnp.concatenate([h_dp, g_exp], axis=-1)
        o_mean = nn.Dense(self.out_channels, name="proj_m")(h) * x_mask
        if self.mean_only:
            o_log_scale = jnp.zeros_like(o_mean)
        else:
            o_log_scale = nn.Dense(self.out_channels, name="proj_s")(h) * x_mask
        o_dur_log = DurationPredictor(
            hidden_channels=self.hidden_channels_dp,
            kernel_size=3,
            dropout_p=self.dropout_p_dp,
            name="duration_predictor",
        )(h_dp, x_mask, train=train)
        return o_mean, o_log_scale, o_dur_log, x_mask


class GlowTTSModule(nn.Module):
    """Pure flax GlowTTS (encoder + flow decoder)."""

    num_chars: int
    out_channels: int = 80
    hidden_channels_enc: int = 192
    hidden_channels_dec: int = 192
    hidden_channels_dp: int = 256
    encoder_params: Optional[dict] = None
    use_encoder_prenet: bool = True
    dropout_p_dp: float = 0.1
    dropout_p_dec: float = 0.05
    mean_only: bool = True
    kernel_size_dec: int = 5
    dilation_rate: int = 1
    num_flow_blocks_dec: int = 12
    num_block_layers: int = 4
    num_splits: int = 4
    num_squeeze: int = 2
    sigmoid_scale: bool = False
    c_in_channels: int = 0
    num_speakers: int = 0
    use_speaker_embedding: bool = False
    length_scale: float = 1.0
    inference_noise_scale: float = 0.0

    def setup(self):
        self.encoder = GlowTTSEncoder(
            num_chars=self.num_chars,
            out_channels=self.out_channels,
            hidden_channels=self.hidden_channels_enc,
            hidden_channels_dp=self.hidden_channels_dp,
            encoder_params=self.encoder_params or {},
            dropout_p_dp=self.dropout_p_dp,
            mean_only=self.mean_only,
            use_prenet=self.use_encoder_prenet,
            c_in_channels=self.c_in_channels,
            name="enc",
        )
        self.decoder = GlowDecoder(
            in_channels=self.out_channels,
            hidden_channels=self.hidden_channels_dec,
            kernel_size=self.kernel_size_dec,
            dilation_rate=self.dilation_rate,
            num_flow_blocks=self.num_flow_blocks_dec,
            num_coupling_layers=self.num_block_layers,
            dropout_p=self.dropout_p_dec,
            num_splits=self.num_splits,
            num_squeeze=self.num_squeeze,
            sigmoid_scale=self.sigmoid_scale,
            c_in_channels=self.c_in_channels,
            name="dec",
        )
        if self.use_speaker_embedding and self.num_speakers > 1:
            self.emb_g = nn.Embed(
                self.num_speakers,
                self.hidden_channels_enc,
                embedding_init=nn.initializers.uniform(0.2),
                name="emb_g",
            )

    def _speaker_vec(self, aux_input: Optional[Dict]) -> Optional[jnp.ndarray]:
        """L2-normalized conditioning vector from ids or d-vectors
        (reference ``glow_tts.py:179-190``)."""
        if aux_input is None:
            return None
        d_vectors = aux_input.get("d_vectors")
        speaker_ids = aux_input.get("speaker_ids")
        if speaker_ids is not None and self.use_speaker_embedding:
            g = self.emb_g(speaker_ids)
        elif d_vectors is not None:
            g = d_vectors
        else:
            return None
        return g / jnp.maximum(jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-12)

    @staticmethod
    def compute_outputs(attn, o_mean, o_log_scale, x_mask):
        """Expand token-level stats to frames through the alignment
        (reference ``glow_tts.py:138``)."""
        y_mean = jnp.einsum("bxy,bxd->byd", attn, o_mean)
        y_log_scale = jnp.einsum("bxy,bxd->byd", attn, o_log_scale)
        o_attn_dur = jnp.log1p(jnp.sum(attn, axis=-1))[:, :, None] * x_mask
        return y_mean, y_log_scale, o_attn_dur

    def _mas_logp(self, z, o_mean, o_log_scale):
        """Alignment log-likelihoods ``[B, T_en, T_de]`` (reference
        ``glow_tts.py:237-243``); two batched matmuls on the MXU."""
        o_scale = jnp.exp(-2.0 * o_log_scale)
        logp1 = jnp.sum(-0.5 * math.log(2 * math.pi) - o_log_scale, axis=-1)[:, :, None]
        logp2 = jnp.einsum("bxd,byd->bxy", o_scale, -0.5 * z**2)
        logp3 = jnp.einsum("bxd,byd->bxy", o_mean * o_scale, z)
        logp4 = jnp.sum(-0.5 * (o_mean**2) * o_scale, axis=-1)[:, :, None]
        return logp1 + logp2 + logp3 + logp4

    def __call__(self, x, x_lengths, y, y_lengths, aux_input=None, train: bool = False):
        """Training forward (reference ``glow_tts.py:192``).

        x ``[B, T_en]``, y ``[B, T_de, C_mel]`` → dict of flow stats.
        """
        g = self._speaker_vec(aux_input)
        o_mean, o_log_scale, o_dur_log, x_mask = self.encoder(x, x_lengths, g=g, train=train)
        # crop mel frames to a multiple of num_squeeze
        y_max = (y.shape[1] // self.num_squeeze) * self.num_squeeze
        y = y[:, :y_max]
        y_lengths = (y_lengths // self.num_squeeze) * self.num_squeeze
        y_mask = sequence_mask(y_lengths, y_max)[:, :, None].astype(x_mask.dtype)

        z, logdet, y_mask = self.decoder(y * y_mask, y_mask, g=g, reverse=False, train=train)
        attn_mask = x_mask * jnp.swapaxes(y_mask, 1, 2)  # [B, T_en, T_de]
        logp = jax.lax.stop_gradient(self._mas_logp(z, o_mean, o_log_scale))
        attn = maximum_path(logp, attn_mask)
        y_mean, y_log_scale, o_attn_dur = self.compute_outputs(attn, o_mean, o_log_scale, x_mask)
        return {
            "z": z,
            "logdet": logdet,
            "y_mean": y_mean,
            "y_log_scale": y_log_scale,
            "alignments": jnp.swapaxes(attn, 1, 2),
            "durations_log": o_dur_log,
            "total_durations_log": o_attn_dur,
            "y_lengths": y_lengths,
            "y_mask": y_mask,
            "x_mask": x_mask,
        }

    def inference(
        self,
        x,
        x_lengths,
        aux_input=None,
        max_frames: int = 1000,
        noise_rng: Optional[jax.Array] = None,
    ):
        """Duration-driven synthesis (reference ``glow_tts.py:341``).

        ``max_frames`` is the static frame budget (multiple of
        ``num_squeeze``); real lengths are returned in ``y_lengths``.
        """
        g = self._speaker_vec(aux_input)
        o_mean, o_log_scale, o_dur_log, x_mask = self.encoder(x, x_lengths, g=g, train=False)
        w = (jnp.exp(o_dur_log) - 1.0) * x_mask * self.length_scale
        w_ceil = jnp.maximum(jnp.ceil(w), 1.0) * x_mask
        y_lengths = jnp.maximum(jnp.sum(w_ceil, axis=(1, 2)), 1.0).astype(jnp.int32)
        y_lengths = jnp.minimum(
            (y_lengths // self.num_squeeze) * self.num_squeeze, max_frames
        )
        y_mask = sequence_mask(y_lengths, max_frames)[:, :, None].astype(x_mask.dtype)
        attn_mask = x_mask * jnp.swapaxes(y_mask, 1, 2)
        attn = generate_path(w_ceil[:, :, 0], attn_mask)
        y_mean, y_log_scale, o_attn_dur = self.compute_outputs(attn, o_mean, o_log_scale, x_mask)
        if noise_rng is not None and self.inference_noise_scale > 0:
            noise = jax.random.normal(noise_rng, y_mean.shape) * self.inference_noise_scale
            z = (y_mean + jnp.exp(y_log_scale) * noise) * y_mask
        else:
            z = y_mean * y_mask
        y, _, y_mask_out = self.decoder(z, y_mask, g=g, reverse=True, train=False)
        return {
            "model_outputs": y,
            "alignments": jnp.swapaxes(attn, 1, 2),
            "y_mean": y_mean,
            "y_log_scale": y_log_scale,
            "durations_log": o_dur_log,
            "total_durations_log": o_attn_dur,
            "y_lengths": y_lengths,
            "y_mask": y_mask_out,
        }


def glow_tts_loss(outputs: Dict[str, jnp.ndarray], x_lengths, y_lengths) -> Dict[str, jnp.ndarray]:
    """GlowTTS NLL + duration MSE (reference ``losses.py:508``)."""
    z = outputs["z"]
    means = outputs["y_mean"]
    scales = outputs["y_log_scale"]
    logdet = outputs["logdet"]
    o_dur_log = outputs["durations_log"]
    o_attn_dur = outputs["total_durations_log"]
    constant_factor = 0.5 * math.log(2 * math.pi)
    pz = jnp.sum(scales) + 0.5 * jnp.sum(jnp.exp(-2 * scales) * (z - means) ** 2)
    log_mle = constant_factor + (pz - jnp.sum(logdet)) / (
        jnp.sum(y_lengths) * z.shape[2]
    )
    loss_dur = jnp.sum((o_dur_log - o_attn_dur) ** 2) / jnp.sum(x_lengths)
    return {"loss": log_mle + loss_dur, "log_mle": log_mle, "loss_dur": loss_dur}


class GlowTTS:
    """Host wrapper: config → module + params, jitted entry points.

    Mirrors the reference trainer-model surface (``init_from_config``,
    ``forward``, ``inference``, ``train_step``) without torch.
    """

    def __init__(self, config: GlowTTSConfig):
        self.config = config
        num_chars = config.num_chars
        if num_chars is None and config.characters is not None:
            from tts_tpu.text import TTSTokenizer

            tokenizer, config = TTSTokenizer.init_from_config(config)
            self.tokenizer = tokenizer
            num_chars = tokenizer.characters.num_chars
            self.config = config
        self.num_chars = num_chars
        self.module = GlowTTSModule(
            num_chars=num_chars,
            out_channels=config.out_channels,
            hidden_channels_enc=config.hidden_channels_enc,
            hidden_channels_dec=config.hidden_channels_dec,
            hidden_channels_dp=config.hidden_channels_dp,
            encoder_params=config.encoder_params,
            use_encoder_prenet=config.use_encoder_prenet,
            dropout_p_dp=config.dropout_p_dp,
            dropout_p_dec=config.dropout_p_dec,
            mean_only=config.mean_only,
            kernel_size_dec=config.kernel_size_dec,
            dilation_rate=config.dilation_rate,
            num_flow_blocks_dec=config.num_flow_blocks_dec,
            num_block_layers=config.num_block_layers,
            num_splits=config.num_splits,
            num_squeeze=config.num_squeeze,
            sigmoid_scale=config.sigmoid_scale,
            c_in_channels=config.c_in_channels,
            num_speakers=config.num_speakers,
            use_speaker_embedding=config.use_speaker_embedding,
            length_scale=config.length_scale,
            inference_noise_scale=config.inference_noise_scale,
        )

    @classmethod
    def init_from_config(cls, config: GlowTTSConfig, samples=None) -> "GlowTTS":
        from tts_tpu.models.base import init_tokenizer

        tokenizer, config = init_tokenizer(config)
        model = cls(config)
        model.tokenizer = tokenizer
        return model

    def init_params(self, rng: jax.Array, t_en: int = 33, t_de: int = 64):
        x = jnp.zeros((1, t_en), jnp.int32)
        x_lengths = jnp.full((1,), t_en, jnp.int32)
        y = jnp.zeros((1, t_de, self.config.out_channels), jnp.float32)
        y_lengths = jnp.full((1,), t_de, jnp.int32)
        return self.module.init(rng, x, x_lengths, y, y_lengths)

    def forward(self, params, batch: Dict[str, Any], train: bool = False, rngs=None):
        return self.module.apply(
            params,
            batch["text_input"],
            batch["text_lengths"],
            batch["mel_input"],
            batch["mel_lengths"],
            aux_input={
                "d_vectors": batch.get("d_vectors"),
                "speaker_ids": batch.get("speaker_ids"),
            },
            train=train,
            rngs=rngs,
        )

    def inference(self, params, x, x_lengths, aux_input=None, max_frames: int = 1000):
        return self.module.apply(
            params,
            x,
            x_lengths,
            aux_input=aux_input,
            max_frames=max_frames,
            method=self.module.inference,
        )

    def train_step(self, params, batch, rngs=None, train: bool = True):
        outputs = self.forward(params, batch, train=train, rngs=rngs)
        losses = glow_tts_loss(outputs, batch["text_lengths"], outputs["y_lengths"])
        return losses["loss"], {**losses, "outputs": outputs}
