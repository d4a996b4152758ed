"""ForwardTTS — unified non-autoregressive family: FastPitch, FastSpeech,
FastSpeech2, SpeedySpeech (reference ``TTS/tts/models/forward_tts.py:172``).

encoder → (aligner|external durations) → pitch/energy adaptors → length
regulator (duration expansion as one einsum over the generated path) →
decoder.  Everything is static-shape; inference takes a frame budget.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from tts_tpu.layers.aligner import AlignmentNetwork
from tts_tpu.layers.common import Conv1d, DurationPredictor
from tts_tpu.layers.feed_forward import (
    FFTransformerBlock,
    PositionalEncoding,
    ResidualConv1dBNBlock,
)
from tts_tpu.layers import losses as L
from tts_tpu.ops import (
    average_over_durations,
    generate_path,
    maximum_path,
    sequence_mask,
)

from .config import ForwardTTSArgs, ForwardTTSConfig


def _make_block(kind: str, channels: int, params: dict, name: str):
    if kind == "fftransformer":
        return FFTransformerBlock(
            in_out_channels=channels,
            num_heads=params.get("num_heads", 1),
            hidden_channels_ffn=params.get("hidden_channels_ffn", 1024),
            num_layers=params.get("num_layers", 6),
            dropout_p=params.get("dropout_p", 0.1),
            name=name,
        )
    if kind == "residual_conv_bn":
        return ResidualConv1dBNBlock(
            hidden_channels=channels,
            out_channels=channels,
            kernel_size=params.get("kernel_size", 4),
            dilations=tuple(params.get("dilations", [1, 2, 4] * 4 + [1])),
            num_conv_blocks=params.get("num_conv_blocks", 2),
            name=name,
        )
    raise ValueError(f"Unknown encoder/decoder type {kind!r}")


class ForwardTTSModule(nn.Module):
    args: ForwardTTSArgs

    def setup(self):
        a = self.args
        self.emb = nn.Embed(a.num_chars, a.hidden_channels, name="emb")
        self.encoder = _make_block(a.encoder_type, a.hidden_channels, a.encoder_params, "encoder")
        self.decoder = _make_block(a.decoder_type, a.hidden_channels, a.decoder_params, "decoder")
        if a.positional_encoding:
            self.pos_encoder = PositionalEncoding(
                a.hidden_channels, use_scale=a.positional_encoding_use_scale, name="pos_encoder"
            )
        self.duration_predictor = DurationPredictor(
            hidden_channels=a.duration_predictor_hidden_channels,
            kernel_size=a.duration_predictor_kernel_size,
            dropout_p=a.duration_predictor_dropout_p,
            name="duration_predictor",
        )
        if a.use_pitch:
            self.pitch_predictor = DurationPredictor(
                hidden_channels=a.pitch_predictor_hidden_channels,
                kernel_size=a.pitch_predictor_kernel_size,
                dropout_p=a.pitch_predictor_dropout_p,
                name="pitch_predictor",
            )
            self.pitch_emb = Conv1d(
                a.hidden_channels, a.pitch_embedding_kernel_size, name="pitch_emb"
            )
        if a.use_energy:
            self.energy_predictor = DurationPredictor(
                hidden_channels=a.energy_predictor_hidden_channels,
                kernel_size=a.energy_predictor_kernel_size,
                dropout_p=a.energy_predictor_dropout_p,
                name="energy_predictor",
            )
            self.energy_emb = Conv1d(
                a.hidden_channels, a.energy_embedding_kernel_size, name="energy_emb"
            )
        if a.use_aligner:
            self.aligner = AlignmentNetwork(
                in_query_channels=a.out_channels,
                in_key_channels=a.hidden_channels,
                name="aligner",
            )
        self.proj = nn.Dense(a.out_channels, name="proj")
        if a.use_speaker_embedding and a.num_speakers > 1:
            self.emb_g = nn.Embed(
                a.num_speakers,
                a.hidden_channels,
                embedding_init=nn.initializers.uniform(0.2),
                name="emb_g",
            )

    # ------------------------------------------------------------------
    def _speaker_vec(self, aux_input):
        a = self.args
        if not aux_input:
            return None
        if aux_input.get("speaker_ids") is not None and a.use_speaker_embedding:
            return self.emb_g(aux_input["speaker_ids"])
        if aux_input.get("d_vectors") is not None:
            return aux_input["d_vectors"]
        return None

    def _encode(self, x, x_mask, g=None, train: bool = False):
        x_emb = self.emb(x)  # [B, T_en, H]
        h = self.encoder(x_emb * x_mask, x_mask, train=train)
        if g is not None:
            h = h + g[:, None, :]
        return h, x_emb

    def _expand(self, en, dr, x_mask, y_mask):
        """Length-regulate encoder states by durations (reference
        ``expand_encoder_outputs`` :328)."""
        attn_mask = x_mask * jnp.swapaxes(y_mask, 1, 2)  # [B, T_en, T_de]
        attn = generate_path(dr, attn_mask)
        o_en_ex = jnp.einsum("bxy,bxc->byc", attn, en)
        return o_en_ex, attn

    def _decode(self, o_en_ex, y_mask, g=None, train: bool = False):
        if self.args.positional_encoding:
            o_en_ex = self.pos_encoder(o_en_ex, y_mask)
        o_de = self.decoder(o_en_ex, y_mask, train=train)
        return self.proj(o_de) * y_mask

    def _forward_aligner(self, x_emb, y, x_mask, y_mask, attn_prior=None):
        """MAS over the Gaussian aligner's logits (reference :525)."""
        attn_mask = x_mask * jnp.swapaxes(y_mask, 1, 2)  # [B, T_en, T_de]
        attn_soft_q, attn_logp_q = self.aligner(
            y, x_emb, mask=y_mask[..., 0], attn_prior=attn_prior
        )  # both [B, T_de, T_en]
        logp = jnp.swapaxes(attn_logp_q, 1, 2)  # [B, T_en, T_de]
        logp = jnp.where(attn_mask > 0, logp, -1e9)
        attn_mas = maximum_path(jax.lax.stop_gradient(logp), attn_mask)
        o_alignment_dur = jnp.sum(attn_mas, axis=-1)  # [B, T_en]
        return o_alignment_dur, jnp.swapaxes(attn_soft_q, 1, 2), attn_logp_q, attn_mas

    # ------------------------------------------------------------------
    def __call__(
        self,
        x,
        x_lengths,
        y_lengths,
        y=None,
        dr=None,
        pitch=None,
        energy=None,
        attn_priors=None,
        aux_input: Optional[Dict] = None,
        train: bool = False,
    ) -> Dict[str, Any]:
        a = self.args
        g = self._speaker_vec(aux_input)
        x_mask = sequence_mask(x_lengths, x.shape[1])[:, :, None].astype(jnp.float32)
        T_de = y.shape[1] if y is not None else int(jnp.max(y_lengths))
        y_mask = sequence_mask(y_lengths, T_de)[:, :, None].astype(jnp.float32)

        o_en, x_emb = self._encode(x, x_mask, g, train=train)

        dp_input = jax.lax.stop_gradient(o_en) if a.detach_duration_predictor else o_en
        o_dr_log = self.duration_predictor(dp_input, x_mask, train=train)[..., 0]  # [B, T_en]
        o_dr = jnp.clip(jnp.exp(o_dr_log) - 1, 0, a.max_duration)

        o_alignment_dur = alignment_soft = alignment_logprob = alignment_mas = None
        if a.use_aligner and y is not None:
            o_alignment_dur, alignment_soft, alignment_logprob, alignment_mas = (
                self._forward_aligner(x_emb, y, x_mask, y_mask, attn_priors)
            )
            dr = o_alignment_dur

        o_pitch = avg_pitch = None
        if a.use_pitch:
            o_pitch = self.pitch_predictor(o_en, x_mask, train=train)  # [B, T_en, 1]
            avg_pitch = average_over_durations(pitch, dr.astype(jnp.int32))
            o_en = o_en + self.pitch_emb(avg_pitch)
        o_energy = avg_energy = None
        if a.use_energy:
            o_energy = self.energy_predictor(o_en, x_mask, train=train)
            avg_energy = average_over_durations(energy, dr.astype(jnp.int32))
            o_en = o_en + self.energy_emb(avg_energy)

        o_en_ex, attn = self._expand(o_en, dr, x_mask, y_mask)
        o_de = self._decode(o_en_ex, y_mask, g, train=train)
        return {
            "model_outputs": o_de,
            "durations_log": o_dr_log,
            "durations": o_dr,
            "pitch_avg": o_pitch,
            "pitch_avg_gt": avg_pitch,
            "energy_avg": o_energy,
            "energy_avg_gt": avg_energy,
            "alignments": jnp.swapaxes(attn, 1, 2),
            "alignment_soft": alignment_soft,
            "alignment_mas": alignment_mas,
            "o_alignment_dur": o_alignment_dur,
            "alignment_logprob": alignment_logprob,
            "x_mask": x_mask,
            "y_mask": y_mask,
        }

    def inference(self, x, x_lengths, aux_input=None, max_frames: int = 1000):
        a = self.args
        g = self._speaker_vec(aux_input)
        x_mask = sequence_mask(x_lengths, x.shape[1])[:, :, None].astype(jnp.float32)
        o_en, _ = self._encode(x, x_mask, g, train=False)
        o_dr_log = self.duration_predictor(o_en, x_mask, train=False)[..., 0]
        # format_durations (reference :353): round, min 1 for valid tokens
        o_dr = (jnp.exp(o_dr_log) - 1) * x_mask[..., 0] * a.length_scale
        o_dr = jnp.maximum(jnp.round(o_dr), 1.0) * x_mask[..., 0]
        y_lengths = jnp.clip(jnp.sum(o_dr, axis=1), 1, max_frames).astype(jnp.int32)
        y_mask = sequence_mask(y_lengths, max_frames)[:, :, None].astype(jnp.float32)

        if a.use_pitch:
            o_pitch = self.pitch_predictor(o_en, x_mask, train=False)
            o_en = o_en + self.pitch_emb(o_pitch)
        if a.use_energy:
            o_energy = self.energy_predictor(o_en, x_mask, train=False)
            o_en = o_en + self.energy_emb(o_energy)

        o_en_ex, attn = self._expand(o_en, o_dr, x_mask, y_mask)
        o_de = self._decode(o_en_ex, y_mask, g, train=False)
        return {
            "model_outputs": o_de,
            "alignments": jnp.swapaxes(attn, 1, 2),
            "durations": o_dr,
            "y_lengths": y_lengths,
            "y_mask": y_mask,
        }


def forward_tts_loss(config: ForwardTTSConfig, outputs, batch, binary_loss_weight: float = 1.0):
    """Composite loss (reference ``losses.py:779`` ForwardTTSLoss)."""
    a = config.model_args
    loss = 0.0
    out: Dict[str, jnp.ndarray] = {}
    mel, mel_lens = batch["mel_input"], batch["mel_lengths"]
    text_lens = batch["text_lengths"]

    if config.use_ssim_loss and config.ssim_loss_alpha > 0:
        l_ssim = L.ssim_loss(outputs["model_outputs"], mel, mel_lens)
        loss += config.ssim_loss_alpha * l_ssim
        out["loss_ssim"] = l_ssim
    if config.spec_loss_alpha > 0:
        spec_fn = L.mse_loss_masked if config.spec_loss_type == "mse" else L.l1_loss_masked
        l_spec = spec_fn(outputs["model_outputs"], mel, mel_lens)
        loss += config.spec_loss_alpha * l_spec
        out["loss_spec"] = l_spec
    if config.dur_loss_alpha > 0:
        dur_target = outputs["o_alignment_dur"] if a.use_aligner else batch["durations"]
        log_dur_tgt = jnp.log1p(dur_target.astype(jnp.float32))
        if config.duration_loss_type == "huber":
            l_dur = L.huber_loss(
                outputs["durations_log"][:, :, None], log_dur_tgt[:, :, None], text_lens
            )
        else:
            l_dur = L.mse_loss_masked(
                outputs["durations_log"][:, :, None], log_dur_tgt[:, :, None], text_lens
            )
        loss += config.dur_loss_alpha * l_dur
        out["loss_dur"] = l_dur
    if a.use_pitch and config.pitch_loss_alpha > 0:
        l_pitch = L.mse_loss_masked(outputs["pitch_avg"], outputs["pitch_avg_gt"], text_lens)
        loss += config.pitch_loss_alpha * l_pitch
        out["loss_pitch"] = l_pitch
    if a.use_energy and config.energy_loss_alpha > 0:
        l_energy = L.mse_loss_masked(outputs["energy_avg"], outputs["energy_avg_gt"], text_lens)
        loss += config.energy_loss_alpha * l_energy
        out["loss_energy"] = l_energy
    if a.use_aligner and config.aligner_loss_alpha > 0:
        l_align = L.forward_sum_loss(outputs["alignment_logprob"], text_lens, mel_lens)
        loss += config.aligner_loss_alpha * l_align
        out["loss_aligner"] = l_align
    if config.binary_align_loss_alpha > 0 and outputs["alignment_soft"] is not None:
        l_bin = L.binary_alignment_loss(outputs["alignment_mas"], outputs["alignment_soft"])
        loss += config.binary_align_loss_alpha * l_bin * binary_loss_weight
        out["loss_binary_alignment"] = l_bin
    out["loss"] = loss
    return out


class ForwardTTS:
    """Host wrapper (init_from_config / forward / inference / train_step)."""

    def __init__(self, config: ForwardTTSConfig):
        self.config = config
        self.args = config.model_args
        self.module = ForwardTTSModule(args=self.args)

    @classmethod
    def init_from_config(cls, config: ForwardTTSConfig, samples=None):
        from tts_tpu.models.base import init_tokenizer

        tokenizer, config = init_tokenizer(config)
        model = cls(config)
        model.tokenizer = tokenizer
        return model

    def init_params(self, rng, t_en: int = 17, t_de: int = 48):
        a = self.args
        x = jnp.zeros((1, t_en), jnp.int32)
        xl = jnp.full((1,), t_en, jnp.int32)
        y = jnp.zeros((1, t_de, a.out_channels), jnp.float32)
        yl = jnp.full((1,), t_de, jnp.int32)
        pitch = jnp.zeros((1, t_de, 1), jnp.float32) if a.use_pitch else None
        energy = jnp.zeros((1, t_de, 1), jnp.float32) if a.use_energy else None
        return self.module.init(rng, x, xl, yl, y=y, pitch=pitch, energy=energy)

    def forward(self, params, batch, train: bool = False, rngs=None):
        return self.module.apply(
            params,
            batch["text_input"],
            batch["text_lengths"],
            batch["mel_lengths"],
            y=batch["mel_input"],
            dr=batch.get("durations"),
            pitch=batch.get("pitch"),
            energy=batch.get("energy"),
            attn_priors=batch.get("attn_priors"),
            aux_input={
                "d_vectors": batch.get("d_vectors"),
                "speaker_ids": batch.get("speaker_ids"),
            },
            train=train,
            rngs=rngs,
        )

    def inference(self, params, x, x_lengths, aux_input=None, max_frames: int = 1000):
        return self.module.apply(
            params, x, x_lengths, aux_input=aux_input, max_frames=max_frames,
            method=self.module.inference,
        )

    def train_step(self, params, batch, rngs=None, train: bool = True):
        outputs = self.forward(params, batch, train=train, rngs=rngs)
        losses = forward_tts_loss(self.config, outputs, batch)
        return losses["loss"], {**losses, "outputs": outputs}
