"""DelightfulTTS — prosody-rich E2E TTS with joint HiFiGAN vocoder
(reference ``TTS/tts/models/delightful_tts.py`` +
``layers/delightful_tts/*``).

Acoustic model: token embedding → conformer encoder → utterance- and
phoneme-level prosody encoders (reference-encoder bottlenecks, predicted
at inference) → pitch/energy adaptors → duration expansion → conformer
decoder → mel.  The waveform head is the shared HiFiGAN generator trained
jointly with the fused GAN step over random mel segments.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from tts_tpu.layers.aligner import AlignmentNetwork
from tts_tpu.layers.common import Conv1d, DurationPredictor
from tts_tpu.layers.conformer import Conformer
from tts_tpu.layers import losses as L
from tts_tpu.layers.tacotron_v1 import ReferenceEncoder
from tts_tpu.ops import (
    average_over_durations,
    generate_path,
    maximum_path,
    rand_segments,
    segment,
    sequence_mask,
)
from tts_tpu.vocoder.models.hifigan_generator import HifiganGenerator

from .config import DelightfulTtsArgs, DelightfulTTSConfig


class UtteranceProsodyEncoder(nn.Module):
    """Mel → bottleneck utterance prosody vector (reference ``encoders.py:126``)."""

    bottleneck_size: int

    @nn.compact
    def __call__(self, mel):
        h = ReferenceEncoder(embedding_dim=128, name="ref_enc")(mel)
        return nn.Dense(self.bottleneck_size, name="bottleneck")(h)  # [B, U]


class PhonemeProsodyEncoder(nn.Module):
    """Per-token prosody bottleneck from aligned mel stats
    (reference ``encoders.py:198``, simplified to duration-pooled stats)."""

    bottleneck_size: int

    @nn.compact
    def __call__(self, mel, durations):
        # average frame features per token, then bottleneck
        pooled = average_over_durations(mel, durations.astype(jnp.int32))  # [B, T_en, M]
        h = nn.relu(nn.Dense(128, name="proj")(pooled))
        return nn.Dense(self.bottleneck_size, name="bottleneck")(h)  # [B, T_en, P]


class DelightfulTtsModule(nn.Module):
    args: DelightfulTtsArgs
    num_mels: int = 100

    def setup(self):
        a = self.args
        dim = a.n_hidden_conformer_encoder
        self.emb = nn.Embed(a.num_chars, dim, name="emb")
        self.encoder = Conformer(
            dim=dim, num_layers=a.n_layers_conformer_encoder,
            num_heads=a.n_heads_conformer_encoder, name="encoder",
        )
        self.decoder = Conformer(
            dim=a.n_hidden_conformer_decoder, num_layers=a.n_layers_conformer_decoder,
            num_heads=a.n_heads_conformer_decoder, name="decoder",
        )
        self.aligner = AlignmentNetwork(
            in_query_channels=self.num_mels, in_key_channels=dim, name="aligner"
        )
        self.duration_predictor = DurationPredictor(
            hidden_channels=a.duration_predictor_hidden, kernel_size=3, dropout_p=0.1,
            name="duration_predictor",
        )
        self.pitch_predictor = DurationPredictor(
            hidden_channels=a.pitch_predictor_hidden, kernel_size=3, dropout_p=0.1,
            name="pitch_predictor",
        )
        self.energy_predictor = DurationPredictor(
            hidden_channels=a.energy_predictor_hidden, kernel_size=3, dropout_p=0.1,
            name="energy_predictor",
        )
        self.pitch_emb = Conv1d(dim, 3, name="pitch_emb")
        self.energy_emb = Conv1d(dim, 3, name="energy_emb")
        self.u_prosody_encoder = UtteranceProsodyEncoder(
            a.bottleneck_size_u_reference_encoder, name="u_prosody_encoder"
        )
        self.p_prosody_encoder = PhonemeProsodyEncoder(
            a.bottleneck_size_p_reference_encoder, name="p_prosody_encoder"
        )
        self.u_prosody_predictor = nn.Dense(
            a.bottleneck_size_u_reference_encoder, name="u_prosody_predictor"
        )
        self.p_prosody_predictor = nn.Dense(
            a.bottleneck_size_p_reference_encoder, name="p_prosody_predictor"
        )
        self.u_bottleneck_proj = nn.Dense(dim, name="u_bottleneck_proj")
        self.p_bottleneck_proj = nn.Dense(dim, name="p_bottleneck_proj")
        self.to_mel = nn.Dense(self.num_mels, name="to_mel")
        if a.use_speaker_embedding and a.num_speakers > 0:
            self.emb_g = nn.Embed(a.num_speakers, a.speaker_embedding_channels, name="emb_g")

    def _speaker(self, aux_input):
        if not aux_input:
            return None
        if aux_input.get("speaker_ids") is not None and self.args.use_speaker_embedding:
            return self.emb_g(aux_input["speaker_ids"])
        return aux_input.get("d_vectors")

    def __call__(self, x, x_lengths, mel, mel_lengths, pitch=None, energy=None,
                 attn_priors=None, aux_input=None, train: bool = False) -> Dict[str, Any]:
        a = self.args
        g = self._speaker(aux_input)
        x_mask = sequence_mask(x_lengths, x.shape[1])[:, :, None].astype(jnp.float32)
        y_mask = sequence_mask(mel_lengths, mel.shape[1])[:, :, None].astype(jnp.float32)

        h = self.emb(x)
        h = self.encoder(h * x_mask, x_mask, speaker_embedding=g, train=train)

        # alignment (Gaussian aligner + MAS)
        attn_soft, attn_logp = self.aligner(mel, h, mask=y_mask[..., 0], attn_prior=attn_priors)
        logp = jnp.swapaxes(attn_logp, 1, 2)
        attn_mask = x_mask * jnp.swapaxes(y_mask, 1, 2)
        logp = jnp.where(attn_mask > 0, logp, -1e9)
        attn_mas = maximum_path(jax.lax.stop_gradient(logp), attn_mask)
        durations = jnp.sum(attn_mas, -1)  # [B, T_en]

        # ground-truth prosody (training) + predicted prosody (both returned)
        u_target = self.u_prosody_encoder(mel)
        p_target = self.p_prosody_encoder(mel, durations)
        u_pred = self.u_prosody_predictor(jnp.mean(h * x_mask, axis=1))
        p_pred = self.p_prosody_predictor(h)
        h = h + self.u_bottleneck_proj(u_target)[:, None]
        h = h + self.p_bottleneck_proj(p_target)

        # pitch/energy adaptors (token-level targets from frame features)
        o_pitch = self.pitch_predictor(h, x_mask, train=train)
        o_energy = self.energy_predictor(h, x_mask, train=train)
        avg_pitch = average_over_durations(pitch, durations.astype(jnp.int32)) if pitch is not None else None
        avg_energy = average_over_durations(energy, durations.astype(jnp.int32)) if energy is not None else None
        if avg_pitch is not None:
            h = h + self.pitch_emb(avg_pitch)
        if avg_energy is not None:
            h = h + self.energy_emb(avg_energy)

        o_dr_log = self.duration_predictor(
            jax.lax.stop_gradient(h), x_mask, train=train
        )[..., 0]

        # expand and decode
        attn = generate_path(durations, attn_mask)
        o_en_ex = jnp.einsum("bxy,bxc->byc", attn, h)
        o_de = self.decoder(o_en_ex, y_mask, speaker_embedding=g, train=train)
        mel_pred = self.to_mel(o_de) * y_mask

        return {
            "model_outputs": mel_pred,
            "durations_log": o_dr_log,
            "durations": durations,
            "pitch_avg": o_pitch,
            "pitch_avg_gt": avg_pitch,
            "energy_avg": o_energy,
            "energy_avg_gt": avg_energy,
            "u_prosody_pred": u_pred,
            "u_prosody_ref": u_target,
            "p_prosody_pred": p_pred,
            "p_prosody_ref": p_target,
            "alignment_logprob": attn_logp,
            "alignment_mas": attn_mas,
            "alignment_soft": jnp.swapaxes(attn_soft, 1, 2),
            "x_mask": x_mask,
            "y_mask": y_mask,
        }

    def inference(self, x, x_lengths, aux_input=None, max_frames: int = 1000,
                  d_control: float = 1.0):
        a = self.args
        g = self._speaker(aux_input)
        x_mask = sequence_mask(x_lengths, x.shape[1])[:, :, None].astype(jnp.float32)
        h = self.emb(x)
        h = self.encoder(h * x_mask, x_mask, speaker_embedding=g, train=False)
        # predicted prosody at inference (reference use_ground_truth=False)
        u_pred = self.u_prosody_predictor(jnp.mean(h * x_mask, axis=1))
        p_pred = self.p_prosody_predictor(h)
        h = h + self.u_bottleneck_proj(u_pred)[:, None]
        h = h + self.p_bottleneck_proj(p_pred)
        o_pitch = self.pitch_predictor(h, x_mask, train=False)
        o_energy = self.energy_predictor(h, x_mask, train=False)
        h = h + self.pitch_emb(o_pitch)
        h = h + self.energy_emb(o_energy)
        o_dr_log = self.duration_predictor(h, x_mask, train=False)[..., 0]
        durations = jnp.maximum(jnp.round((jnp.exp(o_dr_log) - 1) * d_control), 1.0) * x_mask[..., 0]
        y_lengths = jnp.clip(jnp.sum(durations, 1), 1, max_frames).astype(jnp.int32)
        y_mask = sequence_mask(y_lengths, max_frames)[:, :, None].astype(jnp.float32)
        attn_mask = x_mask * jnp.swapaxes(y_mask, 1, 2)
        attn = generate_path(durations, attn_mask)
        o_en_ex = jnp.einsum("bxy,bxc->byc", attn, h)
        o_de = self.decoder(o_en_ex, y_mask, speaker_embedding=g, train=False)
        mel = self.to_mel(o_de) * y_mask
        return {"model_outputs": mel, "y_lengths": y_lengths, "durations": durations,
                "alignments": jnp.swapaxes(attn, 1, 2)}


class DelightfulTTS:
    """Host wrapper: acoustic model + joint HiFiGAN vocoder."""

    def __init__(self, config: DelightfulTTSConfig):
        self.config = config
        self.args = config.model_args
        self.acoustic_model = DelightfulTtsModule(args=self.args, num_mels=config.audio.num_mels)
        v = config.vocoder
        self.vocoder = HifiganGenerator(
            in_channels=config.audio.num_mels,
            out_channels=1,
            resblock_type=v.resblock_type_decoder,
            resblock_dilation_sizes=tuple(map(tuple, v.resblock_dilation_sizes_decoder)),
            resblock_kernel_sizes=tuple(v.resblock_kernel_sizes_decoder),
            upsample_kernel_sizes=tuple(v.upsample_kernel_sizes_decoder),
            upsample_initial_channel=v.upsample_initial_channel_decoder,
            upsample_factors=tuple(v.upsample_rates_decoder),
        )
        from tts_tpu.models.vits.modules import VitsDiscriminator

        self.discriminator = VitsDiscriminator(periods=tuple(v.periods_discriminator))

    @classmethod
    def init_from_config(cls, config: DelightfulTTSConfig, samples=None):
        from tts_tpu.models.base import init_tokenizer

        tokenizer, config = init_tokenizer(config)
        model = cls(config)
        model.tokenizer = tokenizer
        return model

    def init_params(self, rng, t_en: int = 11, t_de: int = 40):
        M = self.config.audio.num_mels
        r1, r2, r3 = jax.random.split(rng, 3)
        acoustic = self.acoustic_model.init(
            {"params": r1, "dropout": r2},
            jnp.zeros((1, t_en), jnp.int32),
            jnp.full((1,), t_en, jnp.int32),
            jnp.zeros((1, t_de, M)),
            jnp.full((1,), t_de, jnp.int32),
            pitch=jnp.zeros((1, t_de, 1)),
            energy=jnp.zeros((1, t_de, 1)),
        )
        voc = self.vocoder.init(r3, jnp.zeros((1, 8, M)))
        return {"acoustic": acoustic, "vocoder": voc}

    def forward(self, params, batch, train: bool = False, rngs=None):
        return self.acoustic_model.apply(
            params["acoustic"],
            batch["text_input"],
            batch["text_lengths"],
            batch["mel_input"],
            batch["mel_lengths"],
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

    def train_step(self, params, batch, rngs=None, train: bool = True):
        """Acoustic losses (GAN vocoder training runs via the GAN wrapper on
        mel segments; reference trains both jointly — composed in the
        Trainer with the fused step in a follow-up)."""
        outputs = self.forward(params, batch, train=train, rngs=rngs)
        c = self.config
        mel, mel_lens, text_lens = batch["mel_input"], batch["mel_lengths"], batch["text_lengths"]
        l_mel = L.l1_loss_masked(outputs["model_outputs"], mel, mel_lens)
        l_dur = L.mse_loss_masked(
            outputs["durations_log"][:, :, None],
            jnp.log1p(outputs["durations"])[:, :, None],
            text_lens,
        )
        l_pitch = L.mse_loss_masked(outputs["pitch_avg"], outputs["pitch_avg_gt"], text_lens)
        l_energy = L.mse_loss_masked(outputs["energy_avg"], outputs["energy_avg_gt"], text_lens)
        l_u = jnp.mean((outputs["u_prosody_pred"] - jax.lax.stop_gradient(outputs["u_prosody_ref"])) ** 2)
        l_p = jnp.mean((outputs["p_prosody_pred"] - jax.lax.stop_gradient(outputs["p_prosody_ref"])) ** 2)
        l_align = L.forward_sum_loss(outputs["alignment_logprob"], text_lens, mel_lens)
        l_bin = L.binary_alignment_loss(outputs["alignment_mas"], outputs["alignment_soft"])
        loss = (
            l_mel * c.mel_loss_alpha / 45.0
            + l_dur * c.dur_loss_alpha
            + l_pitch * c.pitch_loss_alpha
            + l_energy * c.energy_loss_alpha
            + l_u * c.u_prosody_loss_alpha
            + l_p * c.p_prosody_loss_alpha
            + l_align * c.aligner_loss_alpha
            + l_bin * c.binary_align_loss_alpha
        )
        return loss, {
            "loss": loss, "loss_mel": l_mel, "loss_dur": l_dur, "loss_pitch": l_pitch,
            "loss_energy": l_energy, "loss_u_prosody": l_u, "loss_p_prosody": l_p,
            "loss_aligner": l_align, "loss_binary": l_bin, "outputs": outputs,
        }

    def make_train_step(self, config, rng):
        """Trainer hook: fused joint acoustic+vocoder GAN step
        (see ``delightful_tts/train.py``; reference sequences two optimizer
        steps, ``delightful_tts.py:919``)."""
        from .train import create_train_state, make_train_step

        state = create_train_state(self, config, rng)
        step_fn, eval_fn, optimizers = make_train_step(self, config)
        self._eval_step_fn = eval_fn
        return step_fn, optimizers, state

    def make_eval_step(self, config):
        if getattr(self, "_eval_step_fn", None) is None:
            from .train import make_train_step

            _, self._eval_step_fn, _ = make_train_step(self, config)
        return self._eval_step_fn

    def inference(self, params, x, x_lengths, aux_input=None, max_frames: int = 500):
        out = self.acoustic_model.apply(
            params["acoustic"], x, x_lengths, aux_input=aux_input, max_frames=max_frames,
            method=self.acoustic_model.inference,
        )
        wav = self.vocoder.apply(params["vocoder"], out["model_outputs"])
        out["waveform"] = wav
        return out
