"""VITS — end-to-end VAE + flow + GAN TTS (reference ``TTS/tts/models/vits.py``).

TPU-native: time-major tensors, MAS on-device, the posterior/flow/decoder
all inside a single jitted train step, random windowed segment decode via
vectorized dynamic slices, static-frame-budget inference.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tts_tpu.ops import generate_path, maximum_path, rand_segments, sequence_mask
from tts_tpu.vocoder.models.hifigan_generator import HifiganGenerator

from .config import VitsArgs, VitsConfig
from .modules import (
    PosteriorEncoder,
    ResidualCouplingBlocks,
    StochasticDurationPredictor,
    TextEncoder,
    VitsDiscriminator,
)
from tts_tpu.layers.common import DurationPredictor


class VitsModule(nn.Module):
    """Pure flax VITS generator (everything except the discriminator)."""

    args: VitsArgs
    # audio.sample_rate / args.encoder_sample_rate — the posterior/flow run at
    # the (lower) encoder rate and the latent is upsampled before the waveform
    # decoder (reference vits.py:809-812,944 upsampling_z); 1.0 = disabled
    interpolate_factor: float = 1.0

    def setup(self):
        a = self.args
        self.embedded_speaker_dim = (
            a.d_vector_dim
            if a.use_d_vector_file
            else (a.speaker_embedding_channels if a.use_speaker_embedding else 0)
        )
        if a.use_speaker_embedding and a.num_speakers > 0:
            self.emb_g = nn.Embed(a.num_speakers, a.speaker_embedding_channels, name="emb_g")
        if a.use_language_embedding and a.num_languages > 0:
            self.emb_l = nn.Embed(a.num_languages, a.embedded_language_dim, name="emb_l")
        lang_dim = a.embedded_language_dim if a.use_language_embedding else 0

        self.text_encoder = TextEncoder(
            n_vocab=a.num_chars,
            out_channels=a.hidden_channels,
            hidden_channels=a.hidden_channels,
            hidden_channels_ffn=a.hidden_channels_ffn_text_encoder,
            num_heads=a.num_heads_text_encoder,
            num_layers=a.num_layers_text_encoder,
            kernel_size=a.kernel_size_text_encoder,
            dropout_p=a.dropout_p_text_encoder,
            language_emb_dim=lang_dim,
            name="text_encoder",
        )
        self.posterior_encoder = PosteriorEncoder(
            in_channels=a.out_channels,
            out_channels=a.hidden_channels,
            hidden_channels=a.hidden_channels,
            kernel_size=a.kernel_size_posterior_encoder,
            dilation_rate=a.dilation_rate_posterior_encoder,
            num_layers=a.num_layers_posterior_encoder,
            cond_channels=self.embedded_speaker_dim,
            name="posterior_encoder",
        )
        self.flow = ResidualCouplingBlocks(
            channels=a.hidden_channels,
            hidden_channels=a.hidden_channels,
            kernel_size=a.kernel_size_flow,
            dilation_rate=a.dilation_rate_flow,
            num_layers=a.num_layers_flow,
            cond_channels=self.embedded_speaker_dim,
            name="flow",
        )
        dp_cond = self.embedded_speaker_dim if a.condition_dp_on_speaker else 0
        if a.use_sdp:
            self.duration_predictor = StochasticDurationPredictor(
                in_channels=a.hidden_channels,
                hidden_channels=192,
                kernel_size=3,
                dropout_p=a.dropout_p_duration_predictor,
                num_flows=4,
                cond_channels=dp_cond,
                language_emb_dim=lang_dim,
                name="duration_predictor",
            )
        else:
            self.duration_predictor = DurationPredictor(
                hidden_channels=256,
                kernel_size=3,
                dropout_p=a.dropout_p_duration_predictor,
                name="duration_predictor",
            )
        if getattr(a, "decoder_type", "hifigan") == "istft":
            from tts_tpu.vocoder.models.istft_hifigan import IstftHifiganGenerator

            self.waveform_decoder = IstftHifiganGenerator(
                in_channels=a.hidden_channels,
                resblock_type=a.resblock_type_decoder,
                resblock_dilation_sizes=tuple(map(tuple, a.resblock_dilation_sizes_decoder)),
                resblock_kernel_sizes=tuple(a.resblock_kernel_sizes_decoder),
                upsample_kernel_sizes=tuple(a.upsample_kernel_sizes_decoder),
                upsample_initial_channel=a.upsample_initial_channel_decoder,
                upsample_factors=tuple(a.upsample_rates_decoder),
                istft_n_fft=a.istft_n_fft_decoder,
                istft_hop=a.istft_hop_decoder,
                subbands=a.istft_subbands_decoder,
                cond_channels=self.embedded_speaker_dim,
                name="waveform_decoder",
            )
        else:
            self.waveform_decoder = HifiganGenerator(
                in_channels=a.hidden_channels,
                out_channels=1,
                resblock_type=a.resblock_type_decoder,
                resblock_dilation_sizes=tuple(map(tuple, a.resblock_dilation_sizes_decoder)),
                resblock_kernel_sizes=tuple(a.resblock_kernel_sizes_decoder),
                upsample_kernel_sizes=tuple(a.upsample_kernel_sizes_decoder),
                upsample_initial_channel=a.upsample_initial_channel_decoder,
                upsample_factors=tuple(a.upsample_rates_decoder),
                inference_padding=0,
                cond_channels=self.embedded_speaker_dim,
                conv_post_bias=False,
                name="waveform_decoder",
            )

    # ------------------------------------------------------------------
    def _cond_vectors(self, aux_input: Optional[Dict]):
        g = lang = None
        if aux_input:
            if aux_input.get("d_vectors") is not None and self.args.use_d_vector_file:
                g = aux_input["d_vectors"]
            elif aux_input.get("speaker_ids") is not None and self.args.use_speaker_embedding:
                g = self.emb_g(aux_input["speaker_ids"])
            if aux_input.get("language_ids") is not None and self.args.use_language_embedding:
                lang = self.emb_l(aux_input["language_ids"])
        return g, lang

    def _forward_mas(self, z_p, m_p, logs_p, x_mask, y_mask):
        """MAS over flow latents vs prior stats (reference ``vits.py:909``)."""
        attn_mask = x_mask * jnp.swapaxes(y_mask, 1, 2)  # [B, T_en, T_de]
        o_scale = jnp.exp(-2.0 * logs_p)
        logp1 = jnp.sum(-0.5 * math.log(2 * math.pi) - logs_p, axis=-1)[:, :, None]
        logp2 = jnp.einsum("bxd,byd->bxy", o_scale, -0.5 * z_p**2)
        logp3 = jnp.einsum("bxd,byd->bxy", m_p * o_scale, z_p)
        logp4 = jnp.sum(-0.5 * (m_p**2) * o_scale, axis=-1)[:, :, None]
        logp = logp1 + logp2 + logp3 + logp4
        return maximum_path(jax.lax.stop_gradient(logp), attn_mask)

    def _upsample_z(self, z):
        """Linear-interpolate the latent along time by ``interpolate_factor``
        when the encoder stack runs at a lower sample rate than the decoder
        output (reference ``vits.py:944 upsampling_z``). Identity when the
        variant is off or ``interpolate_z`` is false (then the decoder's own
        upsample rates carry the extra factor)."""
        f = int(round(self.interpolate_factor))
        if f == 1 or not self.args.interpolate_z:
            return z
        B, T, C = z.shape
        # half-pixel linear resize == torch F.interpolate(align_corners=False)
        return jax.image.resize(z, (B, T * f, C), method="linear")

    def __call__(
        self,
        x,
        x_lengths,
        y,
        y_lengths,
        waveform,
        aux_input: Optional[Dict] = None,
        train: bool = False,
    ) -> Dict[str, Any]:
        """Training forward (reference ``vits.py:961``).

        x ``[B, T_en]`` ids, y ``[B, T_de, C_spec]`` linear spec,
        waveform ``[B, T_wav, 1]``.
        """
        a = self.args
        g, lang = self._cond_vectors(aux_input)
        _, m_p, logs_p, x_mask = self.text_encoder(x, x_lengths, lang_emb=lang, train=train)
        z, m_q, logs_q, y_mask = self.posterior_encoder(y, y_lengths, g=g, train=train)
        z_p = self.flow(z, y_mask, g=g, train=train)
        attn = self._forward_mas(z_p, m_p, logs_p, x_mask, y_mask)

        attn_durations = jnp.sum(attn, axis=-1, keepdims=True)  # [B, T_en, 1]
        x_dp = jax.lax.stop_gradient(m_p) if a.detach_dp_input else m_p
        # the duration predictor conditions on encoder hidden states; the
        # reference uses x (encoder outputs), we pass prior means -- both are
        # [B, T_en, H]-shaped summaries; use encoder outputs for parity:
        if a.use_sdp:
            loss_duration = self.duration_predictor(
                x_dp,
                x_mask,
                dr=attn_durations,
                g=jax.lax.stop_gradient(g) if (g is not None and a.detach_dp_input) else g,
                lang_emb=lang,
                reverse=False,
                train=train,
            )
            loss_duration = jnp.sum(loss_duration) / jnp.sum(x_mask)
        else:
            attn_log_durations = jnp.log(attn_durations + 1e-6) * x_mask
            log_durations = self.duration_predictor(
                x_dp,
                x_mask,
                g=jax.lax.stop_gradient(g) if (g is not None and a.detach_dp_input) else g,
                train=train,
            )
            loss_duration = jnp.sum((log_durations - attn_log_durations) ** 2) / jnp.sum(x_mask)

        # expand prior over the alignment
        m_p_e = jnp.einsum("bxy,bxd->byd", attn, m_p)
        logs_p_e = jnp.einsum("bxy,bxd->byd", attn, logs_p)

        # random windowed segment → waveform decoder (reference :1034)
        seg_rng = self.make_rng("segments")
        z_slice, slice_ids = rand_segments(
            seg_rng, z, y_lengths, a.spec_segment_size, let_short_samples=True, pad_short=True
        )
        o = self.waveform_decoder(self._upsample_z(z_slice), g=g)
        return {
            "model_outputs": o,
            "alignments": jnp.swapaxes(attn, 1, 2),
            "m_p": m_p_e,
            "logs_p": logs_p_e,
            "z": z,
            "z_p": z_p,
            "m_q": m_q,
            "logs_q": logs_q,
            "durations": attn_durations,
            "loss_duration": loss_duration,
            "slice_ids": slice_ids,
            "x_mask": x_mask,
            "y_mask": y_mask,
        }

    def inference(
        self,
        x,
        x_lengths,
        aux_input: Optional[Dict] = None,
        max_frames: int = 1000,
    ) -> Dict[str, Any]:
        """Text → waveform (reference ``vits.py:1161``), static frame budget."""
        a = self.args
        g, lang = self._cond_vectors(aux_input)
        x_hid, m_p, logs_p, x_mask = self.text_encoder(x, x_lengths, lang_emb=lang, train=False)

        if a.use_sdp:
            logw = self.duration_predictor(
                x_hid,
                x_mask,
                g=g if a.condition_dp_on_speaker else None,
                lang_emb=lang,
                reverse=True,
                noise_scale=a.inference_noise_scale_dp,
            )
        else:
            logw = self.duration_predictor(
                x_hid, x_mask, g=g if a.condition_dp_on_speaker else None
            )
        w = jnp.exp(logw) * x_mask * a.length_scale
        w_ceil = jnp.ceil(w) * x_mask
        y_lengths = jnp.clip(jnp.sum(w_ceil, axis=(1, 2)), 1, max_frames).astype(jnp.int32)
        y_mask = sequence_mask(y_lengths, max_frames)[:, :, None].astype(x_mask.dtype)
        attn_mask = x_mask * jnp.swapaxes(y_mask, 1, 2)
        attn = generate_path(w_ceil[:, :, 0], attn_mask)

        m_p_e = jnp.einsum("bxy,bxd->byd", attn, m_p)
        logs_p_e = jnp.einsum("bxy,bxd->byd", attn, logs_p)
        noise = jax.random.normal(self.make_rng("noise"), m_p_e.shape)
        z_p = m_p_e + noise * jnp.exp(logs_p_e) * a.inference_noise_scale
        z = self.flow(z_p * y_mask, y_mask, g=g, reverse=True)
        z = self._upsample_z(z * y_mask)
        o = self.waveform_decoder(z, g=g)
        return {
            "model_outputs": o,
            "alignments": jnp.swapaxes(attn, 1, 2),
            "durations": w_ceil,
            "y_lengths": y_lengths,
            "y_mask": y_mask,
            "z": z,
            "z_p": z_p,
            "m_p": m_p_e,
            "logs_p": logs_p_e,
        }

    def inference_packed(
        self,
        x,
        x_lengths,
        seg_sample,
        seg_pos,
        aux_input: Optional[Dict] = None,
        noise_frames: int = 1000,
        noise_layout: str = "batch",
    ) -> Dict[str, Any]:
        """Sequence-packed batch decode: many utterances in a few dense rows.

        TPU-native replacement for the per-utterance dynamic-shape decode the
        torch reference uses (``vits.py:1161``): instead of padding every
        utterance to a shared frame budget (XLA needs static shapes), the
        host packs all utterances back-to-back into ``[R, L]`` rows separated
        by masked gaps (``utils/packing.plan_pack_layout``), this method
        decodes the packed grid in ONE dispatch, and the host slices segments
        back out.  The flow masks per layer and the decoder re-applies the
        mask after every conv, so each segment is bit-identical to its own
        zero-padded decode.

        ``seg_sample``/``seg_pos`` ``[R, L]`` int32 map packed slots to
        (batch row, frame index); ``-1`` marks gaps.  ``noise_frames`` sets
        the per-sample noise buffer length — pass the same value as a
        matching :meth:`inference` ``max_frames`` to reproduce its exact
        noise stream.  The packing must be planned from :meth:`infer_durations`
        run with the SAME rng so host layout and in-graph durations agree.

        ``noise_layout="batch"`` (default) draws z_p noise in the unpacked
        ``[B, noise_frames, C]`` layout and gathers it into the grid, so the
        audio matches :meth:`inference` frame for frame (the exactness tests
        rely on this).  ``"packed"`` draws noise directly in grid layout —
        an equally valid sample, slightly cheaper; serving uses it.
        """
        a = self.args
        g, lang = self._cond_vectors(aux_input)
        x_hid, m_p, logs_p, x_mask = self.text_encoder(x, x_lengths, lang_emb=lang, train=False)
        if a.use_sdp:
            logw = self.duration_predictor(
                x_hid,
                x_mask,
                g=g if a.condition_dp_on_speaker else None,
                lang_emb=lang,
                reverse=True,
                noise_scale=a.inference_noise_scale_dp,
            )
        else:
            logw = self.duration_predictor(
                x_hid, x_mask, g=g if a.condition_dp_on_speaker else None
            )
        w_ceil = jnp.ceil(jnp.exp(logw) * x_mask * a.length_scale) * x_mask
        y_lengths = jnp.maximum(jnp.sum(w_ceil, axis=(1, 2)), 1.0).astype(jnp.int32)

        valid = seg_sample >= 0
        s = jnp.maximum(seg_sample, 0)
        # frame→token map via cumulative durations: token t covers frames
        # [cum[t-1], cum[t]) — the same alignment generate_path expands to a
        # [T_en, T_de] matmul in inference(); a gather is O(F·C) instead
        cum = jnp.cumsum(w_ceil[:, :, 0], axis=1)  # [B, T_en]
        tok = jnp.sum(cum[s] <= seg_pos[..., None].astype(cum.dtype), axis=-1)
        tok = jnp.clip(tok, 0, m_p.shape[1] - 1)
        m_pk = m_p[s, tok]
        logs_pk = logs_p[s, tok]
        if noise_layout == "packed":
            nz = jax.random.normal(self.make_rng("noise"), m_pk.shape)
        else:
            # per-sample noise in [B, noise_frames, C] layout gathered into
            # the packed grid: the values (and therefore the audio) match a
            # plain inference(max_frames=noise_frames) call frame for frame
            noise = jax.random.normal(
                self.make_rng("noise"), (x.shape[0], noise_frames, m_p.shape[-1])
            )
            nz = noise[s, jnp.minimum(seg_pos, noise_frames - 1)]
        mask = valid[..., None].astype(m_pk.dtype)
        z_p = (m_pk + nz * jnp.exp(logs_pk) * a.inference_noise_scale) * mask

        g_pk = None
        if g is not None:
            g_b = g[:, 0, :] if g.ndim == 3 else g  # [B, C_g]
            g_pk = g_b[s]  # per-slot conditioning [R, L, C_g]
        z = self.flow(z_p, mask, g=g_pk, reverse=True)
        z = self._upsample_z(z * mask)
        dec_mask = mask
        f = int(round(self.interpolate_factor))
        if f != 1 and self.args.interpolate_z:
            dec_mask = jnp.repeat(mask, f, axis=1)
        if getattr(a, "decoder_type", "hifigan") == "istft":
            # the iSTFT decoder carries no per-conv masks, so a packed row
            # would bleed across segments for its full receptive field —
            # serve those models via the grouped-bucket path instead
            raise ValueError(
                "sequence-packed decode needs the masked HiFiGAN decoder; "
                "the istft variant is served via duration-grouped buckets"
            )
        o = self.waveform_decoder(z, g=g_pk, x_mask=dec_mask)
        return {
            "model_outputs": o,
            "y_lengths": y_lengths,
            "packed_mask": valid,
            "durations": w_ceil,
        }

    def infer_durations(self, x, x_lengths, aux_input: Optional[Dict] = None):
        """Duration-predictor pass only: text → predicted frame counts.

        Cheap relative to the flow+HiFiGAN decode, so serving runs this
        first to pick a per-batch frame bucket instead of a fixed generous
        budget (the reference avoids the problem only because torch decodes
        dynamic shapes, ``vits.py:1161``).  Uses the same ``noise`` rng
        stream as :meth:`inference`, so the SDP sample — and therefore the
        durations — are identical to the full pass."""
        a = self.args
        g, lang = self._cond_vectors(aux_input)
        x_hid, _, _, x_mask = self.text_encoder(x, x_lengths, lang_emb=lang, train=False)
        if a.use_sdp:
            logw = self.duration_predictor(
                x_hid,
                x_mask,
                g=g if a.condition_dp_on_speaker else None,
                lang_emb=lang,
                reverse=True,
                noise_scale=a.inference_noise_scale_dp,
            )
        else:
            logw = self.duration_predictor(
                x_hid, x_mask, g=g if a.condition_dp_on_speaker else None
            )
        w_ceil = jnp.ceil(jnp.exp(logw) * x_mask * a.length_scale) * x_mask
        return jnp.maximum(jnp.sum(w_ceil, axis=(1, 2)), 1.0).astype(jnp.int32)

    def voice_conversion(self, y, y_lengths, speaker_cond_src, speaker_cond_tgt):
        """Spec → latent with source speaker → flow → reverse with target
        speaker → waveform (reference ``vits.py:1202``)."""
        g_src = speaker_cond_src
        g_tgt = speaker_cond_tgt
        z, _, _, y_mask = self.posterior_encoder(y, y_lengths, g=g_src)
        z_p = self.flow(z, y_mask, g=g_src)
        z_hat = self.flow(z_p, y_mask, g=g_tgt, reverse=True)
        # intentional divergence: the reference omits upsampling_z here
        # (vits.py:1202-1228), which would emit factor× too-short audio for
        # encoder_sample_rate models — apply the same latent upsampling as
        # inference()
        return self.waveform_decoder(self._upsample_z(z_hat * y_mask), g=g_tgt)


# ---------------------------------------------------------------------------
# losses (reference TTS/tts/layers/losses.py:619-778)
# ---------------------------------------------------------------------------


def kl_loss(z_p, logs_q, m_p, logs_p, total_logdet=None, z_mask=None):
    """KL(q||p) over masked frames (reference ``losses.py:663``)."""
    kl = logs_p - logs_q - 0.5
    kl = kl + 0.5 * ((z_p - m_p) ** 2) * jnp.exp(-2.0 * logs_p)
    kl = jnp.sum(kl * z_mask)
    return kl / jnp.sum(z_mask)


def feature_loss(feats_real, feats_generated):
    """L1 feature matching ×2 (reference ``losses.py:692``)."""
    loss = 0.0
    for dr_feats, dg_feats in zip(feats_real, feats_generated):
        for dr, dg in zip(dr_feats, dg_feats):
            loss = loss + jnp.mean(jnp.abs(jax.lax.stop_gradient(dr) - dg))
    return loss * 2.0


def generator_adv_loss(scores_fake):
    """LSGAN generator loss (reference ``losses.py:704``)."""
    loss = 0.0
    for dg in scores_fake:
        loss = loss + jnp.mean((1.0 - dg) ** 2)
    return loss


def discriminator_adv_loss(scores_real, scores_fake):
    """LSGAN discriminator loss (reference ``losses.py:744``)."""
    loss = 0.0
    real_losses, fake_losses = [], []
    for dr, dg in zip(scores_real, scores_fake):
        real_l = jnp.mean((1.0 - dr) ** 2)
        fake_l = jnp.mean(dg**2)
        loss = loss + real_l + fake_l
        real_losses.append(real_l)
        fake_losses.append(fake_l)
    return loss, real_losses, fake_losses


class Vits:
    """Host wrapper for the VITS generator + discriminator pair."""

    # inference() returns a waveform [B, T, 1] directly (no vocoder stage) —
    # the capability the server's DynamicBatcher keys on
    emits_waveform = True

    def __init__(self, config: VitsConfig):
        self.config = config
        self.args = config.model_args
        factor = 1.0
        if self.args.encoder_sample_rate:
            sr, enc_sr = config.audio.sample_rate, self.args.encoder_sample_rate
            if sr % enc_sr != 0:
                raise ValueError(
                    f"audio.sample_rate ({sr}) must be an integer multiple of "
                    f"encoder_sample_rate ({enc_sr})"
                )
            factor = sr / enc_sr
            # decoder upsampling must cover hop_length at the output rate
            # (reference vits.py:1784-1796 load_checkpoint asserts)
            rates = int(np.prod(self.args.upsample_rates_decoder))
            if getattr(self.args, "decoder_type", "hifigan") == "istft":
                rates *= int(self.args.istft_hop_decoder) * int(self.args.istft_subbands_decoder)
            need = (
                config.audio.hop_length
                if self.args.interpolate_z
                else config.audio.hop_length * int(factor)
            )
            if rates != need:
                raise ValueError(
                    f"decoder upsampling {rates} != required {need} "
                    f"(hop {config.audio.hop_length}, interpolate_z="
                    f"{self.args.interpolate_z}, factor {factor})"
                )
        self.module = VitsModule(args=self.args, interpolate_factor=factor)
        self.discriminator = VitsDiscriminator(
            periods=tuple(self.args.periods_multi_period_discriminator),
            width_mult=self.args.discriminator_width_mult,
        )

    @classmethod
    def init_from_config(cls, config: VitsConfig, samples=None) -> "Vits":
        from tts_tpu.models.base import init_speaker_manager, init_tokenizer

        tokenizer, config = init_tokenizer(config)
        # mirror top-level multispeaker fields into model_args (reference
        # Vits.init_multispeaker)
        for f in ("num_speakers", "use_speaker_embedding", "use_d_vector_file", "d_vector_dim"):
            if getattr(config, f, None):
                setattr(config.model_args, f, getattr(config, f))
        holder = type("_M", (), {})()
        init_speaker_manager(holder, config, samples)
        if holder.speaker_manager and config.model_args.use_speaker_embedding:
            config.model_args.num_speakers = holder.speaker_manager.num_speakers
        model = cls(config)
        model.tokenizer = tokenizer
        model.speaker_manager = holder.speaker_manager
        model.language_manager = holder.language_manager
        return model

    def get_aux_input(self):
        return {"speaker_manager": getattr(self, "speaker_manager", None)}

    def make_train_step(self, config, rng):
        """Trainer hook: fused GAN step (see ``vits/train.py``)."""
        from .train import create_train_state, make_train_step

        state = create_train_state(self, config, rng)
        step_fn, eval_fn, optimizers = make_train_step(self, config)
        self._eval_step_fn = eval_fn
        return step_fn, optimizers, state

    def make_eval_step(self, config):
        """Trainer hook: deterministic no-grad eval (see ``vits/train.py``)."""
        if getattr(self, "_eval_step_fn", None) is None:
            from .train import make_train_step

            _, self._eval_step_fn, _ = make_train_step(self, config)
        return self._eval_step_fn

    def format_batch(self, batch):
        """Map dataset keys to the VITS step contract. For the
        ``encoder_sample_rate`` variant the posterior/flow consume
        spectrograms at the (lower) encoder rate: recompute them here from
        the waveform resampled down (reference ``vits.py:1495-1516
        format_batch_on_device``, host-side in this design)."""
        if "spec" in batch and "spec_lengths" not in batch:
            batch["spec_lengths"] = batch["mel_lengths"]
        f = int(round(self.module.interpolate_factor))
        if f > 1 and batch.get("waveform") is not None:
            from tts_tpu.audio import numpy_transforms as nt
            from tts_tpu.audio.processor import AudioProcessor

            if getattr(self, "_enc_ap", None) is None:
                self._enc_ap = AudioProcessor.init_from_config(self.config.audio, verbose=False)
            sr = self.config.audio.sample_rate
            wavs = np.asarray(batch["waveform"], np.float32)[..., 0]
            specs = [
                self._enc_ap.spectrogram(
                    nt.resample_wav(w, sr, self.args.encoder_sample_rate)
                ).T.astype(np.float32)
                for w in wavs
            ]
            T = max(s.shape[0] for s in specs)
            batch["spec"] = np.stack([np.pad(s, ((0, T - s.shape[0]), (0, 0))) for s in specs])
            batch["spec_lengths"] = np.minimum(
                np.asarray(batch["mel_lengths"]) // f, T
            ).astype(np.int32)
        return batch

    def voice_conversion(self, params, y, y_lengths, speaker_cond_src, speaker_cond_tgt):
        """Same-model voice transfer (reference ``vits.py:1202``): spec +
        source speaker → shared latent → target speaker → waveform. Speaker
        conds may be integer ids (embedded via ``emb_g``) or d-vectors."""
        def _g(c):
            c = jnp.asarray(c)
            if jnp.issubdtype(c.dtype, jnp.integer):
                emb = params["params"]["emb_g"]["embedding"]
                return emb[c.reshape(-1)]
            return c

        return self.module.apply(
            params,
            jnp.asarray(y),
            jnp.asarray(y_lengths),
            _g(speaker_cond_src),
            _g(speaker_cond_tgt),
            method=self.module.voice_conversion,
            rngs={"noise": jax.random.PRNGKey(0)},
        )

    def init_params(self, rng: jax.Array, t_en: int = 17, t_de: int = 64):
        a = self.args
        hop = int(np.prod(a.upsample_rates_decoder))
        if getattr(a, "decoder_type", "hifigan") == "istft":
            hop *= int(a.istft_hop_decoder) * int(a.istft_subbands_decoder)
        if a.interpolate_z:
            # samples per encoder-rate frame (upsampling_z adds the factor)
            hop *= int(round(self.module.interpolate_factor))

        # one fused jitted init graph: eager flax init dispatches every op
        # separately, which dominates cold-cache test/start-up time
        # conditioning inputs must be present at init or flax never creates
        # emb_g/emb_l and the g-projection layers (multi-speaker/-lingual
        # training would then start with missing params)
        aux = {}
        if a.use_d_vector_file:
            aux["d_vectors"] = jnp.zeros((1, a.d_vector_dim), jnp.float32)
        elif a.use_speaker_embedding and a.num_speakers > 0:
            aux["speaker_ids"] = jnp.zeros((1,), jnp.int32)
        if a.use_language_embedding and a.num_languages > 0:
            aux["language_ids"] = jnp.zeros((1,), jnp.int32)
        aux = aux or None

        def _init(rng_):
            x = jnp.zeros((1, t_en), jnp.int32)
            xl = jnp.full((1,), t_en, jnp.int32)
            y = jnp.zeros((1, t_de, a.out_channels), jnp.float32)
            yl = jnp.full((1,), t_de, jnp.int32)
            wav = jnp.zeros((1, t_de * hop, 1), jnp.float32)
            r1, r2, r3, r4 = jax.random.split(rng_, 4)
            gen_params = self.module.init(
                {"params": r1, "noise": r2, "segments": r3, "dropout": r4},
                x, xl, y, yl, wav, aux_input=aux,
            )
            seg_wav = jnp.zeros((1, a.spec_segment_size * hop, 1))
            disc_params = self.discriminator.init(r1, seg_wav, seg_wav)
            return gen_params, disc_params

        return jax.jit(_init)(rng)

    def forward(self, params, batch, rngs, train: bool = True):
        return self.module.apply(
            params,
            batch["text_input"],
            batch["text_lengths"],
            batch["spec"],
            batch["spec_lengths"],
            batch.get("waveform"),
            aux_input={
                "d_vectors": batch.get("d_vectors"),
                "speaker_ids": batch.get("speaker_ids"),
                "language_ids": batch.get("language_ids"),
            },
            train=train,
            rngs=rngs,
        )

    def infer_durations(self, params, x, x_lengths, aux_input=None, rng=None):
        """Predicted output frame counts ``[B]`` for bucketed decoding; must
        receive the same ``rng`` as the subsequent :meth:`inference` call so
        the stochastic-duration sample matches."""
        if rng is None:
            rng = jax.random.PRNGKey(0)
        return self.module.apply(
            params,
            x,
            x_lengths,
            aux_input=aux_input,
            method=self.module.infer_durations,
            rngs={"noise": rng},
        )

    @property
    def supports_packed_decode(self) -> bool:
        """Sequence-packed serving needs the per-conv-masked HiFiGAN decoder
        (the istft variant would bleed across packed segments)."""
        return getattr(self.args, "decoder_type", "hifigan") != "istft"

    def inference_packed(
        self,
        params,
        x,
        x_lengths,
        seg_sample,
        seg_pos,
        aux_input=None,
        noise_frames: int = 1000,
        rng=None,
        noise_layout: str = "batch",
    ):
        """Sequence-packed decode (see :meth:`VitsModule.inference_packed`).

        ``seg_sample``/``seg_pos`` come from
        ``utils.packing.plan_pack_layout`` over :meth:`infer_durations`
        output — run with the SAME ``rng`` so the plan matches the in-graph
        durations."""
        if rng is None:
            rng = jax.random.PRNGKey(0)
        return self.module.apply(
            params,
            x,
            x_lengths,
            jnp.asarray(seg_sample),
            jnp.asarray(seg_pos),
            aux_input=aux_input,
            noise_frames=noise_frames,
            noise_layout=noise_layout,
            method=self.module.inference_packed,
            rngs={"noise": rng},
        )

    def inference(self, params, x, x_lengths, aux_input=None, max_frames: int = 1000, rng=None):
        if rng is None:
            rng = jax.random.PRNGKey(0)
        if self.args.max_inference_len:
            # cap the decoder length (reference vits.py:650,1167: decoder
            # input is truncated to max_inference_len frames)
            max_frames = min(max_frames, int(self.args.max_inference_len))
        return self.module.apply(
            params,
            x,
            x_lengths,
            aux_input=aux_input,
            max_frames=max_frames,
            method=self.module.inference,
            rngs={"noise": rng},
        )
