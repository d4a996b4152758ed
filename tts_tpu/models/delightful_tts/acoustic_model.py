"""DelightfulTTS AcousticModel — reference-depth flax port
(reference ``TTS/tts/layers/delightful_tts/acoustic_model.py:24``),
weight-compatible with converted checkpoints via
``tts_tpu.utils.convert.convert_delightful_acoustic``.
"""

from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from tts_tpu.layers.aligner import AlignmentNetwork
from tts_tpu.ops import generate_path, maximum_path, sequence_mask

from .acoustic import (
    Conformer,
    EmbeddingPadded,
    PhonemeLevelProsodyEncoder,
    PhonemeProsodyPredictor,
    UtteranceLevelProsodyEncoder,
    VarianceAdaptor,
    VariancePredictor,
    _lengths_to_pad_mask,
    positional_encoding,
)


def _norm_last(x, eps: float = 1e-5):
    """torch ``InstanceNorm1d(affine=False)`` as the reference applies it to
    the prosody bottlenecks: inputs arrive channel-major ([B, 1, b_u] /
    [B, T_src, b_p]), so the normalized ("time") axis is the LAST one."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) / jnp.sqrt(var + eps)


class AcousticModel(nn.Module):
    """args: a :class:`DelightfulTtsArgs`-shaped config object."""

    args: object
    num_mels: int = 100

    def setup(self):
        a = self.args
        dim = a.n_hidden_conformer_encoder
        self.emb_dim = dim
        spk_dim = (
            a.d_vector_dim if a.use_d_vector_file
            else (a.speaker_embedding_channels if a.use_speaker_embedding else 0)
        )
        self.spk_dim = spk_dim
        ref_kw = dict(
            num_mels=self.num_mels,
            ref_enc_filters=tuple(a.ref_enc_filters_reference_encoder),
            ref_enc_size=a.ref_enc_size_reference_encoder,
            ref_enc_strides=tuple(a.ref_enc_strides_reference_encoder),
            ref_enc_gru_size=a.ref_enc_gru_size_reference_encoder,
        )
        self.src_word_emb = EmbeddingPadded(
            a.num_chars, dim, padding_idx=getattr(a, "pad_id", 0),
            name="src_word_emb",
        )
        self.encoder = Conformer(
            dim=dim, n_layers=a.n_layers_conformer_encoder,
            n_heads=a.n_heads_conformer_encoder, speaker_embedding_dim=spk_dim,
            p_dropout=a.dropout_conformer_encoder,
            kernel_size_conv_mod=a.kernel_size_conv_mod_conformer_encoder,
            lrelu_slope=a.lrelu_slope, name="encoder",
        )
        self.pitch_adaptor = VarianceAdaptor(
            n_input=dim, n_hidden=a.n_hidden_variance_adaptor,
            kernel_size=a.kernel_size_variance_adaptor,
            emb_kernel_size=a.emb_kernel_size_variance_adaptor,
            p_dropout=a.dropout_variance_adaptor, lrelu_slope=a.lrelu_slope,
            name="pitch_adaptor",
        )
        self.energy_adaptor = VarianceAdaptor(
            n_input=dim, n_hidden=a.n_hidden_variance_adaptor,
            kernel_size=a.kernel_size_variance_adaptor,
            emb_kernel_size=a.emb_kernel_size_variance_adaptor,
            p_dropout=a.dropout_variance_adaptor, lrelu_slope=a.lrelu_slope,
            emb_features=a.n_hidden_variance_adaptor,  # reference EnergyAdaptor
            name="energy_adaptor",
        )
        self.aligner = AlignmentNetwork(
            in_query_channels=self.num_mels, in_key_channels=dim, name="aligner"
        )
        self.duration_predictor = VariancePredictor(
            channels=a.n_hidden_variance_adaptor, channels_out=1,
            kernel_size=a.kernel_size_variance_adaptor,
            p_dropout=a.dropout_variance_adaptor, lrelu_slope=a.lrelu_slope,
            name="duration_predictor",
        )
        self.utterance_prosody_encoder = UtteranceLevelProsodyEncoder(
            **ref_kw, dropout=a.dropout_conformer_encoder, n_hidden=dim,
            bottleneck_size_u=a.bottleneck_size_u_reference_encoder,
            token_num=a.token_num_reference_encoder,
            name="utterance_prosody_encoder",
        )
        self.utterance_prosody_predictor = PhonemeProsodyPredictor(
            hidden_size=dim, kernel_size=a.predictor_kernel_size_reference_encoder,
            dropout=a.dropout_conformer_encoder,
            bottleneck_size=a.bottleneck_size_u_reference_encoder,
            lrelu_slope=a.lrelu_slope, name="utterance_prosody_predictor",
        )
        self.phoneme_prosody_encoder = PhonemeLevelProsodyEncoder(
            **ref_kw, dropout=a.dropout_conformer_encoder, n_hidden=dim,
            n_heads=a.n_heads_conformer_encoder,
            bottleneck_size_p=a.bottleneck_size_p_reference_encoder,
            name="phoneme_prosody_encoder",
        )
        self.phoneme_prosody_predictor = PhonemeProsodyPredictor(
            hidden_size=dim, kernel_size=a.predictor_kernel_size_reference_encoder,
            dropout=a.dropout_conformer_encoder,
            bottleneck_size=a.bottleneck_size_p_reference_encoder,
            lrelu_slope=a.lrelu_slope, name="phoneme_prosody_predictor",
        )
        self.u_bottle_out = nn.Dense(dim, name="u_bottle_out")
        self.p_bottle_out = nn.Dense(dim, name="p_bottle_out")
        self.decoder = Conformer(
            dim=a.n_hidden_conformer_decoder, n_layers=a.n_layers_conformer_decoder,
            n_heads=a.n_heads_conformer_decoder, speaker_embedding_dim=spk_dim,
            p_dropout=a.dropout_conformer_decoder,
            kernel_size_conv_mod=a.kernel_size_conv_mod_conformer_decoder,
            lrelu_slope=a.lrelu_slope, name="decoder",
        )
        self.to_mel = nn.Dense(self.num_mels, name="to_mel")
        if a.use_speaker_embedding and a.num_speakers > 0:
            self.emb_g = nn.Embed(a.num_speakers, a.speaker_embedding_channels,
                                  name="emb_g")

    # ------------------------------------------------------------------
    def _speaker_embedding(self, d_vectors, speaker_idx):
        if d_vectors is not None:
            # reference normalizes d-vectors (acoustic_model.py:330 F.normalize)
            return d_vectors / jnp.maximum(
                jnp.linalg.norm(d_vectors, axis=-1, keepdims=True), 1e-12
            )
        if speaker_idx is not None and hasattr(self, "emb_g"):
            e = self.emb_g(speaker_idx)
            return e / jnp.maximum(jnp.linalg.norm(e, axis=-1, keepdims=True), 1e-12)
        return None

    @staticmethod
    def _expand_with_durations(o_en, dr, src_mask, y_mask):
        """[B, T_en, C] + durations → [B, T_de, C] (reference
        ``_expand_encoder_with_durations``)."""
        attn_mask = (~src_mask)[:, :, None] * y_mask[:, None, :]
        attn = generate_path(dr, attn_mask.astype(jnp.float32))  # [B, T_en, T_de]
        o_ex = jnp.einsum("bxy,bxc->byc", attn, o_en)
        return o_ex, jnp.swapaxes(attn, 1, 2)  # alignments [B, T_de, T_en]

    def _forward_aligner(self, token_emb, mels, src_mask, mel_mask, attn_priors):
        """(reference ``_forward_aligner``): soft attn → MAS → durations."""
        aligner_soft, aligner_logprob = self.aligner(
            mels, token_emb, attn_prior=attn_priors,
            key_mask=(~src_mask).astype(jnp.float32),
        )  # [B, T_de, T_en]
        attn_mask = (~src_mask)[:, :, None] * (~mel_mask)[:, None, :]  # [B,T_en,T_de]
        aligner_mas = maximum_path(
            jax.lax.stop_gradient(jnp.swapaxes(aligner_soft, 1, 2)),
            attn_mask.astype(jnp.float32),
        )  # [B, T_en, T_de]
        durations = jnp.sum(aligner_mas, -1)
        return durations, aligner_soft, aligner_logprob, jnp.swapaxes(aligner_mas, 1, 2)

    # ------------------------------------------------------------------
    def __call__(self, tokens, src_lens, mels, mel_lens, pitches, energies,
                 attn_priors=None, use_ground_truth: bool = True,
                 d_vectors=None, speaker_idx=None, train: bool = False) -> Dict:
        src_mask = _lengths_to_pad_mask(src_lens, tokens.shape[1])
        mel_mask = _lengths_to_pad_mask(mel_lens, mels.shape[1])

        token_emb = self.src_word_emb(tokens)
        token_emb = jnp.where(src_mask[:, :, None], 0.0, token_emb)

        durations, aligner_soft, aligner_logprob, aligner_mas = self._forward_aligner(
            token_emb, mels, src_mask, mel_mask, attn_priors
        )
        speaker_embedding = self._speaker_embedding(d_vectors, speaker_idx)
        pos = positional_encoding(self.emb_dim, max(tokens.shape[1], mels.shape[1]))

        o_en = self.encoder(token_emb, src_mask, speaker_embedding, pos, train=train)

        u_ref = _norm_last(
            self.utterance_prosody_encoder(mels, mel_lens, train=train))
        u_raw_pred = self.utterance_prosody_predictor(o_en, src_mask, train=train)
        lengths = jnp.sum((~src_mask).astype(jnp.float32), 1)
        u_pred = _norm_last(
            jnp.sum(u_raw_pred, 1, keepdims=True) / lengths[:, None, None])
        o_en = o_en + self.u_bottle_out(u_ref if use_ground_truth else u_pred)

        p_ref = _norm_last(self.phoneme_prosody_encoder(
            o_en, src_mask, mels, mel_lens, pos, train=train))
        p_pred = _norm_last(
            self.phoneme_prosody_predictor(o_en, src_mask, train=train))
        o_en = o_en + self.p_bottle_out(p_ref if use_ground_truth else p_pred)

        o_en_res = o_en
        pitch_pred, avg_pitch, pitch_emb = self.pitch_adaptor.embedding_train(
            o_en, pitches, durations, src_mask)
        energy_pred, avg_energy, energy_emb = self.energy_adaptor.embedding_train(
            o_en, energies, durations, src_mask)
        o_en = o_en + pitch_emb + energy_emb

        log_dr_pred = self.duration_predictor(
            jax.lax.stop_gradient(o_en_res), src_mask, train=train)

        y_mask = (~mel_mask).astype(jnp.float32)
        o_ex, alignments = self._expand_with_durations(o_en, durations, src_mask, y_mask)
        x = self.decoder(o_ex, mel_mask, speaker_embedding, pos, train=train)
        x = self.to_mel(x)

        return {
            "model_outputs": x,
            "pitch_pred": pitch_pred,
            "pitch_target": avg_pitch[..., 0],
            "energy_pred": energy_pred,
            "energy_target": avg_energy[..., 0],
            "u_prosody_pred": u_pred,
            "u_prosody_ref": u_ref,
            "p_prosody_pred": p_pred,
            "p_prosody_ref": p_ref,
            "alignments": alignments,
            "aligner_soft": aligner_soft,
            "aligner_mas": aligner_mas,
            "aligner_durations": durations,
            "aligner_logprob": aligner_logprob,
            "dr_log_pred": log_dr_pred,
            "dr_log_target": jnp.log(durations + 1),
            "spk_emb": speaker_embedding,
            "src_mask": src_mask,
            "mel_mask": mel_mask,
        }

    # ------------------------------------------------------------------
    def inference(self, tokens, src_lens=None, d_vectors=None, speaker_idx=None,
                  max_frames: int = 1000, d_control: float = 1.0) -> Dict:
        if src_lens is None:
            src_lens = jnp.full((tokens.shape[0],), tokens.shape[1], jnp.int32)
        src_mask = _lengths_to_pad_mask(src_lens, tokens.shape[1])
        token_emb = self.src_word_emb(tokens)
        token_emb = jnp.where(src_mask[:, :, None], 0.0, token_emb)
        speaker_embedding = self._speaker_embedding(d_vectors, speaker_idx)
        pos = positional_encoding(self.emb_dim, max(tokens.shape[1], max_frames))

        o_en = self.encoder(token_emb, src_mask, speaker_embedding, pos)
        u_raw = self.utterance_prosody_predictor(o_en, src_mask)
        lengths = jnp.sum((~src_mask).astype(jnp.float32), 1)
        u_pred = _norm_last(jnp.sum(u_raw, 1, keepdims=True) / lengths[:, None, None])
        o_en = o_en + self.u_bottle_out(u_pred)
        p_pred = _norm_last(self.phoneme_prosody_predictor(o_en, src_mask))
        o_en = o_en + self.p_bottle_out(p_pred)

        o_en_res = o_en
        pitch_emb, pitch_pred = self.pitch_adaptor.embedding_infer(o_en, src_mask)
        energy_emb, energy_pred = self.energy_adaptor.embedding_infer(o_en, src_mask)
        o_en = o_en + pitch_emb + energy_emb

        log_dr = self.duration_predictor(o_en_res, src_mask)
        dr = (jnp.exp(log_dr) - 1) * (~src_mask) * self.args.length_scale * d_control
        dr = jnp.round(jnp.maximum(dr, 1.0)) * (~src_mask)
        mel_lens = jnp.clip(jnp.sum(dr, 1), 1, max_frames).astype(jnp.int32)
        y_mask = sequence_mask(mel_lens, max_frames).astype(jnp.float32)
        o_ex, alignments = self._expand_with_durations(o_en, dr, src_mask, y_mask)
        mel_mask = y_mask < 0.5
        x = self.decoder(o_ex, mel_mask, speaker_embedding, pos)
        x = self.to_mel(x) * y_mask[:, :, None]
        return {
            "model_outputs": x,
            "durations": dr,
            "y_lengths": mel_lens,
            "alignments": alignments,
            "pitch": pitch_pred,
            "energy": energy_pred,
        }
