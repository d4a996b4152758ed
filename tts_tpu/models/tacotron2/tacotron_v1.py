"""Tacotron (v1) — CBHG encoder, AR decoder over mel with reduction r,
CBHG post-net to linear spectrograms, optional GST
(reference ``TTS/tts/models/tacotron.py`` + ``layers/tacotron/tacotron.py``).

The decoder reuses the scanned attention cell from Tacotron2 (functionally
equivalent AR decode; the reference's GRU variant differs in cell type).
"""

from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from tts_tpu.layers.tacotron import Prenet, Tacotron2DecoderCell
from tts_tpu.layers.tacotron_v1 import CBHG, GST
from tts_tpu.models.tacotron2.config import TacotronConfig
from tts_tpu.models.tacotron2.model import Tacotron2, tacotron_loss
from tts_tpu.ops import sequence_mask


class TacotronModule(nn.Module):
    num_chars: int
    decoder_output_dim: int = 80  # mel
    out_channels: int = 513  # linear
    r: int = 2
    encoder_in_features: int = 256
    use_gst: bool = False
    gst_num_heads: int = 4
    gst_num_style_tokens: int = 10
    gst_embedding_dim: int = 256
    use_capacitron_vae: bool = False
    capacitron_VAE_embedding_dim: int = 128
    max_decoder_steps: int = 500
    r_init: int = 0  # gradual training: projection sized to the initial r
    # reference v1 widths; tiny CI configs shrink these
    embedding_dim: int = 256
    cbhg_K: int = 16
    post_cbhg_K: int = 8
    cbhg_features: int = 128
    query_dim: int = 1024
    decoder_rnn_dim: int = 1024
    prenet_dim: int = 256
    attn_dim: int = 128

    def setup(self):
        f = self.cbhg_features
        self.embedding = nn.Embed(self.num_chars, self.embedding_dim, name="embedding")
        self.encoder_prenet = Prenet((self.embedding_dim, f), name="encoder_prenet")
        self.encoder_cbhg = CBHG(
            K=self.cbhg_K, conv_bank_features=f, conv_projections=(f, f),
            highway_features=f, gru_features=f, name="encoder_cbhg",
        )
        self.cell = Tacotron2DecoderCell(
            in_channels=2 * f + (self.gst_embedding_dim if self.use_gst else 0),
            frame_channels=self.decoder_output_dim,
            r=self.r,
            r_init=self.r_init,
            query_dim=self.query_dim,
            decoder_rnn_dim=self.decoder_rnn_dim,
            prenet_dim=self.prenet_dim,
            attn_dim=self.attn_dim,
            name="decoder_cell",
        )
        # projects encoder outputs into the additive-attention space — must
        # match the cell's attn_dim, not the CBHG width
        self.inputs_layer = nn.Dense(self.attn_dim, use_bias=False, name="inputs_layer")
        self.post_cbhg = CBHG(
            K=self.post_cbhg_K, conv_bank_features=f, conv_projections=(2 * f, self.decoder_output_dim),
            highway_features=f, gru_features=f, name="post_cbhg",
        )
        self.last_linear = nn.Dense(self.out_channels, name="last_linear")
        if self.use_gst:
            self.gst = GST(
                num_mel=self.decoder_output_dim,
                num_heads=self.gst_num_heads,
                num_style_tokens=self.gst_num_style_tokens,
                gst_embedding_dim=self.gst_embedding_dim,
                name="gst_layer",
            )
        if self.use_capacitron_vae:
            from tts_tpu.layers.capacitron import CapacitronVAE

            self.capacitron_layer = CapacitronVAE(
                capacitron_VAE_embedding_dim=self.capacitron_VAE_embedding_dim,
                name="capacitron_vae_layer",
            )

    def _encode(self, text, text_lengths, mel_for_style, train):
        x_mask = sequence_mask(text_lengths, text.shape[1])[:, :, None].astype(jnp.float32)
        emb = self.embedding(text)
        h = self.encoder_prenet(emb, train=train)
        enc = self.encoder_cbhg(h, train=train, x_mask=x_mask) * x_mask
        if self.use_gst:
            if mel_for_style is not None:
                style = self.gst(mel_for_style)  # [B, D_gst]
            else:
                # no reference audio: neutral (zero) style vector
                style = jnp.zeros((enc.shape[0], self.gst_embedding_dim))
            enc = jnp.concatenate(
                [enc, jnp.broadcast_to(style[:, None], (enc.shape[0], enc.shape[1], style.shape[-1]))],
                axis=-1,
            )
        extras = {}
        if self.use_capacitron_vae:
            z, kl, beta = self.capacitron_layer(mel_for_style, enc)
            extras["capacitron_kl"] = kl
            extras["capacitron_beta"] = beta
            enc = jnp.concatenate(
                [enc, jnp.broadcast_to(z, (enc.shape[0], enc.shape[1], z.shape[-1]))], axis=-1
            )
        return enc, extras

    def __call__(self, text, text_lengths, mel_specs, mel_lengths, aux_input=None, train: bool = False):
        B, T_in = text.shape
        style_mel_in = mel_specs if (self.use_gst or self.use_capacitron_vae) else None
        enc, extras = self._encode(text, text_lengths, style_mel_in, train)
        input_mask = sequence_mask(text_lengths, T_in)
        processed_inputs = self.inputs_layer(enc)

        T_de = mel_specs.shape[1] // self.r
        frames = mel_specs[:, : T_de * self.r].reshape(B, T_de, self.r * self.decoder_output_dim)
        # prenet sees only the last frame of the previous group (reference
        # Decoder._update_memory with memory_size<0)
        frames = frames[:, :, (self.r - 1) * self.decoder_output_dim :]
        go = jnp.zeros((B, 1, self.decoder_output_dim))
        memories = jnp.moveaxis(jnp.concatenate([go, frames[:, :-1]], 1), 0, 1)

        scan_cell = nn.scan(
            lambda cell, carry, mem: cell(carry, mem, enc, processed_inputs, input_mask, train),
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": True},
        )
        carry = self.cell.init_carry(B, T_in, enc.shape[-1])
        _, (decoder_outputs, stop_tokens, alignments) = scan_cell(self.cell, carry, memories)
        decoder_outputs = jnp.moveaxis(decoder_outputs, 0, 1).reshape(
            B, T_de * self.r, self.decoder_output_dim
        )
        stop_tokens = jnp.repeat(jnp.moveaxis(stop_tokens, 0, 1), self.r, axis=1)
        alignments = jnp.moveaxis(alignments, 0, 1)

        # mask the post CBHG on mel lengths so linear outputs at valid frames
        # don't depend on the batch's trailing mel padding
        mel_mask = sequence_mask(
            jnp.minimum(mel_lengths, T_de * self.r), T_de * self.r
        )[:, :, None].astype(jnp.float32)
        post = self.post_cbhg(decoder_outputs, train=train, x_mask=mel_mask)
        linear_outputs = self.last_linear(post)
        return {
            "model_outputs": linear_outputs,  # linear spec [B, T, 513]
            "decoder_outputs": decoder_outputs,  # mel [B, T, 80]
            "alignments": alignments,
            "stop_tokens": stop_tokens,
            **extras,
        }

    def inference(self, text, text_lengths, aux_input=None, max_steps: Optional[int] = None,
                  style_mel: Optional[jnp.ndarray] = None):
        B, T_in = text.shape
        max_steps = max_steps or self.max_decoder_steps
        enc, _ = self._encode(text, text_lengths, style_mel, train=False)
        input_mask = sequence_mask(text_lengths, T_in)
        processed_inputs = self.inputs_layer(enc)

        def step(cell, carry, _):
            cell_carry, prev, finished = carry
            new_carry, (out, stop, align) = cell(
                cell_carry, prev, enc, processed_inputs, input_mask, False
            )
            new_finished = finished | (nn.sigmoid(stop) > 0.5)
            prev_out = out[:, (self.r - 1) * self.decoder_output_dim :]
            return (new_carry, prev_out, new_finished), (out, stop, align, finished)

        scan_step = nn.scan(
            step, variable_broadcast="params",
            split_rngs={"params": False, "dropout": True}, length=max_steps,
        )
        carry0 = (
            self.cell.init_carry(B, T_in, enc.shape[-1]),
            jnp.zeros((B, self.decoder_output_dim)),
            jnp.zeros((B,), bool),
        )
        _, (outputs, stops, aligns, finished) = scan_step(self.cell, carry0, None)
        outputs = jnp.moveaxis(outputs, 0, 1).reshape(B, max_steps * self.r, self.decoder_output_dim)
        active = ~jnp.moveaxis(finished, 0, 1)
        mel_lengths = jnp.sum(active.astype(jnp.int32), axis=1) * self.r
        valid = jnp.repeat(active, self.r, axis=1)[:, :, None]
        outputs = outputs * valid
        # mask the post CBHG at the stop boundary: the linear spec for emitted
        # frames is then independent of the static max_steps budget
        linear = self.last_linear(
            self.post_cbhg(outputs, train=False, x_mask=valid.astype(jnp.float32))
        ) * valid
        return {
            "model_outputs": linear,
            "decoder_outputs": outputs,
            "alignments": jnp.moveaxis(aligns, 0, 1),
            "mel_lengths": mel_lengths,
        }


class Tacotron(Tacotron2):
    """Host wrapper for Tacotron v1 (linear-spec output + Griffin-Lim)."""

    def __init__(self, config: TacotronConfig):
        self.config = config
        self.r_init = config.r
        self.module = self._build_module(config.r)

    def _build_module(self, r: int) -> TacotronModule:
        config = self.config
        return TacotronModule(
            num_chars=config.num_chars,
            decoder_output_dim=config.decoder_output_dim,
            out_channels=config.out_channels,
            r=r,
            r_init=self.r_init,
            encoder_in_features=config.encoder_in_features,
            use_gst=config.use_gst,
            use_capacitron_vae=config.use_capacitron_vae,
            max_decoder_steps=config.max_decoder_steps,
            embedding_dim=getattr(config, "embedding_dim", 256) or 256,
            cbhg_K=getattr(config, "cbhg_K", 16),
            post_cbhg_K=getattr(config, "post_cbhg_K", 8),
            cbhg_features=getattr(config, "cbhg_features", 128),
            query_dim=getattr(config, "query_dim", 1024),
            decoder_rnn_dim=getattr(config, "decoder_rnn_dim", 1024),
            prenet_dim=getattr(config, "prenet_dim", 256),
            attn_dim=getattr(config, "attn_dim", 128),
        )

    def init_params(self, rng, t_en: int = 11, t_de: int = 16):
        import jax as _jax

        x = jnp.zeros((1, t_en), jnp.int32)
        xl = jnp.full((1,), t_en, jnp.int32)
        # teacher forcing consumes MEL frames (decoder_output_dim), not the
        # linear-spec out_channels the base class would size
        y = jnp.zeros((1, t_de, self.config.decoder_output_dim), jnp.float32)
        yl = jnp.full((1,), t_de, jnp.int32)
        rngs = {
            "params": rng,
            "dropout": _jax.random.fold_in(rng, 1),
            "noise": _jax.random.fold_in(rng, 2),
        }
        return self.module.init(rngs, x, xl, y, yl, train=True)

    def train_step(self, params, batch, rngs=None):
        outputs = self.forward(params, batch, train=True, rngs=rngs)
        # decoder loss on mel, postnet loss on linear (reference TacotronLoss)
        from tts_tpu.layers import losses as L

        dec_loss = L.l1_loss_masked(
            outputs["decoder_outputs"], batch["mel_input"], batch["mel_lengths"]
        )
        post_loss = L.l1_loss_masked(
            outputs["model_outputs"], batch["linear_input"], batch["mel_lengths"]
        )
        stop_loss = L.bce_loss_masked(
            outputs["stop_tokens"], batch["stop_targets"], batch["mel_lengths"],
            pos_weight=self.config.stopnet_pos_weight,
        )
        loss = (
            self.config.decoder_loss_alpha * dec_loss
            + self.config.postnet_loss_alpha * post_loss
            + stop_loss
        )
        extra_metrics = {}
        if outputs.get("capacitron_kl") is not None:
            from tts_tpu.layers.capacitron import capacitron_loss

            cap = (self.config.capacitron_vae or {})
            cap_loss, kl = capacitron_loss(
                outputs["capacitron_kl"], outputs["capacitron_beta"],
                capacity=cap.get("capacitron_capacity", 150.0),
            )
            loss = loss + cap.get("capacitron_VAE_loss_alpha", 0.25) * cap_loss
            extra_metrics = {"capacitron_loss": cap_loss, "capacitron_kl": kl}
        return loss, {
            **extra_metrics,
            "loss": loss,
            "decoder_loss": dec_loss,
            "postnet_loss": post_loss,
            "stopnet_loss": stop_loss,
            "outputs": outputs,
        }
