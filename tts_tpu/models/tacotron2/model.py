"""Tacotron2 — autoregressive attention-based TTS
(reference ``TTS/tts/models/tacotron2.py`` + ``base_tacotron.py``).

Teacher-forced training and free-running inference are both single
``nn.scan`` loops over the decoder cell; inference runs to a static
``max_decoder_steps`` budget with a stop-token "finished" mask (no dynamic
shapes), returning real lengths.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from tts_tpu.layers import losses as L
from tts_tpu.layers.tacotron import (
    Postnet,
    Tacotron2DecoderCell,
    Tacotron2Encoder,
)
from tts_tpu.ops import sequence_mask

from .config import Tacotron2Config


class Tacotron2Module(nn.Module):
    num_chars: int
    out_channels: int = 80
    r: int = 1
    encoder_in_features: int = 512
    decoder_in_features: int = 512
    prenet_type: str = "original"
    prenet_dropout: bool = True
    location_attn: bool = True
    attn_norm: str = "softmax"
    separate_stopnet: bool = True
    max_decoder_steps: int = 10000
    norm_type: str = "layer"
    num_speakers: int = 0
    use_speaker_embedding: bool = False
    speaker_embedding_dim: int = 512
    attn_type: str = "original"
    attn_K: int = 5
    use_forward_attn: bool = False
    trans_agent: bool = False
    attn_win: bool = False
    # decoder cell widths (reference tacotron2 sizes; tests shrink them)
    embedding_dim: int = 512
    query_dim: int = 1024
    decoder_rnn_dim: int = 1024
    prenet_dim: int = 256
    attn_dim: int = 128
    double_decoder_consistency: bool = False
    ddc_r: int = 6
    r_init: int = 0  # gradual training: projection sized to the initial r
    # global style tokens + Capacitron VAE (reference base_tacotron.py
    # compute_gst/compute_capacitron_VAE_embedding: style vector broadcast-
    # concatenated to the encoder outputs)
    use_gst: bool = False
    gst_num_heads: int = 4
    gst_num_style_tokens: int = 10
    gst_embedding_dim: int = 512
    use_capacitron_vae: bool = False
    capacitron_VAE_embedding_dim: int = 128

    def setup(self):
        self.embedding = nn.Embed(
            self.num_chars,
            self.embedding_dim,
            embedding_init=nn.initializers.normal(0.3),
            name="embedding",
        )
        self.encoder = Tacotron2Encoder(self.encoder_in_features, self.norm_type, name="encoder")
        self.cell = Tacotron2DecoderCell(
            in_channels=self.decoder_in_features,
            frame_channels=self.out_channels,
            r=self.r,
            r_init=self.r_init,
            query_dim=self.query_dim,
            decoder_rnn_dim=self.decoder_rnn_dim,
            prenet_dim=self.prenet_dim,
            attn_dim=self.attn_dim,
            prenet_type=self.prenet_type,
            prenet_dropout=self.prenet_dropout,
            location_attn=self.location_attn,
            attn_norm=self.attn_norm,
            separate_stopnet=self.separate_stopnet,
            attn_type=self.attn_type,
            attn_K=self.attn_K,
            use_forward_attn=self.use_forward_attn,
            trans_agent=self.trans_agent,
            attn_win=self.attn_win,
            name="decoder_cell",
        )
        if self.double_decoder_consistency:
            # coarse decoder with a larger reduction factor (reference
            # base_tacotron.py:128; DDC https://erogol.com/solving-attention-problems-of-tts-models-with-double-decoder-consistency/)
            self.coarse_cell = Tacotron2DecoderCell(
                in_channels=self.decoder_in_features,
                frame_channels=self.out_channels,
                r=self.ddc_r,
                query_dim=self.query_dim,
                decoder_rnn_dim=self.decoder_rnn_dim,
                prenet_dim=self.prenet_dim,
                attn_dim=self.attn_dim,
                prenet_type=self.prenet_type,
                prenet_dropout=self.prenet_dropout,
                location_attn=self.location_attn,
                attn_norm=self.attn_norm,
                separate_stopnet=self.separate_stopnet,
                attn_type=self.attn_type,
                attn_K=self.attn_K,
                use_forward_attn=self.use_forward_attn,
                trans_agent=self.trans_agent,
                attn_win=self.attn_win,
                name="coarse_decoder_cell",
            )
        self.inputs_layer = nn.Dense(self.attn_dim, use_bias=False, name="inputs_layer")
        self.postnet = Postnet(self.out_channels, norm_type=self.norm_type, name="postnet")
        if self.use_speaker_embedding and self.num_speakers > 1:
            self.speaker_embedding = nn.Embed(
                self.num_speakers, self.speaker_embedding_dim, name="speaker_embedding"
            )
        if self.use_gst:
            from tts_tpu.layers.tacotron_v1 import GST

            self.gst = GST(
                num_mel=self.out_channels,
                num_heads=self.gst_num_heads,
                num_style_tokens=self.gst_num_style_tokens,
                gst_embedding_dim=self.gst_embedding_dim,
                norm_type=self.norm_type,
                name="gst_layer",
            )
        if self.use_capacitron_vae:
            from tts_tpu.layers.capacitron import CapacitronVAE

            self.capacitron_layer = CapacitronVAE(
                capacitron_VAE_embedding_dim=self.capacitron_VAE_embedding_dim,
                norm_type=self.norm_type,
                name="capacitron_vae_layer",
            )

    def _encode(self, text, text_lengths, aux_input, train, mel_for_style=None,
                mel_style_lengths=None):
        x_mask = sequence_mask(text_lengths, text.shape[1])[:, :, None].astype(jnp.float32)
        emb = self.embedding(text)
        enc = self.encoder(emb, x_mask, train=train)
        extras = {}

        def _concat(vec):
            return jnp.concatenate(
                [enc, jnp.broadcast_to(vec[:, None], (enc.shape[0], enc.shape[1], vec.shape[-1]))],
                axis=-1,
            )

        if self.use_speaker_embedding and aux_input and aux_input.get("speaker_ids") is not None:
            enc = _concat(self.speaker_embedding(aux_input["speaker_ids"]))
        elif aux_input and aux_input.get("d_vectors") is not None:
            enc = _concat(aux_input["d_vectors"])
        if self.use_gst:
            if mel_for_style is not None:
                style = self.gst(mel_for_style)
            else:
                style = jnp.zeros((enc.shape[0], self.gst_embedding_dim))
            enc = _concat(style)
        if self.use_capacitron_vae:
            z, kl, beta = self.capacitron_layer(
                mel_for_style, enc, text_lengths=text_lengths,
                mel_lengths=mel_style_lengths,
            )
            extras["capacitron_kl"] = kl
            extras["capacitron_beta"] = beta
            enc = _concat(z if z.ndim == 2 else z[:, 0])
        return enc, x_mask, extras

    def __call__(self, text, text_lengths, mel_specs, mel_lengths, aux_input=None, train: bool = False):
        """Teacher-forced forward (reference ``tacotron2.py`` forward)."""
        B, T_in = text.shape
        style_mel = mel_specs if (self.use_gst or self.use_capacitron_vae) else None
        enc, x_mask, extras = self._encode(
            text, text_lengths, aux_input, train, mel_for_style=style_mel,
            mel_style_lengths=mel_lengths if style_mel is not None else None,
        )
        input_mask = sequence_mask(text_lengths, T_in)
        processed_inputs = self.inputs_layer(enc)

        decoder_outputs, stop_tokens, alignments = self._teacher_forced(
            self.cell, self.r, enc, processed_inputs, input_mask, mel_specs, train
        )
        postnet_outputs = decoder_outputs + self.postnet(decoder_outputs, train=train)
        out = {
            "model_outputs": postnet_outputs,
            "decoder_outputs": decoder_outputs,
            "alignments": alignments,
            "stop_tokens": stop_tokens,
            **extras,
        }
        if self.double_decoder_consistency and train:
            # coarse pass on stop-grad encoder outputs (base_tacotron.py:207)
            enc_sg = jax.lax.stop_gradient(enc)
            proc_sg = jax.lax.stop_gradient(processed_inputs)
            T = mel_specs.shape[1]
            pad = (-T) % self.ddc_r
            mels_c = jnp.pad(mel_specs, ((0, 0), (0, pad), (0, 0)))
            dec_b, _, align_b = self._teacher_forced(
                self.coarse_cell, self.ddc_r, enc_sg, proc_sg, input_mask, mels_c, train
            )
            # nearest-upsample coarse alignments to the fine decoder rate
            T_fine = alignments.shape[1]
            idx = jnp.clip((jnp.arange(T_fine) * align_b.shape[1]) // T_fine, 0, align_b.shape[1] - 1)
            out["decoder_outputs_backward"] = dec_b[:, :T]
            out["alignments_backward"] = align_b[:, idx]
        return out

    def _teacher_forced(self, cell, r, enc, processed_inputs, input_mask, mel_specs, train):
        """One teacher-forced decoder scan at reduction factor ``r``.

        Frames grouped by r; the prenet sees only the LAST frame of the
        previous group (reference Decoder._update_memory slices
        ``frame_channels*(r-1):`` — tacotron2.py:246).
        """
        B = mel_specs.shape[0]
        T_de = mel_specs.shape[1] // r
        frames = mel_specs[:, : T_de * r].reshape(B, T_de, r * self.out_channels)
        frames = frames[:, :, (r - 1) * self.out_channels :]
        go = jnp.zeros((B, 1, self.out_channels))
        memories = jnp.concatenate([go, frames[:, :-1]], axis=1)  # teacher forcing
        memories = jnp.moveaxis(memories, 0, 1)  # [T_de, B, C]

        scan_cell = nn.scan(
            lambda c, carry, mem: c(carry, mem, enc, processed_inputs, input_mask, train),
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": True},
        )
        carry = cell.init_carry(B, enc.shape[1], enc.shape[-1])
        _, (decoder_outputs, stop_tokens, alignments) = scan_cell(cell, carry, memories)
        decoder_outputs = jnp.moveaxis(decoder_outputs, 0, 1).reshape(
            B, T_de * r, self.out_channels
        )
        stop_tokens = jnp.repeat(jnp.moveaxis(stop_tokens, 0, 1), r, axis=1)
        alignments = jnp.moveaxis(alignments, 0, 1)  # [B, T_de, T_in]
        return decoder_outputs, stop_tokens, alignments

    def inference(self, text, text_lengths, aux_input=None, max_steps: Optional[int] = None):
        """Free-running AR decode with stop-token masking."""
        B, T_in = text.shape
        max_steps = max_steps or self.max_decoder_steps
        style_mel = aux_input.get("style_mel") if aux_input else None
        enc, _, _ = self._encode(
            text, text_lengths, aux_input, train=False, mel_for_style=style_mel
        )
        input_mask = sequence_mask(text_lengths, T_in)
        processed_inputs = self.inputs_layer(enc)

        def step(cell, carry, _):
            cell_carry, prev_frame, finished = carry
            new_cell_carry, (out, stop, align) = cell(
                cell_carry, prev_frame, enc, processed_inputs, input_mask, False
            )
            stop_prob = nn.sigmoid(stop)
            new_finished = finished | (stop_prob > 0.5)
            # feed back only the last frame of the r-group (reference
            # Decoder._update_memory)
            prev = out[:, (self.r - 1) * self.out_channels :]
            return (new_cell_carry, prev, new_finished), (out, stop, align, finished)

        scan_step = nn.scan(
            step,
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": True},
            length=max_steps,
        )
        carry0 = (
            self.cell.init_carry(B, T_in, enc.shape[-1]),
            jnp.zeros((B, self.out_channels)),
            jnp.zeros((B,), bool),
        )
        _, (outputs, stops, aligns, finished) = scan_step(self.cell, carry0, None)
        outputs = jnp.moveaxis(outputs, 0, 1).reshape(B, max_steps * self.r, self.out_channels)
        stops = jnp.moveaxis(stops, 0, 1)
        aligns = jnp.moveaxis(aligns, 0, 1)
        active = ~jnp.moveaxis(finished, 0, 1)  # [B, T] frame had not stopped yet
        mel_lengths = jnp.sum(active.astype(jnp.int32), axis=1) * self.r
        valid = jnp.repeat(active, self.r, axis=1)[:, :, None]
        outputs = outputs * valid
        postnet_outputs = outputs + self.postnet(outputs, train=False) * valid
        return {
            "model_outputs": postnet_outputs,
            "decoder_outputs": outputs,
            "alignments": aligns,
            "stop_tokens": stops,
            "mel_lengths": mel_lengths,
        }


def tacotron_loss(config: Tacotron2Config, outputs, batch):
    """Decoder/postnet masked loss + stopnet BCE + guided attention
    (reference ``losses.py:314`` TacotronLoss)."""
    mel = batch["mel_input"]
    mel_lens = batch["mel_lengths"]
    text_lens = batch["text_lengths"]
    stop_targets = batch["stop_targets"]
    out: Dict[str, jnp.ndarray] = {}

    spec_fn = L.mse_loss_masked if config.model == "tacotron2" else L.l1_loss_masked
    if config.loss_masking:
        decoder_loss = spec_fn(outputs["decoder_outputs"], mel, mel_lens, config.seq_len_norm)
        postnet_loss = spec_fn(outputs["model_outputs"], mel, mel_lens, config.seq_len_norm)
    else:
        decoder_loss = jnp.mean((outputs["decoder_outputs"] - mel) ** 2)
        postnet_loss = jnp.mean((outputs["model_outputs"] - mel) ** 2)
    loss = config.decoder_loss_alpha * decoder_loss + config.postnet_loss_alpha * postnet_loss
    out["decoder_loss"] = decoder_loss
    out["postnet_loss"] = postnet_loss

    if config.stopnet:
        stop_loss = L.bce_loss_masked(
            outputs["stop_tokens"], stop_targets, mel_lens, pos_weight=config.stopnet_pos_weight
        )
        loss = loss + stop_loss
        out["stopnet_loss"] = stop_loss

    if "decoder_outputs_backward" in outputs:
        # double decoder consistency (reference losses.py:463-472)
        decoder_b_loss = spec_fn(outputs["decoder_outputs_backward"], mel, mel_lens)
        attention_c_loss = jnp.mean(
            jnp.abs(outputs["alignments"] - outputs["alignments_backward"])
        )
        loss = loss + config.decoder_loss_alpha * (decoder_b_loss + attention_c_loss)
        out["decoder_coarse_loss"] = decoder_b_loss
        out["decoder_ddc_loss"] = attention_c_loss

    if config.ga_alpha > 0:
        # guided attention: penalize attention mass far from the diagonal
        # (reference losses.py:232 GuidedAttentionLoss, sigma=0.4)
        attn = outputs["alignments"]  # [B, T_de, T_in]
        B, T_de, T_in = attn.shape
        n = jnp.arange(T_de)[None, :, None] / jnp.maximum(mel_lens // config.r, 1)[:, None, None]
        t = jnp.arange(T_in)[None, None, :] / jnp.maximum(text_lens, 1)[:, None, None]
        ga_w = 1.0 - jnp.exp(-((n - t) ** 2) / (2 * 0.4**2))
        seq_mask = (
            sequence_mask(mel_lens // config.r, T_de)[:, :, None]
            & sequence_mask(text_lens, T_in)[:, None, :]
        )
        ga_loss = jnp.sum(attn * ga_w * seq_mask) / jnp.maximum(jnp.sum(seq_mask), 1)
        loss = loss + config.ga_alpha * ga_loss
        out["ga_loss"] = ga_loss

    out["loss"] = loss
    return out


class Tacotron2:
    """Host wrapper with the trainer-model surface."""

    def __init__(self, config: Tacotron2Config):
        self.config = config
        self.r_init = config.r  # projection width stays fixed across set_r
        self.module = self._build_module(config.r)

    def _build_module(self, r: int) -> Tacotron2Module:
        config = self.config
        return Tacotron2Module(
            num_chars=config.num_chars,
            out_channels=config.out_channels,
            r=r,
            r_init=self.r_init,
            encoder_in_features=config.encoder_in_features,
            decoder_in_features=config.decoder_in_features,
            prenet_type=config.prenet_type,
            prenet_dropout=config.prenet_dropout,
            location_attn=config.location_attn,
            attn_norm=config.attention_norm,
            separate_stopnet=config.separate_stopnet,
            max_decoder_steps=config.max_decoder_steps,
            num_speakers=config.num_speakers,
            use_speaker_embedding=config.use_speaker_embedding,
            attn_type=config.attention_type,
            attn_K=config.attention_heads,
            use_forward_attn=config.use_forward_attn,
            trans_agent=config.transition_agent,
            attn_win=config.attention_win,
            embedding_dim=getattr(config, "embedding_dim", 512),
            query_dim=getattr(config, "query_dim", 1024),
            decoder_rnn_dim=getattr(config, "decoder_rnn_dim", 1024),
            prenet_dim=getattr(config, "prenet_dim", 256),
            attn_dim=getattr(config, "attn_dim", 128),
            norm_type=getattr(config, "norm_type", "layer"),
            double_decoder_consistency=getattr(config, "double_decoder_consistency", False),
            ddc_r=getattr(config, "ddc_r", 6),
            use_gst=getattr(config, "use_gst", False),
            gst_num_heads=(config.gst or {}).get("gst_num_heads", 4) if getattr(config, "gst", None) else 4,
            gst_num_style_tokens=(config.gst or {}).get("gst_num_style_tokens", 10) if getattr(config, "gst", None) else 10,
            gst_embedding_dim=(config.gst or {}).get("gst_embedding_dim", 512) if getattr(config, "gst", None) else 512,
            use_capacitron_vae=getattr(config, "use_capacitron_vae", False),
            capacitron_VAE_embedding_dim=(
                (config.capacitron_vae or {}).get("capacitron_VAE_embedding_dim", 128)
                if getattr(config, "capacitron_vae", None) else 128
            ),
        )

    @classmethod
    def init_from_config(cls, config: Tacotron2Config, samples=None):
        from tts_tpu.models.base import init_tokenizer

        tokenizer, config = init_tokenizer(config)
        model = cls(config)
        model.tokenizer = tokenizer
        return model

    def set_r(self, r: int):
        """Change the reduction factor without changing parameter shapes
        (reference ``Decoder.set_r``, tacotron2.py:211): the projection stays
        sized to the initial r; emission slices the first ``r`` frames."""
        if r > self.r_init:
            raise ValueError(f"r={r} exceeds r_init={self.r_init}")
        self.module = self._build_module(r)
        self.config.r = r

    def on_epoch_start(self, trainer) -> bool:
        """Gradual-training schedule hook (reference ``base_tacotron.py:293``
        + ``utils/training.py:33``): entries ``[step, r, batch_size]``,
        scaled by the data-parallel width.  Returns True when r changed so
        the trainer re-jits the step (new static shapes)."""
        schedule = getattr(self.config, "gradual_training", None)
        if not schedule:
            return False
        n_data = 1
        if trainer is not None and getattr(trainer, "mesh", None) is not None:
            n_data = int(dict(zip(trainer.mesh.axis_names, trainer.mesh.devices.shape)).get("data", 1))
        current = None
        for values in schedule:
            if trainer.global_step * n_data >= values[0]:
                current = values
        if current is None:
            return False
        r, batch_size = int(current[1]), int(current[2])
        trainer.config.batch_size = batch_size
        if r == self.module.r:
            return False
        self.set_r(r)
        print(f" > Gradual training: r={r}, batch_size={batch_size}")
        return True

    def init_params(self, rng, t_en: int = 11, t_de: int = 16):
        x = jnp.zeros((1, t_en), jnp.int32)
        xl = jnp.full((1,), t_en, jnp.int32)
        y = jnp.zeros((1, t_de, self.config.out_channels), jnp.float32)
        yl = jnp.full((1,), t_de, jnp.int32)
        if isinstance(rng, jax.Array):
            rngs = {
                "params": rng,
                "dropout": jax.random.fold_in(rng, 1),
                "noise": jax.random.fold_in(rng, 2),
            }
        # train=True so the DDC coarse decoder (train-only branch) is traced
        return self.module.init(rngs, x, xl, y, yl, train=True)

    def forward(self, params, batch, train: bool = False, rngs=None):
        rngs = dict(rngs) if rngs else {"dropout": jax.random.PRNGKey(0)}
        rngs.setdefault("noise", jax.random.fold_in(rngs["dropout"], 2))
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

    def inference(self, params, x, x_lengths, aux_input=None, max_steps: int = 500):
        return self.module.apply(
            params,
            x,
            x_lengths,
            aux_input=aux_input,
            max_steps=max_steps,
            method=self.module.inference,
            rngs={"dropout": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(7)},
        )

    def train_step(self, params, batch, rngs=None, train: bool = True):
        outputs = self.forward(params, batch, train=train, rngs=rngs)
        losses = tacotron_loss(self.config, outputs, batch)
        loss = losses["loss"]
        if outputs.get("capacitron_kl") is not None:
            from tts_tpu.layers.capacitron import capacitron_loss

            cap = getattr(self.config, "capacitron_vae", None) or {}
            cap_loss, kl = capacitron_loss(
                outputs["capacitron_kl"], outputs["capacitron_beta"],
                capacity=cap.get("capacitron_capacity", 150.0),
            )
            loss = loss + cap.get("capacitron_VAE_loss_alpha", 0.25) * cap_loss
            losses.update(loss=loss, capacitron_loss=cap_loss, capacitron_kl=kl)
        return loss, {**losses, "outputs": outputs}
