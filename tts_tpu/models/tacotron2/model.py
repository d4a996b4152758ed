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

    def setup(self):
        self.embedding = nn.Embed(
            self.num_chars,
            512,
            embedding_init=nn.initializers.normal(0.3),
            name="embedding",
        )
        self.encoder = Tacotron2Encoder(self.encoder_in_features, self.norm_type, name="encoder")
        self.cell = Tacotron2DecoderCell(
            in_channels=self.decoder_in_features,
            frame_channels=self.out_channels,
            r=self.r,
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
        self.inputs_layer = nn.Dense(128, use_bias=False, name="inputs_layer")
        self.postnet = Postnet(self.out_channels, norm_type=self.norm_type, name="postnet")
        if self.use_speaker_embedding and self.num_speakers > 1:
            self.speaker_embedding = nn.Embed(
                self.num_speakers, self.speaker_embedding_dim, name="speaker_embedding"
            )

    def _encode(self, text, text_lengths, aux_input, train):
        x_mask = sequence_mask(text_lengths, text.shape[1])[:, :, None].astype(jnp.float32)
        emb = self.embedding(text)
        enc = self.encoder(emb, x_mask, train=train)
        if self.use_speaker_embedding and aux_input and aux_input.get("speaker_ids") is not None:
            g = self.speaker_embedding(aux_input["speaker_ids"])
            enc = jnp.concatenate(
                [enc, jnp.broadcast_to(g[:, None], (enc.shape[0], enc.shape[1], g.shape[-1]))],
                axis=-1,
            )
        elif aux_input and aux_input.get("d_vectors") is not None:
            g = aux_input["d_vectors"]
            enc = jnp.concatenate(
                [enc, jnp.broadcast_to(g[:, None], (enc.shape[0], enc.shape[1], g.shape[-1]))],
                axis=-1,
            )
        return enc, x_mask

    def __call__(self, text, text_lengths, mel_specs, mel_lengths, aux_input=None, train: bool = False):
        """Teacher-forced forward (reference ``tacotron2.py`` forward)."""
        B, T_in = text.shape
        enc, x_mask = self._encode(text, text_lengths, aux_input, train)
        input_mask = sequence_mask(text_lengths, T_in)
        processed_inputs = self.inputs_layer(enc)

        # frames grouped by r; the prenet sees only the LAST frame of the
        # previous group (reference Decoder._update_memory slices
        # ``frame_channels*(r-1):`` — tacotron2.py:246)
        T_de = mel_specs.shape[1] // self.r
        frames = mel_specs[:, : T_de * self.r].reshape(B, T_de, self.r * self.out_channels)
        frames = frames[:, :, (self.r - 1) * self.out_channels :]
        go = jnp.zeros((B, 1, self.out_channels))
        memories = jnp.concatenate([go, frames[:, :-1]], axis=1)  # teacher forcing
        memories = jnp.moveaxis(memories, 0, 1)  # [T_de, B, C]

        scan_cell = nn.scan(
            lambda cell, carry, mem: cell(carry, mem, enc, processed_inputs, input_mask, train),
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": True},
        )
        carry = self.cell.init_carry(B, T_in, enc.shape[-1])
        _, (decoder_outputs, stop_tokens, alignments) = scan_cell(self.cell, carry, memories)
        # [T_de, B, r*C] -> [B, T_de*r, C]
        decoder_outputs = jnp.moveaxis(decoder_outputs, 0, 1).reshape(
            B, T_de * self.r, self.out_channels
        )
        stop_tokens = jnp.repeat(jnp.moveaxis(stop_tokens, 0, 1), self.r, axis=1)
        alignments = jnp.moveaxis(alignments, 0, 1)  # [B, T_de, T_in]

        postnet_outputs = decoder_outputs + self.postnet(decoder_outputs, train=train)
        return {
            "model_outputs": postnet_outputs,
            "decoder_outputs": decoder_outputs,
            "alignments": alignments,
            "stop_tokens": stop_tokens,
        }

    def inference(self, text, text_lengths, aux_input=None, max_steps: Optional[int] = None):
        """Free-running AR decode with stop-token masking."""
        B, T_in = text.shape
        max_steps = max_steps or self.max_decoder_steps
        enc, _ = self._encode(text, text_lengths, aux_input, train=False)
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
        self.module = Tacotron2Module(
            num_chars=config.num_chars,
            out_channels=config.out_channels,
            r=config.r,
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
            norm_type=getattr(config, "norm_type", "layer"),
        )

    @classmethod
    def init_from_config(cls, config: Tacotron2Config, samples=None):
        from tts_tpu.models.base import init_tokenizer

        tokenizer, config = init_tokenizer(config)
        model = cls(config)
        model.tokenizer = tokenizer
        return model

    def init_params(self, rng, t_en: int = 11, t_de: int = 16):
        x = jnp.zeros((1, t_en), jnp.int32)
        xl = jnp.full((1,), t_en, jnp.int32)
        y = jnp.zeros((1, t_de, self.config.out_channels), jnp.float32)
        yl = jnp.full((1,), t_de, jnp.int32)
        if isinstance(rng, jax.Array):
            rngs = {"params": rng, "dropout": jax.random.fold_in(rng, 1)}
        return self.module.init(rngs, x, xl, y, yl)

    def forward(self, params, batch, train: bool = False, rngs=None):
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
            rngs=rngs or {"dropout": jax.random.PRNGKey(0)},
        )

    def inference(self, params, x, x_lengths, aux_input=None, max_steps: int = 500):
        return self.module.apply(
            params,
            x,
            x_lengths,
            aux_input=aux_input,
            max_steps=max_steps,
            method=self.module.inference,
            rngs={"dropout": jax.random.PRNGKey(0)},
        )

    def train_step(self, params, batch, rngs=None, train: bool = True):
        outputs = self.forward(params, batch, train=train, rngs=rngs)
        losses = tacotron_loss(self.config, outputs, batch)
        return losses["loss"], {**losses, "outputs": outputs}
