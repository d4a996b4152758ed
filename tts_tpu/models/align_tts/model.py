"""AlignTTS — MDN-alignment feed-forward TTS
(reference ``TTS/tts/models/align_tts.py``).

The MDN forward-sum loss is a single log-domain ``lax.scan`` over mel
frames (the reference builds the DP table with a Python loop over time,
``losses.py:540``).
"""

from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from tts_tpu.layers import losses as L
from tts_tpu.layers.common import DurationPredictor
from tts_tpu.layers.feed_forward import FFTransformerBlock, PositionalEncoding, ResidualConv1dBNBlock
from tts_tpu.ops import generate_path, maximum_path, sequence_mask

from .config import AlignTTSArgs, AlignTTSConfig


def mdn_loss(logp: jnp.ndarray, text_lengths, mel_lengths) -> jnp.ndarray:
    """Forward-sum NLL over monotonic alignments (reference ``losses.py:540``
    MDNLoss) as one vectorized scan.

    logp: ``[B, T_en, T_de]`` per-(token, frame) log-likelihoods.
    """
    B, T_en, T_de = logp.shape
    neg = -1e4
    alpha0 = jnp.full((B, T_en), neg)
    alpha0 = alpha0.at[:, 0].set(logp[:, 0, 0])

    def step(alpha, inputs):
        logp_t, t = inputs  # [B, T_en]
        prev = jnp.pad(alpha, ((0, 0), (1, 0)), constant_values=neg)[:, :-1]
        new_alpha = jnp.logaddexp(alpha + 1e-4, prev + 1e-4) + logp_t
        active = (t < mel_lengths)[:, None]
        return jnp.where(active, new_alpha, alpha), None

    ts = jnp.arange(1, T_de)
    alpha, _ = jax.lax.scan(step, alpha0, (jnp.moveaxis(logp[:, :, 1:], 2, 0), ts))
    final = jnp.take_along_axis(alpha, (text_lengths - 1)[:, None], axis=1)[:, 0]
    return -jnp.mean(final) / T_en


def _make_block(kind: str, channels: int, params: dict, name: str):
    if kind == "fftransformer":
        return FFTransformerBlock(
            in_out_channels=channels,
            num_heads=params.get("num_heads", 2),
            hidden_channels_ffn=params.get("hidden_channels_ffn", 1024),
            num_layers=params.get("num_layers", 6),
            dropout_p=params.get("dropout_p", 0.1),
            name=name,
        )
    return ResidualConv1dBNBlock(
        hidden_channels=channels,
        out_channels=channels,
        kernel_size=params.get("kernel_size", 4),
        dilations=tuple(params.get("dilations", [1, 2, 4] * 4 + [1])),
        num_conv_blocks=params.get("num_conv_blocks", 2),
        name=name,
    )


class AlignTTSModule(nn.Module):
    args: AlignTTSArgs

    def setup(self):
        a = self.args
        self.emb = nn.Embed(a.num_chars, a.hidden_channels, name="emb")
        self.pos_encoder = PositionalEncoding(a.hidden_channels, name="pos_encoder")
        self.encoder = _make_block(a.encoder_type, a.hidden_channels, a.encoder_params, "encoder")
        self.decoder = _make_block(a.decoder_type, a.hidden_channels, a.decoder_params, "decoder")
        self.duration_predictor = DurationPredictor(
            hidden_channels=a.hidden_channels_dp, kernel_size=3, dropout_p=0.1,
            name="duration_predictor",
        )
        self.mod_layer = nn.Dense(a.hidden_channels, name="mod_layer")
        self.mdn_conv1 = nn.Dense(a.hidden_channels, name="mdn_conv1")
        self.mdn_norm = nn.LayerNorm(name="mdn_norm")
        self.mdn_conv2 = nn.Dense(2 * a.out_channels, name="mdn_conv2")
        self.mdn_dropout = nn.Dropout(0.1)
        self.proj = nn.Dense(a.out_channels, name="proj")

    def _mdn(self, o_en, train):
        h = self.mdn_conv1(o_en)
        h = nn.relu(self.mdn_norm(h))
        h = self.mdn_dropout(h, deterministic=not train)
        mu_sigma = self.mdn_conv2(h)
        half = self.args.out_channels
        return mu_sigma[..., :half], mu_sigma[..., half:]

    @staticmethod
    def compute_log_probs(mu, log_sigma, y):
        """Gaussian log-likelihood per (token, frame)
        (reference ``align_tts.py:150``): mean over mel dims."""
        # mu, log_sigma: [B, T_en, D]; y: [B, T_de, D]
        inv_var = jnp.exp(-2.0 * log_sigma)
        # mean_d[ (y - mu)^2 / sigma^2 ] via expansion to avoid O(T*T*D) memory blowup
        t1 = jnp.einsum("bxd,byd->bxy", mu**2 * inv_var, jnp.ones_like(y))
        t2 = -2.0 * jnp.einsum("bxd,byd->bxy", mu * inv_var, y)
        t3 = jnp.einsum("bxd,byd->bxy", inv_var, y**2)
        exponential = -0.5 * (t1 + t2 + t3) / mu.shape[-1]
        logp = exponential - 0.5 * jnp.mean(log_sigma, axis=-1)[:, :, None]
        return logp  # [B, T_en, T_de]

    def _encode(self, x, x_lengths, train):
        x_mask = sequence_mask(x_lengths, x.shape[1])[:, :, None].astype(jnp.float32)
        x_emb = self.emb(x)
        o_en = self.encoder(x_emb * x_mask, x_mask, train=train)
        o_en_dp = self.mod_layer(o_en) * x_mask
        return o_en, o_en_dp, x_mask

    def _decode(self, o_en, dr, x_mask, y_mask, train):
        attn_mask = x_mask * jnp.swapaxes(y_mask, 1, 2)
        attn = generate_path(dr, attn_mask)
        o_en_ex = jnp.einsum("bxy,bxc->byc", attn, o_en)
        o_en_ex = self.pos_encoder(o_en_ex, y_mask)
        o_de = self.decoder(o_en_ex, y_mask, train=train)
        return self.proj(o_de) * y_mask, jnp.swapaxes(attn, 1, 2)

    def __call__(self, x, x_lengths, y, y_lengths, aux_input=None, phase: int = -1, train: bool = False):
        o_en, o_en_dp, x_mask = self._encode(x, x_lengths, train)
        T_de = y.shape[1]
        y_mask = sequence_mask(y_lengths, T_de)[:, :, None].astype(jnp.float32)

        mu, log_sigma = self._mdn(o_en, train)
        logp = self.compute_log_probs(mu, log_sigma, y)
        attn_mask = x_mask * jnp.swapaxes(y_mask, 1, 2)
        attn_mas = maximum_path(jax.lax.stop_gradient(logp), attn_mask)
        dr_mas = jnp.sum(attn_mas, axis=-1)  # [B, T_en]

        o_dr_log = self.duration_predictor(
            jax.lax.stop_gradient(o_en_dp), x_mask, train=train
        )[..., 0]
        enc_for_decoder = jax.lax.stop_gradient(o_en) if phase == 1 else o_en
        o_de, attn = self._decode(enc_for_decoder, dr_mas, x_mask, y_mask, train)
        return {
            "model_outputs": o_de,
            "alignments": attn,
            "durations_log": o_dr_log,
            "durations_mas_log": jnp.log1p(dr_mas),
            "mu": mu,
            "log_sigma": log_sigma,
            "logp": logp,
            "x_mask": x_mask,
            "y_mask": y_mask,
        }

    def inference(self, x, x_lengths, aux_input=None, max_frames: int = 1000):
        a = self.args
        o_en, o_en_dp, x_mask = self._encode(x, x_lengths, train=False)
        o_dr_log = self.duration_predictor(o_en_dp, x_mask, train=False)[..., 0]
        o_dr = jnp.maximum(jnp.round((jnp.exp(o_dr_log) - 1) * x_mask[..., 0] * a.length_scale), 1.0)
        o_dr = o_dr * x_mask[..., 0]
        y_lengths = jnp.clip(jnp.sum(o_dr, axis=1), 1, max_frames).astype(jnp.int32)
        y_mask = sequence_mask(y_lengths, max_frames)[:, :, None].astype(jnp.float32)
        o_de, attn = self._decode(o_en, o_dr, x_mask, y_mask, train=False)
        return {"model_outputs": o_de, "alignments": attn, "y_lengths": y_lengths, "y_mask": y_mask}


def align_tts_loss(config: AlignTTSConfig, outputs, batch, phase: int = -1) -> Dict:
    """Phase-weighted composite loss (reference ``losses.py:564`` AlignTTSLoss)."""
    mel, mel_lens, text_lens = batch["mel_input"], batch["mel_lengths"], batch["text_lengths"]
    l_mdn = mdn_loss(outputs["logp"], text_lens, mel_lens)
    l_spec = L.mse_loss_masked(outputs["model_outputs"], mel, mel_lens)
    l_ssim = L.ssim_loss(outputs["model_outputs"], mel, mel_lens)
    l_dur = L.mse_loss_masked(
        outputs["durations_log"][:, :, None], outputs["durations_mas_log"][:, :, None], text_lens
    )
    if phase == 0:
        weights = (1.0, 0.0, 0.0, 0.0)
    elif phase == 1:
        weights = (0.0, 1.0, 1.0, 0.0)
    elif phase == 2:
        weights = (1.0, 1.0, 1.0, 0.0)
    elif phase == 3:
        weights = (0.0, 0.0, 0.0, 1.0)
    else:
        weights = (config.mdn_alpha, config.spec_loss_alpha, config.ssim_alpha, config.dur_loss_alpha)
    w_mdn, w_spec, w_ssim, w_dur = weights
    loss = w_mdn * l_mdn + w_spec * l_spec + w_ssim * l_ssim + w_dur * l_dur
    return {
        "loss": loss,
        "loss_mdn": l_mdn,
        "loss_spec": l_spec,
        "loss_ssim": l_ssim,
        "loss_dur": l_dur,
    }


class AlignTTS:
    def __init__(self, config: AlignTTSConfig):
        self.config = config
        self.module = AlignTTSModule(args=config.model_args)

    @classmethod
    def init_from_config(cls, config: AlignTTSConfig, samples=None):
        from tts_tpu.models.base import init_tokenizer

        tokenizer, config = init_tokenizer(config)
        model = cls(config)
        model.tokenizer = tokenizer
        return model

    def init_params(self, rng, t_en: int = 11, t_de: int = 30):
        a = self.config.model_args
        return self.module.init(
            rng,
            jnp.zeros((1, t_en), jnp.int32),
            jnp.full((1,), t_en, jnp.int32),
            jnp.zeros((1, t_de, a.out_channels)),
            jnp.full((1,), t_de, jnp.int32),
        )

    def forward(self, params, batch, train: bool = False, rngs=None, phase: int = -1):
        return self.module.apply(
            params,
            batch["text_input"],
            batch["text_lengths"],
            batch["mel_input"],
            batch["mel_lengths"],
            phase=phase,
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
        losses = align_tts_loss(self.config, outputs, batch)
        return losses["loss"], {**losses, "outputs": outputs}
