"""VITS network modules (reference ``TTS/tts/layers/vits/networks.py`` and
``stochastic_duration_predictor.py``), time-major flax.

The waveform decoder is the shared :class:`HifiganGenerator`; the
discriminator composes period discriminators + one scale discriminator
(reference ``vits/discriminator.py:50``).
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from tts_tpu.layers.common import Conv1d, LayerNorm
from tts_tpu.layers.transformer import RelativePositionTransformer
from tts_tpu.layers.wavenet import WN
from tts_tpu.ops import sequence_mask
from tts_tpu.vocoder.models.hifigan_discriminator import DiscriminatorP, DiscriminatorS

from .transforms import piecewise_rational_quadratic_transform


class TextEncoder(nn.Module):
    """Token embedding + rel-pos transformer → prior stats
    (reference ``networks.py:29``)."""

    n_vocab: int
    out_channels: int
    hidden_channels: int
    hidden_channels_ffn: int
    num_heads: int
    num_layers: int
    kernel_size: int
    dropout_p: float
    language_emb_dim: int = 0

    @nn.compact
    def __call__(self, x, x_lengths, lang_emb=None, train: bool = False):
        h = nn.Embed(
            self.n_vocab,
            self.hidden_channels,
            embedding_init=nn.initializers.normal(self.hidden_channels**-0.5),
            name="emb",
        )(x)
        h = h * math.sqrt(self.hidden_channels)
        if lang_emb is not None:
            lang = jnp.broadcast_to(
                lang_emb[:, None, :], (h.shape[0], h.shape[1], lang_emb.shape[-1])
            )
            h = jnp.concatenate([h, lang], axis=-1)
        x_mask = sequence_mask(x_lengths, x.shape[1])[:, :, None].astype(h.dtype)
        h = RelativePositionTransformer(
            hidden_channels=self.hidden_channels + self.language_emb_dim,
            out_channels=self.hidden_channels + self.language_emb_dim,
            hidden_channels_ffn=self.hidden_channels_ffn,
            num_heads=self.num_heads,
            num_layers=self.num_layers,
            kernel_size=self.kernel_size,
            dropout_p=self.dropout_p,
            rel_attn_window_size=4,
            name="encoder",
        )(h * x_mask, x_mask, train=train)
        stats = nn.Dense(self.out_channels * 2, name="proj")(h) * x_mask
        m, logs = jnp.split(stats, 2, axis=-1)
        return h, m, logs, x_mask


class PosteriorEncoder(nn.Module):
    """Linear-spec → latent posterior via WaveNet (reference ``networks.py:235``)."""

    in_channels: int
    out_channels: int
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    num_layers: int
    cond_channels: int = 0

    @nn.compact
    def __call__(self, x, x_lengths, g=None, rng=None, train: bool = False):
        x_mask = sequence_mask(x_lengths, x.shape[1])[:, :, None].astype(x.dtype)
        h = nn.Dense(self.hidden_channels, name="pre")(x) * x_mask
        h = WN(
            hidden_channels=self.hidden_channels,
            kernel_size=self.kernel_size,
            dilation_rate=self.dilation_rate,
            num_layers=self.num_layers,
            c_in_channels=self.cond_channels,
            name="enc",
        )(h, x_mask, g=g, train=train)
        stats = nn.Dense(self.out_channels * 2, name="proj")(h) * x_mask
        mean, log_scale = jnp.split(stats, 2, axis=-1)
        if rng is None:
            rng = self.make_rng("noise")
        z = (mean + jax.random.normal(rng, mean.shape) * jnp.exp(log_scale)) * x_mask
        return z, mean, log_scale, x_mask


class ResidualCouplingBlock(nn.Module):
    """Mean-only affine coupling with WN transform (reference ``networks.py:78``)."""

    channels: int
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    num_layers: int
    cond_channels: int = 0
    mean_only: bool = True

    @nn.compact
    def __call__(self, x, x_mask, g=None, reverse: bool = False, train: bool = False):
        half = self.channels // 2
        x0, x1 = x[..., :half], x[..., half:]
        h = nn.Dense(self.hidden_channels, name="pre")(x0) * x_mask
        h = WN(
            hidden_channels=self.hidden_channels,
            kernel_size=self.kernel_size,
            dilation_rate=self.dilation_rate,
            num_layers=self.num_layers,
            c_in_channels=self.cond_channels,
            name="enc",
        )(h, x_mask, g=g, train=train)
        stats = nn.Dense(
            half * (1 if self.mean_only else 2),
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="post",
        )(h) * x_mask
        if self.mean_only:
            m, log_scale = stats, jnp.zeros_like(stats)
        else:
            m, log_scale = jnp.split(stats, 2, axis=-1)
        if not reverse:
            x1 = (m + x1 * jnp.exp(log_scale)) * x_mask
            logdet = jnp.sum(log_scale, axis=(1, 2))
            return jnp.concatenate([x0, x1], -1), logdet
        x1 = (x1 - m) * jnp.exp(-log_scale) * x_mask
        return jnp.concatenate([x0, x1], -1), None


class ResidualCouplingBlocks(nn.Module):
    """Stack of coupling blocks with channel flips (reference ``networks.py:169``)."""

    channels: int
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    num_layers: int
    num_flows: int = 4
    cond_channels: int = 0

    @nn.compact
    def __call__(self, x, x_mask, g=None, reverse: bool = False, train: bool = False):
        blocks = [
            ResidualCouplingBlock(
                channels=self.channels,
                hidden_channels=self.hidden_channels,
                kernel_size=self.kernel_size,
                dilation_rate=self.dilation_rate,
                num_layers=self.num_layers,
                cond_channels=self.cond_channels,
                mean_only=True,
                name=f"flow_{i}",
            )
            for i in range(self.num_flows)
        ]
        if not reverse:
            for block in blocks:
                x, _ = block(x, x_mask, g=g, reverse=False, train=train)
                x = jnp.flip(x, axis=-1)
        else:
            for block in reversed(blocks):
                x = jnp.flip(x, axis=-1)
                x, _ = block(x, x_mask, g=g, reverse=True, train=train)
        return x


class DilatedDepthSeparableConv(nn.Module):
    """DDS conv stack (reference ``stochastic_duration_predictor.py:9``)."""

    channels: int
    kernel_size: int
    num_layers: int
    dropout_p: float = 0.0

    @nn.compact
    def __call__(self, x, x_mask, g=None, train: bool = False):
        if g is not None:
            x = x + g
        for i in range(self.num_layers):
            dilation = self.kernel_size**i
            y = nn.Conv(
                self.channels,
                (self.kernel_size,),
                kernel_dilation=(dilation,),
                feature_group_count=self.channels,
                padding=[((self.kernel_size * dilation - dilation) // 2,) * 2],
                name=f"conv_sep_{i}",
            )(x * x_mask)
            y = nn.gelu(LayerNorm(name=f"norm1_{i}")(y))
            y = nn.Dense(self.channels, name=f"conv_1x1_{i}")(y)
            y = nn.gelu(LayerNorm(name=f"norm2_{i}")(y))
            y = nn.Dropout(self.dropout_p, deterministic=not train)(y)
            x = x + y
        return x * x_mask


class ElementwiseAffine(nn.Module):
    """Learned per-channel affine flow (reference ``:58``)."""

    channels: int

    @nn.compact
    def __call__(self, x, x_mask, g=None, reverse: bool = False, train: bool = False):
        translation = self.param("translation", nn.initializers.zeros, (self.channels,))
        log_scale = self.param("log_scale", nn.initializers.zeros, (self.channels,))
        if not reverse:
            y = (x * jnp.exp(log_scale) + translation) * x_mask
            logdet = jnp.sum(log_scale * x_mask, axis=(1, 2))
            return y, logdet
        return (x - translation) * jnp.exp(-log_scale) * x_mask, None


class ConvFlow(nn.Module):
    """Spline coupling flow over 2 channels (reference ``:75``)."""

    in_channels: int
    hidden_channels: int
    kernel_size: int
    num_layers: int
    num_bins: int = 10
    tail_bound: float = 5.0

    @nn.compact
    def __call__(self, x, x_mask, g=None, reverse: bool = False, train: bool = False):
        half = self.in_channels // 2
        x0, x1 = x[..., :half], x[..., half:]
        h = nn.Dense(self.hidden_channels, name="pre")(x0)
        h = DilatedDepthSeparableConv(
            channels=self.hidden_channels,
            kernel_size=self.kernel_size,
            num_layers=self.num_layers,
            name="convs",
        )(h, x_mask, g=g, train=train)
        h = nn.Dense(
            half * (self.num_bins * 3 - 1),
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="proj",
        )(h) * x_mask  # [B, T, half*(3bins-1)]
        b, t, _ = x0.shape
        h = h.reshape(b, t, half, self.num_bins * 3 - 1)
        denom = math.sqrt(self.hidden_channels)
        uw = h[..., : self.num_bins] / denom
        uh = h[..., self.num_bins : 2 * self.num_bins] / denom
        ud = h[..., 2 * self.num_bins :]
        # spline operates elementwise on x1 [B, T, half]
        x1_new, logabsdet = piecewise_rational_quadratic_transform(
            x1, uw, uh, ud, inverse=reverse, tails="linear", tail_bound=self.tail_bound
        )
        x_out = jnp.concatenate([x0, x1_new], -1) * x_mask
        logdet = jnp.sum(logabsdet * x_mask, axis=(1, 2))
        if not reverse:
            return x_out, logdet
        return x_out, None


class StochasticDurationPredictor(nn.Module):
    """Flow-based duration model (reference ``:133``).

    Training (``reverse=False``) returns the per-sample duration NLL;
    inference samples log-durations from noise.
    """

    in_channels: int
    hidden_channels: int
    kernel_size: int
    dropout_p: float
    num_flows: int = 4
    cond_channels: int = 0
    language_emb_dim: int = 0

    def setup(self):
        self.pre = nn.Dense(self.hidden_channels, name="pre")
        self.convs = DilatedDepthSeparableConv(
            channels=self.hidden_channels,
            kernel_size=self.kernel_size,
            num_layers=3,
            dropout_p=self.dropout_p,
            name="convs",
        )
        self.proj = nn.Dense(self.hidden_channels, name="proj")
        self.flows = [ElementwiseAffine(2, name="flow_affine")] + [
            ConvFlow(2, self.hidden_channels, self.kernel_size, num_layers=3, name=f"flow_{i}")
            for i in range(self.num_flows)
        ]
        self.post_pre = nn.Dense(self.hidden_channels, name="post_pre")
        self.post_convs = DilatedDepthSeparableConv(
            channels=self.hidden_channels,
            kernel_size=self.kernel_size,
            num_layers=3,
            dropout_p=self.dropout_p,
            name="post_convs",
        )
        self.post_proj = nn.Dense(self.hidden_channels, name="post_proj")
        self.post_flows = [ElementwiseAffine(2, name="post_flow_affine")] + [
            ConvFlow(2, self.hidden_channels, self.kernel_size, num_layers=3, name=f"post_flow_{i}")
            for i in range(self.num_flows)
        ]
        if self.cond_channels:
            self.cond = nn.Dense(self.hidden_channels, name="cond")
        if self.language_emb_dim:
            self.cond_lang = nn.Dense(self.hidden_channels, name="cond_lang")

    def __call__(
        self,
        x,
        x_mask,
        dr=None,
        g=None,
        lang_emb=None,
        reverse: bool = False,
        noise_scale: float = 1.0,
        rng: Optional[jax.Array] = None,
        train: bool = False,
    ):
        x = self.pre(x)
        if g is not None:
            x = x + self.cond(g)[:, None, :]
        if lang_emb is not None:
            x = x + self.cond_lang(lang_emb)[:, None, :]
        x = self.convs(x, x_mask, train=train)
        x = self.proj(x) * x_mask

        if not reverse:
            assert dr is not None
            if rng is None:
                rng = self.make_rng("noise")
            h = self.post_pre(dr)
            h = self.post_convs(h, x_mask, train=train)
            h = self.post_proj(h) * x_mask
            rng, sub = jax.random.split(rng)
            noise = jax.random.normal(sub, (dr.shape[0], dr.shape[1], 2)) * x_mask
            z_q = noise
            logdet_tot_q = 0.0
            for idx, flow in enumerate(self.post_flows):
                z_q, logdet_q = flow(z_q, x_mask, g=(x + h), train=train)
                logdet_tot_q = logdet_tot_q + logdet_q
                if idx > 0:
                    z_q = jnp.flip(z_q, axis=-1)
            z_u, z_v = z_q[..., :1], z_q[..., 1:]
            u = nn.sigmoid(z_u) * x_mask
            z0 = (dr - u) * x_mask
            logdet_tot_q = logdet_tot_q + jnp.sum(
                (nn.log_sigmoid(z_u) + nn.log_sigmoid(-z_u)) * x_mask, axis=(1, 2)
            )
            nll_posterior = (
                jnp.sum(-0.5 * (math.log(2 * math.pi) + noise**2) * x_mask, axis=(1, 2))
                - logdet_tot_q
            )
            z0 = jnp.log(jnp.clip(z0, min=1e-5)) * x_mask
            logdet_tot = jnp.sum(-z0, axis=(1, 2))
            z = jnp.concatenate([z0, z_v], -1)
            for idx, flow in enumerate(self.flows):
                z, logdet = flow(z, x_mask, g=x, reverse=False, train=train)
                logdet_tot = logdet_tot + logdet
                if idx > 0:
                    z = jnp.flip(z, axis=-1)
            nll_flow = (
                jnp.sum(0.5 * (math.log(2 * math.pi) + z**2) * x_mask, axis=(1, 2)) - logdet_tot
            )
            return nll_flow + nll_posterior

        # inference: run flows backwards from noise
        if rng is None:
            rng = self.make_rng("noise")
        flows = list(reversed(self.flows))
        flows = flows[:-2] + [flows[-1]]  # drop the extra flow (reference :224)
        z = jax.random.normal(rng, (x.shape[0], x.shape[1], 2)) * noise_scale
        for flow in flows:
            z = jnp.flip(z, axis=-1)
            z, _ = flow(z, x_mask, g=x, reverse=True, train=train)
        logw = z[..., :1]
        return logw


class VitsDiscriminator(nn.Module):
    """MPD (periods 2,3,5,7,11) + one scale discriminator
    (reference ``vits/discriminator.py:50``)."""

    periods: Tuple[int, ...] = (2, 3, 5, 7, 11)
    width_mult: float = 1.0

    @nn.compact
    def __call__(self, x_hat: Optional[jnp.ndarray], x: Optional[jnp.ndarray] = None):
        """Returns (scores_hat, feats_hat, scores_real, feats_real)."""
        nets = [DiscriminatorS(width_mult=self.width_mult, name="disc_s")] + [
            DiscriminatorP(p, width_mult=self.width_mult, name=f"disc_p{p}")
            for p in self.periods
        ]
        scores_hat: List = []
        feats_hat: List = []
        scores_real: List = []
        feats_real: List = []
        for net in nets:
            if x_hat is not None:
                s, f = net(x_hat)
                scores_hat.append(s)
                feats_hat.append(f)
            if x is not None:
                s, f = net(x)
                scores_real.append(s)
                feats_real.append(f)
        return scores_hat, feats_hat, scores_real, feats_real
