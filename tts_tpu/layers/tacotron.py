"""Tacotron/Tacotron2 building blocks (reference
``TTS/tts/layers/tacotron/{tacotron2,attentions,common_layers}.py``).

The autoregressive decoder is a single ``nn.scan`` over decoder steps —
the per-step cell (prenet → attention LSTM → location-sensitive attention →
decoder LSTM → projection + stopnet) is traced once and unrolled by XLA,
instead of the reference's Python step loop.

Norm note: ConvBN blocks support ``norm_type='layer'`` (training, shard-
friendly) or ``'folded'`` (per-channel scale/shift for converted torch
BatchNorm running stats at inference).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .common import Conv1d


def _betabinom_pmf(n: int, a: float, b: float) -> np.ndarray:
    """Beta-binomial pmf over k=0..n (the DCA alignment prior,
    reference ``attentions.py:388`` via scipy.stats.betabinom)."""

    def log_beta(x, y):
        return math.lgamma(x) + math.lgamma(y) - math.lgamma(x + y)

    logp = [
        math.lgamma(n + 1) - math.lgamma(k + 1) - math.lgamma(n - k + 1)
        + log_beta(k + a, n - k + b) - log_beta(a, b)
        for k in range(n + 1)
    ]
    return np.exp(np.asarray(logp, np.float64)).astype(np.float32)


class Prenet(nn.Module):
    """Bottleneck MLP (reference ``common_layers.py`` Prenet); set
    ``dropout_at_inference`` to keep dropout active at inference (it can be
    load-bearing for Tacotron output variation; reference default off)."""

    out_features: Tuple[int, ...] = (256, 256)
    prenet_type: str = "original"
    prenet_dropout: bool = True
    dropout_at_inference: bool = False
    use_bias: bool = True  # reference default; Tacotron2's decoder uses False

    @nn.compact
    def __call__(self, x, train: bool = True):
        for i, size in enumerate(self.out_features):
            x = nn.Dense(size, use_bias=self.use_bias, name=f"linear_{i}")(x)
            if self.prenet_type == "bn":
                x = nn.LayerNorm(name=f"norm_{i}")(x)
            x = nn.relu(x)
            if self.prenet_dropout:
                x = nn.Dropout(
                    0.5, deterministic=not (train or self.dropout_at_inference)
                )(x)
        return x


class ConvBNBlock(nn.Module):
    """conv → norm → activation → dropout (reference ``tacotron2.py:11``)."""

    out_channels: int
    kernel_size: int
    activation: Optional[str] = None
    norm_type: str = "layer"

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv1d(self.out_channels, self.kernel_size, name="conv")(x)
        if self.norm_type == "layer":
            x = nn.LayerNorm(name="norm")(x)
        elif self.norm_type == "folded":
            scale = self.param("scale", nn.initializers.ones, (self.out_channels,))
            shift = self.param("shift", nn.initializers.zeros, (self.out_channels,))
            x = x * scale + shift
        if self.activation == "relu":
            x = nn.relu(x)
        elif self.activation == "tanh":
            x = jnp.tanh(x)
        return nn.Dropout(0.5, deterministic=not train)(x)


class Tacotron2Encoder(nn.Module):
    """3×ConvBN + biLSTM (reference ``tacotron2.py:73``)."""

    in_out_channels: int = 512
    norm_type: str = "layer"

    @nn.compact
    def __call__(self, x, x_mask, train: bool = False):
        for i in range(3):
            x = ConvBNBlock(
                self.in_out_channels, 5, "relu", self.norm_type, name=f"conv_{i}"
            )(x * x_mask, train=train)
        half = self.in_out_channels // 2
        # name the cells (not the RNN wrapper): nn.RNN doesn't adopt a cell
        # built in the enclosing scope, so the params live under the cell name
        # seq_lengths keeps the backward pass anchored at the true sequence
        # end, so outputs at valid positions are invariant to trailing padding
        lengths = jnp.sum(x_mask[:, :, 0], axis=1).astype(jnp.int32)
        fwd = nn.RNN(nn.OptimizedLSTMCell(half, name="lstm_fwd"))(
            x * x_mask, seq_lengths=lengths
        )
        bwd = nn.RNN(nn.OptimizedLSTMCell(half, name="lstm_bwd"), reverse=True, keep_order=True)(
            x * x_mask, seq_lengths=lengths
        )
        return jnp.concatenate([fwd, bwd], axis=-1) * x_mask


class Postnet(nn.Module):
    """5×ConvBN refiner (reference ``tacotron2.py:47``)."""

    in_out_channels: int
    num_convs: int = 5
    norm_type: str = "layer"

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.num_convs):
            last = i == self.num_convs - 1
            x = ConvBNBlock(
                self.in_out_channels if last else 512,
                5,
                None if last else "tanh",
                self.norm_type,
                name=f"conv_{i}",
            )(x, train=train)
        return x


class Tacotron2DecoderCell(nn.Module):
    """One AR decoder step (reference ``Decoder.decode``, ``tacotron2.py:238``).

    Carry: (attn_h, attn_c, dec_h, dec_c, context, attn_w, attn_w_cum).
    Input per step: previous frame(s) ``[B, r*C_mel]``.
    """

    in_channels: int = 512  # encoder output dim
    frame_channels: int = 80
    r: int = 1
    # projection width multiplier for gradual training: the linear projection
    # is sized ``frame_channels * r_init`` and emission slices the first
    # ``r * frame_channels`` so the reduction factor can shrink mid-training
    # without changing parameter shapes (reference tacotron2.py:203,292).
    # 0 → use ``r``.
    r_init: int = 0
    query_dim: int = 1024
    decoder_rnn_dim: int = 1024
    prenet_dim: int = 256
    attn_dim: int = 128
    prenet_type: str = "original"
    prenet_dropout: bool = True
    location_attn: bool = True
    attn_norm: str = "softmax"
    separate_stopnet: bool = True
    attn_type: str = "original"  # "original" | "graves"
    attn_K: int = 5  # Graves attention heads
    use_forward_attn: bool = False
    trans_agent: bool = False
    attn_win: bool = False  # window attention around the running peak

    @nn.compact
    def __call__(self, carry, memory_t, inputs, processed_inputs, input_mask, train: bool = False):
        (attn_h, attn_c, dec_h, dec_c, context, attn_w, attn_w_cum, alpha, u, mu_prev) = carry
        T_in = inputs.shape[1]

        processed = Prenet(
            (self.prenet_dim, self.prenet_dim),
            self.prenet_type,
            self.prenet_dropout,
            use_bias=False,  # reference tacotron2.py:179 passes bias=False
            name="prenet",
        )(memory_t, train=train)

        attn_cell = nn.OptimizedLSTMCell(self.query_dim, name="attention_rnn")
        (attn_c, attn_h), _ = attn_cell(
            (attn_c, attn_h), jnp.concatenate([processed, context], -1)
        )
        query = nn.Dropout(0.1, deterministic=not train)(attn_h)

        if self.attn_type == "dynamic_convolution":
            # monotonic dynamic convolution attention (reference
            # attentions.py:323, arXiv:1910.10288); defaults from init_attn
            # :472-481 (8 filters, kernel 21, prior len 11, alpha/beta .1/.9)
            F_dyn, K = 8, 21
            prior = _betabinom_pmf(10, 0.1, 0.9)  # len 11
            # causal prior filter: out[t] = sum_j prior[j] * w[t-j]
            prior_f = jax.vmap(lambda w: jnp.convolve(w, jnp.asarray(prior), mode="full")[:T_in])(
                attn_w
            )
            prior_log = jnp.log(jnp.clip(prior_f, min=1e-6))
            G = nn.Dense(F_dyn * K, use_bias=False, name="key_layer")(
                jnp.tanh(nn.Dense(self.attn_dim, name="query_layer")(query))
            )
            # SAME-padded sliding windows of the previous attention
            wpad = jnp.pad(attn_w, ((0, 0), (K // 2, K // 2)))
            win = wpad[:, jnp.arange(T_in)[:, None] + jnp.arange(K)[None, :]]  # [B,T,K]
            dynamic = jnp.einsum("btk,bfk->btf", win, G.reshape(-1, F_dyn, K))
            static = nn.Conv(
                F_dyn, (K,), padding=[(K // 2, K // 2)], use_bias=False,
                name="static_filter_conv",
            )(attn_w[:, :, None])
            energies = nn.Dense(1, use_bias=False, name="v")(
                jnp.tanh(
                    nn.Dense(self.attn_dim, use_bias=False, name="static_filter_layer")(static)
                    + nn.Dense(self.attn_dim, name="dynamic_filter_layer")(dynamic)
                )
            )[..., 0] + prior_log
            alignment = nn.softmax(energies, axis=-1)
            # reference masks AFTER the softmax with 1e-8, no renorm (:425)
            alignment = jnp.where(input_mask, alignment, 1e-8)
        elif self.attn_type == "graves":
            # Graves GMM attention (reference attentions.py:40)
            gbk = nn.Dense(self.query_dim, name="graves_l1")(query)
            gbk = nn.Dense(3 * self.attn_K, name="graves_l2")(nn.relu(gbk))
            g_t, b_t, k_t = jnp.split(gbk, 3, axis=-1)
            sig_t = nn.softplus(b_t) + 1e-5
            mu_t = mu_prev + nn.softplus(k_t)
            g_t = nn.softmax(g_t, axis=-1) + 1e-5
            j = jnp.arange(T_in, dtype=jnp.float32)[None, None, :] + 0.5
            phi = g_t[..., None] * jnp.exp(
                -0.5 * ((mu_t[..., None] - j) / sig_t[..., None]) ** 2
            )
            alignment = 0.3989422917366028 * jnp.sum(phi, axis=1)  # [B, T]
            alignment = jnp.where(input_mask, alignment, 1e-8)
            alignment = alignment / jnp.sum(alignment, -1, keepdims=True)
            mu_prev = mu_t
        else:
            # location-sensitive additive attention (reference attentions.py:127)
            processed_query = nn.Dense(self.attn_dim, use_bias=False, name="query_layer")(query)
            energies = processed_inputs + processed_query[:, None, :]
            if self.location_attn:
                attn_cat = jnp.stack([attn_w, attn_w_cum], axis=-1)  # [B, T, 2]
                loc = nn.Conv(32, (31,), padding=[(15, 15)], use_bias=False, name="location_conv")(
                    attn_cat
                )
                loc = nn.Dense(self.attn_dim, use_bias=False, name="location_dense")(loc)
                energies = energies + loc
            scores = nn.Dense(1, name="v")(jnp.tanh(energies))[..., 0]  # [B, T]
            scores = jnp.where(input_mask, scores, -jnp.inf)
            if self.attn_win:
                # attention windowing around the previous peak
                # (reference init_win_idx: back=2, front=6)
                peak = jnp.argmax(attn_w, axis=-1)
                pos = jnp.arange(T_in)[None, :]
                win = (pos >= peak[:, None] - 2) & (pos <= peak[:, None] + 6)
                scores = jnp.where(win, scores, -jnp.inf)
            if self.attn_norm == "sigmoid":
                alignment = nn.sigmoid(scores) / jnp.sum(
                    nn.sigmoid(scores), axis=-1, keepdims=True
                )
            else:
                alignment = nn.softmax(scores, axis=-1)
            if self.use_forward_attn:
                # forward attention recursion (reference attentions.py:260)
                fwd_shifted = jnp.pad(alpha[:, :-1], ((0, 0), (1, 0)))
                alpha = ((1 - u) * alpha + u * fwd_shifted + 1e-8) * alignment
                alpha = alpha / jnp.sum(alpha, axis=-1, keepdims=True)
                alignment = alpha
        context = jnp.einsum("bt,btc->bc", alignment, inputs)
        if self.use_forward_attn and self.trans_agent:
            # transition agent gates move/stay (reference :312)
            u = nn.sigmoid(
                nn.Dense(1, name="trans_agent")(jnp.concatenate([context, query], -1))
            )
        attn_w = alignment
        attn_w_cum = attn_w_cum + alignment

        dec_cell = nn.OptimizedLSTMCell(self.decoder_rnn_dim, name="decoder_rnn")
        (dec_c, dec_h), _ = dec_cell((dec_c, dec_h), jnp.concatenate([query, context], -1))
        dec_h_d = nn.Dropout(0.1, deterministic=not train)(dec_h)

        dec_hc = jnp.concatenate([dec_h_d, context], -1)
        decoder_output = nn.Dense(
            self.frame_channels * (self.r_init or self.r), name="linear_projection"
        )(dec_hc)
        # stopnet consumes the full r_init-wide projection (reference :286)
        stop_in = jnp.concatenate([dec_h_d, decoder_output], -1)
        if self.separate_stopnet:
            stop_in = jax.lax.stop_gradient(stop_in)
        stop_token = nn.Dense(1, name="stopnet")(
            nn.Dropout(0.1, deterministic=not train)(stop_in)
        )
        # emit only the active reduction-rate frames (reference :292)
        decoder_output = decoder_output[:, : self.frame_channels * self.r]

        new_carry = (attn_h, attn_c, dec_h, dec_c, context, attn_w, attn_w_cum, alpha, u, mu_prev)
        return new_carry, (decoder_output, stop_token[..., 0], alignment)

    def init_carry(self, B: int, T_in: int, in_channels: int):
        z = jnp.zeros
        # forward-attention alpha starts fully on the first token
        alpha0 = jnp.concatenate(
            [jnp.ones((B, 1)), jnp.full((B, T_in - 1), 1e-7)], axis=1
        )
        # DCA starts with all attention on token 0 (reference init_states
        # attentions.py:438); other variants start from zeros
        if self.attn_type == "dynamic_convolution":
            w0 = jnp.concatenate([jnp.ones((B, 1)), z((B, T_in - 1))], axis=1)
        else:
            w0 = z((B, T_in))
        return (
            z((B, self.query_dim)),
            z((B, self.query_dim)),
            z((B, self.decoder_rnn_dim)),
            z((B, self.decoder_rnn_dim)),
            z((B, in_channels)),
            w0,
            z((B, T_in)),
            alpha0,
            0.5 * jnp.ones((B, 1)),
            z((B, self.attn_K)),
        )
