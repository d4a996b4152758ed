"""Overflow / NeuralHMM-TTS — autoregressive neural hidden Markov models
(reference ``TTS/tts/models/{overflow,neuralhmm_tts}.py`` +
``layers/overflow/neural_hmm.py``).

The log-space forward algorithm runs as one ``lax.scan`` over mel frames:
each step advances the AR memory LSTM, evaluates per-state Gaussian
emissions (a batched matmul) and the stay/advance transition recursion.
Overflow adds a Glow post-flow over mels (reusing
:class:`tts_tpu.layers.glow.GlowDecoder`).
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from tts_tpu.layers.glow import GlowDecoder
from tts_tpu.layers.tacotron import ConvBNBlock, Prenet
from tts_tpu.ops import sequence_mask

from .config import NeuralhmmTTSConfig, OverflowConfig

_NEG = -1e30


def _log_clamped(x, eps: float = 1e-4):
    return jnp.log(jnp.clip(x, min=eps))


class OverflowEncoder(nn.Module):
    """Conv + biLSTM encoder emitting ``state_per_phone`` states per token
    (reference ``layers/overflow/common_layers.py:12``)."""

    num_chars: int
    state_per_phone: int
    in_out_channels: int = 512
    n_convolutions: int = 3
    norm_type: str = "layer"

    @nn.compact
    def __call__(self, x, x_lengths, train: bool = False):
        emb = nn.Embed(self.num_chars, self.in_out_channels, name="emb")(x)
        x_mask = sequence_mask(x_lengths, x.shape[1])[:, :, None].astype(jnp.float32)
        h = emb
        for i in range(self.n_convolutions):
            h = ConvBNBlock(self.in_out_channels, 5, "relu", self.norm_type, name=f"conv_{i}")(
                h * x_mask, train=train
            )
        half = self.in_out_channels // 2
        # name the CELLS (an nn.RNN name= tags only the wrapper; params would
        # land as OptimizedLSTMCell_N otherwise)
        # seq_lengths anchors the backward pass at the true sequence end so
        # outputs at valid positions are invariant to trailing padding
        fwd = nn.RNN(nn.OptimizedLSTMCell(half * self.state_per_phone, name="lstm_fwd"))(
            h * x_mask, seq_lengths=x_lengths
        )
        bwd = nn.RNN(
            nn.OptimizedLSTMCell(half * self.state_per_phone, name="lstm_bwd"),
            reverse=True, keep_order=True,
        )(h * x_mask, seq_lengths=x_lengths)
        o = jnp.concatenate([fwd, bwd], -1)  # [B, T, state_per_phone * C]
        B, T, _ = o.shape
        o = o.reshape(B, T * self.state_per_phone, self.in_out_channels)
        state_lengths = x_lengths * self.state_per_phone
        return o, state_lengths


class Outputnet(nn.Module):
    """(memory, state) → per-state mean/std/transition
    (reference ``common_layers.py:140``)."""

    frame_channels: int
    outputnet_size: Tuple[int, ...]
    flat_start_mean: float = 0.0
    flat_start_std: float = 1.0
    flat_start_transition_p: float = 0.14
    std_floor: float = 1e-2

    @nn.compact
    def __call__(self, ar_mels, inputs):
        """ar_mels [B, D_mem]; inputs [B, N, D_enc] → (mean, std, trans [B,N,*])."""
        B, N, _ = inputs.shape
        h = jnp.concatenate(
            [jnp.broadcast_to(ar_mels[:, None], (B, N, ar_mels.shape[-1])), inputs], -1
        )
        for i, size in enumerate(self.outputnet_size):
            h = nn.relu(nn.Dense(size, name=f"layer_{i}")(h))
        # flat-start init: zero weights, bias set so the model starts at the
        # dataset-mean emission / uniform transition (reference ParameterModel)
        inv_softplus_std = math.log(math.expm1(max(self.flat_start_std, 1e-4)))
        logit_p = math.log(self.flat_start_transition_p / (1 - self.flat_start_transition_p))
        bias_init = jnp.concatenate(
            [
                jnp.full((self.frame_channels,), self.flat_start_mean),
                jnp.full((self.frame_channels,), inv_softplus_std),
                jnp.full((1,), logit_p),
            ]
        )
        out = nn.Dense(
            2 * self.frame_channels + 1,
            kernel_init=nn.initializers.zeros,
            bias_init=lambda key, shape, dtype=jnp.float32: bias_init,
            name="proj",
        )(h)
        mean = out[..., : self.frame_channels]
        std = jnp.maximum(nn.softplus(out[..., self.frame_channels : 2 * self.frame_channels]), self.std_floor)
        transition_vector = out[..., -1]
        return mean, std, transition_vector


class NeuralHMMCore(nn.Module):
    """The AR memory + forward-algorithm core."""

    frame_channels: int
    memory_rnn_dim: int
    prenet_dim: int
    prenet_n_layers: int
    prenet_dropout: float
    outputnet_size: Tuple[int, ...]
    flat_start_params: dict
    std_floor: float

    def setup(self):
        self.prenet = Prenet(
            out_features=(self.prenet_dim,) * self.prenet_n_layers,
            prenet_dropout=self.prenet_dropout > 0,
            name="prenet",
        )
        self.memory_rnn = nn.OptimizedLSTMCell(self.memory_rnn_dim, name="memory_rnn")
        self.output_net = Outputnet(
            frame_channels=self.frame_channels,
            outputnet_size=tuple(self.outputnet_size),
            flat_start_mean=self.flat_start_params.get("mean", 0.0),
            flat_start_std=self.flat_start_params.get("std", 1.0),
            flat_start_transition_p=self.flat_start_params.get("transition_p", 0.14),
            std_floor=self.std_floor,
            name="output_net",
        )

    def _emission_logp(self, x_t, mean, std, state_mask):
        """Gaussian log-prob summed over mel dims (reference EmissionModel)."""
        logp = (
            -0.5 * ((x_t[:, None, :] - mean) / std) ** 2
            - jnp.log(std)
            - 0.5 * math.log(2 * math.pi)
        )
        return jnp.sum(logp, axis=-1) * state_mask  # [B, N]

    def _transition(self, log_alpha, transition_vector, state_mask):
        """Stay/advance recursion (reference TransitionModel)."""
        log_stay = _log_clamped(nn.sigmoid(-transition_vector))
        log_move = _log_clamped(nn.sigmoid(transition_vector))
        staying = log_alpha + log_stay
        leaving = jnp.roll(log_alpha + log_move, 1, axis=1)
        leaving = leaving.at[:, 0].set(_NEG)
        out = jnp.logaddexp(staying, leaving)
        return jnp.where(state_mask > 0, out, _NEG)

    def __call__(self, inputs, state_lengths, mels, mel_lens, train: bool = False):
        """Forward algorithm → (log_probs [B], log_alpha [B,T,N], means [B,T,N,C])."""
        B, N, _ = inputs.shape
        T = mels.shape[1]
        state_mask = sequence_mask(state_lengths, N).astype(jnp.float32)

        # go frame prepended (reference _add_go_token)
        ar_inputs = jnp.concatenate([jnp.zeros((B, 1, self.frame_channels)), mels[:, :-1]], 1)
        log_state_priors = jnp.full((N,), _NEG).at[0].set(0.0)

        def step(mdl, carry, xs):
            (h_mem, c_mem, log_alpha, t) = carry
            ar_t, x_t = xs  # [B, C], [B, C]
            pre = mdl.prenet(ar_t, train=train)
            (c_mem, h_mem), _ = mdl.memory_rnn((c_mem, h_mem), pre)
            mean, std, trans = mdl.output_net(h_mem, inputs)
            emit = mdl._emission_logp(x_t, mean, std, state_mask)
            first = log_state_priors[None] + emit
            later = emit + mdl._transition(log_alpha, trans, state_mask)
            log_alpha_temp = jnp.where(t == 0, first, later)
            log_alpha_temp = jnp.where(state_mask > 0, log_alpha_temp, _NEG)
            log_c_t = jax.scipy.special.logsumexp(log_alpha_temp, axis=1)
            new_log_alpha = log_alpha_temp - log_c_t[:, None]
            return (h_mem, c_mem, new_log_alpha, t + 1), (log_c_t, new_log_alpha, trans, mean)

        scan = nn.scan(step, variable_broadcast="params", split_rngs={"params": False, "dropout": True})
        carry0 = (
            jnp.zeros((B, self.memory_rnn_dim)),
            jnp.zeros((B, self.memory_rnn_dim)),
            jnp.zeros((B, N)),
            jnp.asarray(0, jnp.int32),
        )
        xs = (jnp.moveaxis(ar_inputs, 1, 0), jnp.moveaxis(mels, 1, 0))
        _, (log_c, log_alpha_scaled, transitions, means) = scan(self, carry0, xs)
        log_c = jnp.moveaxis(log_c, 0, 1)  # [B, T]
        log_alpha_scaled = jnp.moveaxis(log_alpha_scaled, 0, 1)  # [B, T, N]
        transitions = jnp.moveaxis(transitions, 0, 1)  # [B, T, N]
        means = jnp.moveaxis(means, 0, 1)  # [B, T, N, C]

        t_mask = sequence_mask(mel_lens, T).astype(jnp.float32)
        log_c = log_c * t_mask

        # absorption: prob of leaving the final state at the last frame
        last_idx = (mel_lens - 1)[:, None, None]
        last_alpha = jnp.take_along_axis(log_alpha_scaled, jnp.broadcast_to(last_idx, (B, 1, N)), 1)[:, 0]
        last_trans = jnp.take_along_axis(transitions, jnp.broadcast_to(last_idx, (B, 1, N)), 1)[:, 0]
        last_alpha = jnp.where(state_mask > 0, last_alpha, _NEG)
        log_p_move = _log_clamped(nn.sigmoid(last_trans))
        last_state = jax.nn.one_hot(state_lengths - 1, N)
        log_p_move = jnp.where(last_state > 0, log_p_move, _NEG)
        sum_final_log_c = jax.scipy.special.logsumexp(last_alpha + log_p_move, axis=1)

        log_probs = jnp.sum(log_c, axis=1) + sum_final_log_c
        return log_probs, log_alpha_scaled, transitions, means

    def sample(self, inputs, state_lengths, rng, max_sampling_time: int = 1000,
               sampling_temp: float = 0.0, duration_threshold: float = 0.43,
               deterministic_transition: bool = True):
        """AR sampling (reference ``neural_hmm.py:386``) as a scan with a
        state-index carry; returns mels [B, T_max, C] and lengths."""
        B, N, _ = inputs.shape

        def step(mdl, carry, rng_t):
            h_mem, c_mem, prev_frame, state_idx, done, t_len = carry
            pre = mdl.prenet(prev_frame, train=False)
            (c_mem, h_mem), _ = mdl.memory_rnn((c_mem, h_mem), pre)
            mean, std, trans = mdl.output_net(h_mem, inputs)
            state_oh = jax.nn.one_hot(state_idx, N)
            mean_t = jnp.einsum("bn,bnc->bc", state_oh, mean)
            std_t = jnp.einsum("bn,bnc->bc", state_oh, std)
            r1, r2 = jax.random.split(rng_t)
            frame = mean_t + (
                sampling_temp * std_t * jax.random.normal(r1, mean_t.shape)
                if sampling_temp > 0
                else 0.0
            )
            trans_t = jnp.einsum("bn,bn->b", state_oh, nn.sigmoid(trans))
            if deterministic_transition:
                move = trans_t > duration_threshold
            else:
                move = jax.random.uniform(r2, trans_t.shape) < trans_t
            new_state = jnp.where(move & ~done, state_idx + 1, state_idx)
            new_done = done | (new_state >= state_lengths)
            t_len = t_len + (~new_done).astype(jnp.int32)
            return (h_mem, c_mem, frame, new_state, new_done, t_len), (frame, new_done)

        scan = nn.scan(step, variable_broadcast="params",
                       split_rngs={"params": False, "dropout": True})
        carry0 = (
            jnp.zeros((B, self.memory_rnn_dim)),
            jnp.zeros((B, self.memory_rnn_dim)),
            jnp.zeros((B, self.frame_channels)),
            jnp.zeros((B,), jnp.int32),
            jnp.zeros((B,), bool),
            jnp.zeros((B,), jnp.int32),
        )
        rngs = jax.random.split(rng, max_sampling_time)
        (_, _, _, _, _, mel_lens), (frames, dones) = scan(self, carry0, rngs)
        mels = jnp.moveaxis(frames, 0, 1)
        valid = ~jnp.moveaxis(dones, 0, 1)
        mels = mels * valid[:, :, None]
        return mels, jnp.maximum(mel_lens, 1)


class NeuralhmmTTSModule(nn.Module):
    config: NeuralhmmTTSConfig
    use_post_flow: bool = False

    def setup(self):
        c = self.config
        self.encoder = OverflowEncoder(
            num_chars=c.num_chars,
            state_per_phone=c.state_per_phone,
            in_out_channels=c.encoder_in_out_features,
            n_convolutions=c.encoder_n_convolutions,
            norm_type=getattr(c, "norm_type", "layer"),
            name="encoder",
        )
        self.neural_hmm = NeuralHMMCore(
            frame_channels=c.out_channels,
            memory_rnn_dim=c.memory_rnn_dim,
            prenet_dim=c.prenet_dim,
            prenet_n_layers=c.prenet_n_layers,
            prenet_dropout=c.prenet_dropout,
            outputnet_size=tuple(c.outputnet_size),
            flat_start_params=c.flat_start_params,
            std_floor=c.std_floor,
            name="neural_hmm",
        )
        if self.use_post_flow:
            self.decoder = GlowDecoder(
                in_channels=c.out_channels,
                hidden_channels=c.hidden_channels_dec,
                kernel_size=c.kernel_size_dec,
                dilation_rate=c.dilation_rate,
                num_flow_blocks=c.num_flow_blocks_dec,
                num_coupling_layers=c.num_block_layers,
                dropout_p=c.dropout_p_dec,
                num_splits=c.num_splits,
                num_squeeze=c.num_squeeze,
                sigmoid_scale=c.sigmoid_scale,
                name="decoder",
            )

    def __call__(self, text, text_lengths, mels, mel_lengths, train: bool = False):
        c = self.config
        mels = (mels - c.mel_statistics_mean) / c.mel_statistics_std
        enc, state_lengths = self.encoder(text, text_lengths, train=train)
        z = mels
        logdet = 0.0
        if self.use_post_flow:
            y_mask = sequence_mask(mel_lengths, mels.shape[1])[:, :, None].astype(jnp.float32)
            z, logdet, _ = self.decoder(mels * y_mask, y_mask, reverse=False, train=train)
        log_probs, log_alpha, transitions, means = self.neural_hmm(
            enc, state_lengths, z, mel_lengths, train=train
        )
        # NLL per valid frame (reference NLLLoss: -mean(log_prob)/frames)
        loss = -jnp.sum(log_probs + (logdet if self.use_post_flow else 0.0)) / jnp.sum(mel_lengths)
        return {
            "log_probs": log_probs,
            "loss": loss,
            "alignments": jnp.exp(log_alpha),
            "means": means,
        }

    def inference(self, text, text_lengths, rng=None, max_sampling_time: int = 400,
                  sampling_temp: float = 0.0):
        c = self.config
        rng = rng if rng is not None else self.make_rng("noise")
        enc, state_lengths = self.encoder(text, text_lengths, train=False)
        mels, mel_lens = self.neural_hmm.sample(
            enc, state_lengths, rng,
            max_sampling_time=max_sampling_time,
            sampling_temp=sampling_temp,
            duration_threshold=c.duration_threshold,
            deterministic_transition=c.deterministic_transition,
        )
        if self.use_post_flow:
            y_mask = sequence_mask(mel_lens, mels.shape[1])[:, :, None].astype(jnp.float32)
            mels, _, _ = self.decoder(mels, y_mask, reverse=True, train=False)
        mels = mels * c.mel_statistics_std + c.mel_statistics_mean
        return {"model_outputs": mels, "y_lengths": mel_lens}


class _HMMBase:
    module_cls_flag = False

    def __init__(self, config):
        self.config = config
        self.module = NeuralhmmTTSModule(config=config, use_post_flow=self.use_post_flow)

    @classmethod
    def init_from_config(cls, config, samples=None):
        from tts_tpu.models.base import init_tokenizer

        tokenizer, config = init_tokenizer(config)
        model = cls(config)
        model.tokenizer = tokenizer
        return model

    def init_params(self, rng, t_en: int = 7, t_de: int = 16):
        return self.module.init(
            {"params": rng, "dropout": jax.random.fold_in(rng, 1)},
            jnp.zeros((1, t_en), jnp.int32),
            jnp.full((1,), t_en, jnp.int32),
            jnp.zeros((1, t_de, self.config.out_channels)),
            jnp.full((1,), t_de, jnp.int32),
        )

    def forward(self, params, batch, train: bool = False, rngs=None):
        return self.module.apply(
            params,
            batch["text_input"],
            batch["text_lengths"],
            batch["mel_input"],
            batch["mel_lengths"],
            train=train,
            rngs=rngs or {"dropout": jax.random.PRNGKey(0)},
        )

    def inference(self, params, x, x_lengths, aux_input=None, max_frames: int = 400, rng=None):
        return self.module.apply(
            params, x, x_lengths,
            rng=rng if rng is not None else jax.random.PRNGKey(0),
            max_sampling_time=max_frames,
            method=self.module.inference,
            rngs={"dropout": jax.random.PRNGKey(0)},
        )

    def train_step(self, params, batch, rngs=None, train: bool = True):
        out = self.forward(params, batch, train=train, rngs=rngs)
        return out["loss"], {"loss": out["loss"], "outputs": out}


class NeuralhmmTTS(_HMMBase):
    """(reference ``models/neuralhmm_tts.py:23``)"""

    use_post_flow = False


class Overflow(_HMMBase):
    """(reference ``models/overflow.py:24``)"""

    use_post_flow = True
