"""WaveRNN — autoregressive sample-level vocoder
(reference ``TTS/vocoder/models/wavernn.py``).

Training is a teacher-forced parallel pass; generation is a ``lax.scan``
over samples with GRU state (the reference's batched-fold generation is
replaced by the scan — XLA pipelines the tiny matmuls; fold/overlap can
still be applied by the caller for long utterances).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class MelResNet(nn.Module):
    """(reference ``wavernn.py:48``).

    ``norm_type='layer'`` for training; ``'folded'`` = eval-mode BatchNorm as
    an elementwise affine, matching converted reference checkpoints."""

    num_res_blocks: int
    compute_dims: int
    res_out_dims: int
    pad: int
    norm_type: str = "layer"

    def _norm(self, x, name):
        if self.norm_type == "folded":
            scale = self.param(f"{name}_scale", nn.initializers.ones, (x.shape[-1],))
            shift = self.param(f"{name}_shift", nn.initializers.zeros, (x.shape[-1],))
            return x * scale + shift
        return nn.LayerNorm(name=name)(x)

    @nn.compact
    def __call__(self, x):  # [B, T, M]
        k = self.pad * 2 + 1
        x = nn.Conv(self.compute_dims, (k,), padding="VALID", use_bias=False, name="conv_in")(x)
        x = nn.relu(self._norm(x, "norm_in"))
        for i in range(self.num_res_blocks):
            res = x
            h = nn.Conv(self.compute_dims, (1,), use_bias=False, name=f"res{i}_conv1")(x)
            h = nn.relu(self._norm(h, f"res{i}_norm1"))
            h = nn.Conv(self.compute_dims, (1,), use_bias=False, name=f"res{i}_conv2")(h)
            h = self._norm(h, f"res{i}_norm2")
            x = h + res
        return nn.Conv(self.res_out_dims, (1,), name="conv_out")(x)


class UpsampleNetwork(nn.Module):
    """Repeat-upsample + smoothing (reference ``wavernn.py:82``)."""

    feat_dims: int
    upsample_factors: Sequence[int]
    compute_dims: int
    num_res_blocks: int
    res_out_dims: int
    pad: int
    use_aux_net: bool = True
    norm_type: str = "layer"

    @nn.compact
    def __call__(self, m):  # [B, T_mel, M]
        total_scale = int(np.prod(self.upsample_factors))
        indent = self.pad * total_scale
        aux = None
        if self.use_aux_net:
            aux = MelResNet(
                self.num_res_blocks, self.compute_dims, self.res_out_dims, self.pad,
                norm_type=self.norm_type, name="resnet",
            )(m)
            aux = jnp.repeat(aux, total_scale, axis=1)
        x = m
        for i, scale in enumerate(self.upsample_factors):
            x = jnp.repeat(x, scale, axis=1)
            k = 2 * scale + 1
            # one smoothing tap SHARED across channels — weight-compatible
            # with the reference's Conv2d(1, 1, (1, k)) over (C, T)
            tap = self.param(f"up_{i}", nn.initializers.constant(1.0 / k), (k, 1, 1))
            C = x.shape[-1]
            kern = jnp.broadcast_to(tap, (k, 1, C))
            x = jax.lax.conv_general_dilated(
                x, kern, (1,), [(scale, scale)],
                dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=C,
            )
        x = x[:, indent:-indent] if indent > 0 else x
        return x, aux


class Wavernn(nn.Module):
    """(reference ``wavernn.py:193``)"""

    rnn_dims: int = 512
    fc_dims: int = 512
    compute_dims: int = 128
    res_out_dims: int = 128
    num_res_blocks: int = 10
    feat_dims: int = 80
    pad: int = 2
    mode: str = "mold"  # "mold" | "gauss" | int bits
    mulaw: bool = True
    use_aux_net: bool = True
    upsample_factors: Sequence[int] = (4, 8, 8)
    norm_type: str = "layer"

    @property
    def n_classes(self) -> int:
        if isinstance(self.mode, int):
            return 2**self.mode
        if self.mode == "mold":
            return 30
        if self.mode == "gauss":
            return 2
        raise ValueError(f"Unknown mode {self.mode}")

    def setup(self):
        self.aux_dims = self.res_out_dims // 4
        self.upsample = UpsampleNetwork(
            self.feat_dims, tuple(self.upsample_factors), self.compute_dims,
            self.num_res_blocks, self.res_out_dims, self.pad, self.use_aux_net,
            norm_type=self.norm_type, name="upsample",
        )
        in_dims = self.feat_dims + 1 + (self.aux_dims if self.use_aux_net else 0)
        self.I = nn.Dense(self.rnn_dims, name="I")
        self.rnn1 = nn.GRUCell(self.rnn_dims, name="rnn1")
        self.rnn2 = nn.GRUCell(self.rnn_dims, name="rnn2")
        self.fc1 = nn.Dense(self.fc_dims, name="fc1")
        self.fc2 = nn.Dense(self.fc_dims, name="fc2")
        self.fc3 = nn.Dense(self.n_classes, name="fc3")

    def _core(self, x_t, mel_t, a1, a2, a3, a4, h1, h2):
        """One step (also vmapped over time for teacher forcing)."""
        inp = jnp.concatenate(
            [x_t[..., None], mel_t] + ([a1] if self.use_aux_net else []), axis=-1
        )
        x = self.I(inp)
        res = x
        h1, x1 = self.rnn1(h1, x)
        x = x1 + res
        res = x
        x_in2 = jnp.concatenate([x, a2], -1) if self.use_aux_net else x
        h2, x2 = self.rnn2(h2, x_in2)
        x = x2 + res
        x_in3 = jnp.concatenate([x, a3], -1) if self.use_aux_net else x
        x = nn.relu(self.fc1(x_in3))
        x_in4 = jnp.concatenate([x, a4], -1) if self.use_aux_net else x
        x = nn.relu(self.fc2(x_in4))
        return self.fc3(x), h1, h2

    def _split_aux(self, aux):
        if not self.use_aux_net:
            return (None,) * 4
        d = self.aux_dims
        return aux[..., :d], aux[..., d : 2 * d], aux[..., 2 * d : 3 * d], aux[..., 3 * d :]

    def __call__(self, x, mels):
        """Teacher-forced forward: x [B, T_wav], mels [B, T_mel, M] →
        logits [B, T_wav, n_classes]."""
        B = x.shape[0]
        mels_up, aux = self.upsample(mels)
        a1, a2, a3, a4 = self._split_aux(aux)
        T = x.shape[1]
        mels_up = mels_up[:, :T]
        if self.use_aux_net:
            a1, a2, a3, a4 = (a[:, :T] for a in (a1, a2, a3, a4))

        h1 = jnp.zeros((B, self.rnn_dims))
        h2 = jnp.zeros((B, self.rnn_dims))

        def step(mdl, carry, inputs):
            h1, h2 = carry
            x_t, m_t, aa1, aa2, aa3, aa4 = inputs
            logits, h1, h2 = mdl._core(x_t, m_t, aa1, aa2, aa3, aa4, h1, h2)
            return (h1, h2), logits

        xs = (
            jnp.moveaxis(x, 1, 0),
            jnp.moveaxis(mels_up, 1, 0),
            jnp.moveaxis(a1, 1, 0) if a1 is not None else jnp.zeros((T, B, 0)),
            jnp.moveaxis(a2, 1, 0) if a2 is not None else jnp.zeros((T, B, 0)),
            jnp.moveaxis(a3, 1, 0) if a3 is not None else jnp.zeros((T, B, 0)),
            jnp.moveaxis(a4, 1, 0) if a4 is not None else jnp.zeros((T, B, 0)),
        )
        scan = nn.scan(
            step, variable_broadcast="params", split_rngs={"params": False}
        )
        _, logits = scan(self, (h1, h2), xs)
        return jnp.moveaxis(logits, 0, 1)

    def generate(self, mels, rng):
        """AR sample generation [B, T_mel, M] → wav [B, T_wav]."""
        B = mels.shape[0]
        mels_up, aux = self.upsample(mels)
        a1, a2, a3, a4 = self._split_aux(aux)
        T = mels_up.shape[1]

        def step(mdl, carry, inputs):
            h1, h2, x_prev, rng = carry
            m_t, aa1, aa2, aa3, aa4 = inputs
            logits, h1, h2 = mdl._core(x_prev, m_t, aa1, aa2, aa3, aa4, h1, h2)
            rng, sub = jax.random.split(rng)
            if mdl.mode == "mold":
                sample = sample_from_discretized_mix_logistic(sub, logits)
            elif mdl.mode == "gauss":
                mean, logstd = logits[..., 0], logits[..., 1]
                sample = mean + jnp.exp(logstd) * jax.random.normal(sub, mean.shape)
            else:
                idx = jax.random.categorical(sub, logits)
                sample = 2.0 * idx.astype(jnp.float32) / (mdl.n_classes - 1.0) - 1.0
            return (h1, h2, sample, rng), sample

        zeros = jnp.zeros((T, B, 0))
        xs = (
            jnp.moveaxis(mels_up, 1, 0),
            jnp.moveaxis(a1, 1, 0) if a1 is not None else zeros,
            jnp.moveaxis(a2, 1, 0) if a2 is not None else zeros,
            jnp.moveaxis(a3, 1, 0) if a3 is not None else zeros,
            jnp.moveaxis(a4, 1, 0) if a4 is not None else zeros,
        )
        carry0 = (jnp.zeros((B, self.rnn_dims)), jnp.zeros((B, self.rnn_dims)),
                  jnp.zeros((B,)), rng)
        scan = nn.scan(step, variable_broadcast="params", split_rngs={"params": False})
        _, samples = scan(self, carry0, xs)
        return jnp.moveaxis(samples, 0, 1)


def sample_from_discretized_mix_logistic(rng, logits, log_scale_min: float = -32.23):
    """Sample from a mixture of logistics (reference
    ``vocoder/utils/distribution.py:154``)."""
    nr_mix = logits.shape[-1] // 3
    logit_probs = logits[..., :nr_mix]
    means = logits[..., nr_mix : 2 * nr_mix]
    log_scales = jnp.clip(logits[..., 2 * nr_mix :], min=log_scale_min)
    r1, r2 = jax.random.split(rng)
    comp = jax.random.categorical(r1, logit_probs)
    mean = jnp.take_along_axis(means, comp[..., None], -1)[..., 0]
    log_scale = jnp.take_along_axis(log_scales, comp[..., None], -1)[..., 0]
    u = jax.random.uniform(r2, mean.shape, minval=1e-5, maxval=1 - 1e-5)
    x = mean + jnp.exp(log_scale) * (jnp.log(u) - jnp.log1p(-u))
    return jnp.clip(x, -1.0, 1.0)


def mulaw_encode_jnp(w: jnp.ndarray, mu: int) -> jnp.ndarray:
    """mu-law companding to integer labels in [0, mu] (reference
    ``numpy_transforms.py`` mulaw; jnp so it lives inside the jitted step)."""
    comp = jnp.sign(w) * jnp.log1p(mu * jnp.abs(w)) / np.log1p(mu)
    return jnp.clip(jnp.floor((comp + 1) / 2 * mu + 0.5), 0, mu).astype(jnp.int32)


class WavernnVocoder:
    """Trainer-contract host wrapper (reference ``wavernn.py:193``
    train_step): teacher-forced parallel pass, MoL / Gaussian / CE loss by
    output mode."""

    def __init__(self, config):
        self.config = config
        fields = set(Wavernn.__dataclass_fields__)
        kwargs = {k: v for k, v in (config.model_args or {}).items() if k in fields}
        kwargs.setdefault("feat_dims", config.audio.num_mels)
        kwargs.setdefault("mode", config.mode)
        kwargs.setdefault("mulaw", getattr(config, "mulaw", True))
        self.model = Wavernn(**kwargs)
        hop = int(np.prod(self.model.upsample_factors))
        frames = max(2 * self.model.pad + 1, config.seq_len // hop)
        # the upsample net trims `pad` frames each side (MelResNet VALID conv)
        self.usable = (frames - 2 * self.model.pad) * hop
        self.offset = self.model.pad * hop
        self.frames = frames

    def init_params(self, rng):
        x = jnp.zeros((1, 8))
        mel = jnp.zeros((1, self.frames, self.model.feat_dims))
        return self.model.init(rng, x, mel)

    def _targets(self, wav):
        """wav [B, T, 1] → teacher-forcing input x (float) + target y."""
        w = wav[..., 0]
        w = jax.lax.dynamic_slice_in_dim(w, self.offset, self.usable, axis=1)
        mode = self.model.mode
        if isinstance(mode, int):
            n = self.model.n_classes
            labels = (
                mulaw_encode_jnp(w, n - 1)
                if self.model.mulaw
                else jnp.clip(jnp.floor((w + 1) / 2 * (n - 1) + 0.5), 0, n - 1).astype(jnp.int32)
            )
            x = 2.0 * labels[:, :-1].astype(jnp.float32) / (n - 1.0) - 1.0
            return x, labels[:, 1:]
        return w[:, :-1], w[:, 1:]

    def train_step(self, params, batch, rngs, train: bool = True):
        x, y = self._targets(batch["waveform"])
        logits = self.model.apply(params, x, batch["mel"])
        mode = self.model.mode
        if mode == "mold":
            loss = mixture_of_logistics_loss(logits, y)
        elif mode == "gauss":
            mean, logstd = logits[..., 0], jnp.clip(logits[..., 1], min=-7.0)
            loss = jnp.mean(
                0.5 * np.log(2 * np.pi) + logstd + 0.5 * ((y - mean) * jnp.exp(-logstd)) ** 2
            )
        else:
            logp = jax.nn.log_softmax(logits, axis=-1)
            loss = -jnp.mean(jnp.take_along_axis(logp, y[..., None], axis=-1))
        return loss, {"wavernn_loss": loss}

    def inference(self, params, mel, rng=None):
        return self.model.apply(
            params, mel, rng if rng is not None else jax.random.PRNGKey(0), method=Wavernn.generate
        )

    def get_dataset(self, config, samples, is_eval: bool = False):
        from tts_tpu.vocoder.dataset import GANDataset

        return GANDataset(config, samples, is_eval=is_eval)

    def format_batch(self, batch: dict) -> dict:
        return batch


def mixture_of_logistics_loss(logits, y, num_classes: int = 65536, log_scale_min: float = -32.23):
    """Discretized MoL NLL (reference ``distribution.py:89``)."""
    nr_mix = logits.shape[-1] // 3
    logit_probs = logits[..., :nr_mix]
    means = logits[..., nr_mix : 2 * nr_mix]
    log_scales = jnp.clip(logits[..., 2 * nr_mix :], min=log_scale_min)
    y = y[..., None]
    centered = y - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered + 1.0 / (num_classes - 1))
    min_in = inv_stdv * (centered - 1.0 / (num_classes - 1))
    cdf_plus = nn.sigmoid(plus_in)
    cdf_min = nn.sigmoid(min_in)
    log_cdf_plus = plus_in - nn.softplus(plus_in)
    log_one_minus_cdf_min = -nn.softplus(min_in)
    cdf_delta = cdf_plus - cdf_min
    mid_in = inv_stdv * centered
    log_pdf_mid = mid_in - log_scales - 2.0 * nn.softplus(mid_in)
    inner = jnp.where(
        cdf_delta > 1e-5,
        jnp.log(jnp.clip(cdf_delta, min=1e-12)),
        log_pdf_mid - np.log((num_classes - 1) / 2),
    )
    log_probs = jnp.where(
        y < -0.999,
        log_cdf_plus,
        jnp.where(y > 0.999, log_one_minus_cdf_min, inner),
    )
    log_probs = log_probs + jax.nn.log_softmax(logit_probs, -1)
    return -jnp.mean(jax.scipy.special.logsumexp(log_probs, axis=-1))
