"""WaveGrad — score-based diffusion vocoder
(reference ``TTS/vocoder/models/wavegrad.py`` + ``layers/wavegrad.py``).

Training predicts the noise added at a random noise level; inference runs
the reverse diffusion as a ``lax.scan`` over a precomputed noise schedule
(the reference's ``compute_noise_level``/``inference`` loops).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _interp_nearest(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """[B, T, C] → [B, size, C] nearest (torch F.interpolate default)."""
    idx = (jnp.arange(size) * (x.shape[1] / size)).astype(jnp.int32)
    return x[:, idx]


class FiLM(nn.Module):
    """Noise-level conditioned affine parameters (reference ``wavegrad.py:40``)."""

    output_size: int

    @nn.compact
    def __call__(self, x, noise_level):
        C = x.shape[-1]
        o = nn.Conv(C, (3,), padding=[(1, 1)], name="input_conv")(x)
        o = nn.leaky_relu(o, 0.2)
        # positional encoding of the noise level (reference PositionalEncoding)
        T = o.shape[1]
        half = C // 2
        div = jnp.power(10000.0, jnp.arange(0, C, 2) / C)
        pos = jnp.arange(T)[:, None] / div[None, :]
        pe = jnp.zeros((T, C)).at[:, 0::2].set(jnp.sin(pos)).at[:, 1::2].set(jnp.cos(pos))
        o = o + noise_level[:, None, None] + pe[None] / 5000.0
        shift_scale = nn.Conv(self.output_size * 2, (3,), padding=[(1, 1)], name="output_conv")(o)
        shift, scale = jnp.split(shift_scale, 2, axis=-1)
        return shift, scale


class UBlock(nn.Module):
    hidden_size: int
    factor: int
    dilation: Sequence[int]

    @nn.compact
    def __call__(self, x, shift, scale):
        T_up = x.shape[1] * self.factor
        x_inter = _interp_nearest(x, T_up)
        res = nn.Dense(self.hidden_size, name="res_block")(x_inter)
        o = nn.leaky_relu(x, 0.2)
        o = _interp_nearest(o, T_up)
        d = self.dilation
        o = nn.Conv(self.hidden_size, (3,), kernel_dilation=(d[0],), padding=[(d[0],) * 2], name="main_0")(o)
        o = shift + scale * o
        o = nn.leaky_relu(o, 0.2)
        o = nn.Conv(self.hidden_size, (3,), kernel_dilation=(d[1],), padding=[(d[1],) * 2], name="main_1")(o)
        res2 = res + o
        o = shift + scale * res2
        o = nn.leaky_relu(o, 0.2)
        o = nn.Conv(self.hidden_size, (3,), kernel_dilation=(d[2],), padding=[(d[2],) * 2], name="out_0")(o)
        o = shift + scale * o
        o = nn.leaky_relu(o, 0.2)
        o = nn.Conv(self.hidden_size, (3,), kernel_dilation=(d[3],), padding=[(d[3],) * 2], name="out_1")(o)
        return o + res2


class DBlock(nn.Module):
    hidden_size: int
    factor: int

    @nn.compact
    def __call__(self, x):
        size = x.shape[1] // self.factor
        res = nn.Dense(self.hidden_size, name="res_block")(x)
        res = _interp_nearest(res, size)
        o = _interp_nearest(x, size)
        for i, d in enumerate((1, 2, 4)):
            o = nn.leaky_relu(o, 0.2)
            o = nn.Conv(self.hidden_size, (3,), kernel_dilation=(d,), padding=[(d,) * 2], name=f"main_{i}")(o)
        return o + res


class Wavegrad(nn.Module):
    """(reference ``wavegrad.py:36``)"""

    in_channels: int = 80
    out_channels: int = 1
    y_conv_channels: int = 32
    x_conv_channels: int = 768
    dblock_out_channels: Sequence[int] = (128, 128, 256, 512)
    ublock_out_channels: Sequence[int] = (512, 512, 256, 128, 128)
    upsample_factors: Sequence[int] = (4, 4, 4, 2, 2)
    upsample_dilations: Sequence[Sequence[int]] = (
        (1, 2, 1, 2), (1, 2, 1, 2), (1, 2, 4, 8), (1, 2, 4, 8), (1, 2, 4, 8)
    )

    @nn.compact
    def __call__(self, x, spectrogram, noise_scale):
        """x: noisy wav [B, T_wav, 1]; spectrogram [B, T_mel, M];
        noise_scale [B] → predicted noise [B, T_wav, 1]."""
        # downsampling branch over the waveform
        d = nn.Conv(self.y_conv_channels, (5,), padding=[(2, 2)], name="y_conv")(x)
        shift_and_scale = [FiLM(self.ublock_out_channels[-1], name="film_0")(d, noise_scale)]
        for i, (oc, f) in enumerate(
            zip(self.dblock_out_channels, tuple(reversed(self.upsample_factors))[:-1])
        ):
            d = DBlock(oc, f, name=f"dblock_{i}")(d)
            film_out = tuple(reversed(self.ublock_out_channels))[i + 1] if i + 1 < len(
                self.ublock_out_channels
            ) else oc
            shift_and_scale.append(FiLM(film_out, name=f"film_{i + 1}")(d, noise_scale))

        # upsampling branch over the mel
        o = nn.Conv(self.x_conv_channels, (3,), padding=[(1, 1)], name="x_conv")(spectrogram)
        for i, (oc, f, dil) in enumerate(
            zip(self.ublock_out_channels, self.upsample_factors, self.upsample_dilations)
        ):
            shift, scale = shift_and_scale[len(shift_and_scale) - 1 - i]
            o = UBlock(oc, f, tuple(dil), name=f"ublock_{i}")(o, shift, scale)
        # zero-init the head: the untrained model predicts zero noise, which
        # keeps the reverse-diffusion iteration bounded from step one
        return nn.Conv(
            self.out_channels, (3,), padding=[(1, 1)],
            kernel_init=nn.initializers.zeros, name="out_conv",
        )(o)


def compute_noise_schedule(num_steps: int, min_val: float = 1e-6, max_val: float = 1e-2):
    """β schedule → (β, α, ᾱ, √ᾱ bounds) (reference ``compute_noise_level`` :160)."""
    beta = np.linspace(min_val, max_val, num_steps)
    alpha = 1 - beta
    alpha_hat = np.cumprod(alpha)
    noise_level = np.concatenate([[1.0], alpha_hat**0.5])
    return (
        jnp.asarray(beta),
        jnp.asarray(alpha),
        jnp.asarray(alpha_hat),
        jnp.asarray(noise_level),
    )


def wavegrad_train_loss(model: Wavegrad, params, batch, rng, schedule) -> jnp.ndarray:
    """Sample a noise level, corrupt, predict noise, L1 (reference train_step)."""
    beta, alpha, alpha_hat, noise_level = schedule
    y, mel = batch["waveform"], batch["mel"]
    B = y.shape[0]
    r1, r2, r3 = jax.random.split(rng, 3)
    s = jax.random.randint(r1, (B,), 1, len(beta))
    l_a, l_b = noise_level[s], noise_level[s + 1]
    nl = l_a + jax.random.uniform(r2, (B,)) * (l_b - l_a)
    noise = jax.random.normal(r3, y.shape)
    noisy = nl[:, None, None] * y + jnp.sqrt(1 - nl**2)[:, None, None] * noise
    noise_hat = model.apply(params, noisy, mel, nl)
    return jnp.mean(jnp.abs(noise - noise_hat))


class WavegradVocoder:
    """Trainer-contract host wrapper (reference ``BaseVocoder`` +
    ``wavegrad.py:36`` train/eval steps): random-noise-level denoising L1
    over random waveform segments."""

    def __init__(self, config):
        self.config = config
        fields = set(Wavegrad.__dataclass_fields__)
        kwargs = {k: v for k, v in (config.model_params or {}).items() if k in fields}
        kwargs.setdefault("in_channels", config.audio.num_mels)
        self.model = Wavegrad(**kwargs)
        ns = config.train_noise_schedule
        self.schedule = compute_noise_schedule(ns["num_steps"], ns["min_val"], ns["max_val"])

    def init_params(self, rng):
        hop = int(np.prod(self.model.upsample_factors))
        frames = max(1, self.config.seq_len // hop)
        x = jnp.zeros((1, frames * hop, 1))
        mel = jnp.zeros((1, frames, self.model.in_channels))
        return self.model.init(rng, x, mel, jnp.ones((1,)))

    def train_step(self, params, batch, rngs, train: bool = True):
        rng = rngs["noise"] if train else jax.random.PRNGKey(0)
        loss = wavegrad_train_loss(self.model, params, batch, rng, self.schedule)
        return loss, {"wavegrad_l1": loss}

    def inference(self, params, mel, rng=None, num_steps: Optional[int] = None):
        ns = self.config.test_noise_schedule
        schedule = compute_noise_schedule(
            num_steps or ns["num_steps"], ns["min_val"], ns["max_val"]
        )
        return wavegrad_inference(
            self.model, params, mel, rng if rng is not None else jax.random.PRNGKey(0), schedule
        )

    def get_dataset(self, config, samples, is_eval: bool = False):
        from tts_tpu.vocoder.dataset import GANDataset

        return GANDataset(config, samples, is_eval=is_eval)

    def format_batch(self, batch: dict) -> dict:
        return batch


def wavegrad_inference(model: Wavegrad, params, mel, rng, schedule) -> jnp.ndarray:
    """Reverse diffusion as a scan (reference ``inference`` :135)."""
    beta, alpha, alpha_hat, noise_level = schedule
    upsample = int(np.prod(model.upsample_factors))
    B, T_mel, _ = mel.shape
    r0, rng = jax.random.split(rng)
    y = jax.random.normal(r0, (B, T_mel * upsample, 1))
    sqrt_alpha_hat = jnp.sqrt(alpha_hat)
    num_steps = beta.shape[0]

    def step(carry, n):
        y, rng = carry
        idx = num_steps - 1 - n  # reversed
        nl = sqrt_alpha_hat[idx] * jnp.ones((B,))
        noise_hat = model.apply(params, y, mel, nl)
        c1 = 1.0 / jnp.sqrt(alpha[idx])
        c2 = (1 - alpha[idx]) / jnp.sqrt(1 - alpha_hat[idx])
        y = c1 * (y - c2 * noise_hat)
        rng, sub = jax.random.split(rng)
        z = jax.random.normal(sub, y.shape)
        sigma = jnp.sqrt(
            jnp.where(idx > 0, (1 - alpha_hat[idx - 1]) / (1 - alpha_hat[idx]) * beta[idx], 0.0)
        )
        y = y + jnp.where(idx > 0, sigma, 0.0) * z
        return (y, rng), None

    (y, _), _ = jax.lax.scan(step, (y, rng), jnp.arange(num_steps))
    return jnp.clip(y, -1.0, 1.0)
