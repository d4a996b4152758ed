"""Tortoise — AR GPT over mel codes + diffusion mel decoder (inference
pipeline; reference ``TTS/tts/models/tortoise.py:309`` +
``layers/tortoise/{autoregressive,diffusion_decoder}.py``).

Stages: reference audio → conditioning latent; text → mel codes via the
KV-cached UnifiedVoice GPT; codes+latents → mel via the diffusion decoder
(DDIM scan); mel → wav via any trained vocoder (the reference bundles a
UnivNet — ours plugs ``tts_tpu.vocoder``).  CLVP reranking is replaced by
AR log-prob ranking of candidate samples.
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tts_tpu.models.xtts.gpt import AttentionBlock, ConditioningEncoder
from tts_tpu.models.xtts.gpt_core import GPT2Core, causal_mask, sample_logits

from .config import TortoiseArgs, TortoiseConfig


class UnifiedVoice(nn.Module):
    """AR decoder over discrete mel codes (reference ``autoregressive.py:262``)."""

    layers: int = 30
    model_dim: int = 1024
    heads: int = 16
    number_text_tokens: int = 255
    number_mel_codes: int = 8194
    start_mel_token: int = 8192
    stop_mel_token: int = 8193
    start_text_token: int = 255
    stop_text_token: int = 0
    max_text_tokens: int = 402
    max_mel_tokens: int = 604

    def setup(self):
        D = self.model_dim
        self.conditioning_encoder = ConditioningEncoder(
            D, attn_blocks=6, num_attn_heads=self.heads, name="conditioning_encoder"
        )
        self.text_embedding = nn.Embed(self.number_text_tokens + 1, D, name="text_embedding")
        self.mel_embedding = nn.Embed(self.number_mel_codes, D, name="mel_embedding")
        self.text_pos_embedding = self.param(
            "text_pos_embedding", nn.initializers.normal(0.02), (self.max_text_tokens + 2, D)
        )
        self.mel_pos_embedding = self.param(
            "mel_pos_embedding", nn.initializers.normal(0.02), (self.max_mel_tokens + 2, D)
        )
        self.gpt = GPT2Core(layers=self.layers, dim=D, heads=self.heads, name="gpt")
        self.final_norm = nn.LayerNorm(name="final_norm")
        self.text_head = nn.Dense(self.number_text_tokens + 1, name="text_head")
        self.mel_head = nn.Dense(self.number_mel_codes, name="mel_head")

    def get_conditioning(self, cond_mels: jnp.ndarray) -> jnp.ndarray:
        """[B, T, 80] → one conditioning latent [B, 1, D] (mean-pooled)."""
        h = self.conditioning_encoder(cond_mels)
        return jnp.mean(h, axis=1, keepdims=True)

    def init_all(self, cond_mels, text_tokens, mel_codes):
        """Trace conditioning + forward so ``init`` creates all params."""
        cond = self.get_conditioning(cond_mels)
        return self(cond, text_tokens, mel_codes)

    def __call__(self, cond_latent, text_tokens, mel_codes):
        """Teacher-forced forward → (text_logits, mel_logits, mel_latents)."""
        B = text_tokens.shape[0]
        text = jnp.concatenate(
            [jnp.full((B, 1), self.start_text_token), text_tokens,
             jnp.full((B, 1), self.stop_text_token)], 1,
        )
        mel = jnp.concatenate(
            [jnp.full((B, 1), self.start_mel_token), mel_codes,
             jnp.full((B, 1), self.stop_mel_token)], 1,
        )
        te = self.text_embedding(text) + self.text_pos_embedding[None, : text.shape[1]]
        me = self.mel_embedding(mel) + self.mel_pos_embedding[None, : mel.shape[1]]
        h = jnp.concatenate([cond_latent, te, me], 1)
        h, _ = self.gpt(h, attn_mask=causal_mask(h.shape[1]))
        h = self.final_norm(h)
        L_c, T_t = cond_latent.shape[1], text.shape[1]
        text_latents = h[:, L_c : L_c + T_t]
        mel_latents = h[:, L_c + T_t :]
        return (
            self.text_head(text_latents[:, :-1]),
            self.mel_head(mel_latents[:, :-1]),
            mel_latents[:, :-1],
        )

    def generate(self, cond_latent, text_tokens, rng, max_new_tokens: int = 500,
                 temperature: float = 0.8, top_p: float = 0.8,
                 repetition_penalty: float = 2.0) -> Dict[str, jnp.ndarray]:
        """KV-cached AR sampling of mel codes (+ per-code latents)."""
        B = text_tokens.shape[0]
        text = jnp.concatenate(
            [jnp.full((B, 1), self.start_text_token), text_tokens,
             jnp.full((B, 1), self.stop_text_token)], 1,
        )
        te = self.text_embedding(text) + self.text_pos_embedding[None, : text.shape[1]]
        start = self.mel_embedding(jnp.full((B, 1), self.start_mel_token))
        start = start + self.mel_pos_embedding[None, :1]
        prefix = jnp.concatenate([cond_latent, te, start], 1)
        L_pre = prefix.shape[1]
        max_len = L_pre + max_new_tokens
        caches = self.gpt.init_cache(B, max_len)
        pre_mask = jnp.pad(causal_mask(L_pre), ((0, 0),) * 3 + ((0, max_len - L_pre),))
        h, caches = self.gpt(prefix, attn_mask=pre_mask, caches=caches, cache_index=0)
        h = self.final_norm(h)
        logits0 = self.mel_head(h[:, -1])

        def step(carry, rng_t):
            caches, cur, pos, last_logits, last_h, rep, done, n = carry
            tok = sample_logits(rng_t, last_logits, temperature=temperature, top_k=0,
                                top_p=top_p, repetition_counts=rep,
                                repetition_penalty=repetition_penalty)
            tok = jnp.where(done, self.stop_mel_token, tok)
            new_done = done | (tok == self.stop_mel_token)
            n = n + (~new_done).astype(jnp.int32)
            rep = rep.at[jnp.arange(B), tok].add(1)
            emb = self.mel_embedding(tok)[:, None]
            emb = emb + jax.lax.dynamic_slice_in_dim(self.mel_pos_embedding, pos, 1, 0)[None]
            h, new_caches = self.gpt(emb, caches=caches, cache_index=cur, cache_len=cur + 1)
            h = self.final_norm(h)
            return (new_caches, cur + 1, pos + 1, self.mel_head(h[:, -1]), h[:, -1],
                    rep, new_done, n), (tok, last_h)

        carry0 = (caches, jnp.asarray(L_pre, jnp.int32), jnp.asarray(1, jnp.int32),
                  logits0, h[:, -1], jnp.zeros((B, self.number_mel_codes), jnp.int32),
                  jnp.zeros((B,), bool), jnp.zeros((B,), jnp.int32))
        rngs = jax.random.split(rng, max_new_tokens)
        (_, _, _, _, _, _, _, n), (toks, latents) = jax.lax.scan(step, carry0, rngs)
        return {
            "codes": jnp.moveaxis(toks, 0, 1),
            "latents": jnp.moveaxis(latents, 0, 1),
            "lengths": n,
        }


class DiffusionDecoder(nn.Module):
    """Latents + noisy mel + timestep → noise prediction
    (compact attention-residual net after ``diffusion_decoder.py:141``)."""

    model_channels: int = 1024
    num_layers: int = 10
    in_channels: int = 100
    in_latent_channels: int = 1024
    num_heads: int = 16

    @nn.compact
    def __call__(self, x, t_emb_scale, latents):
        """x [B, T, in_channels] noisy mel; t_emb_scale [B] diffusion step in
        [0,1]; latents [B, T_lat, D_lat] AR latents (nearest-upsampled)."""
        C = self.model_channels
        # timestep embedding
        half = C // 2
        freqs = jnp.exp(-math.log(10000) * jnp.arange(half) / half)
        ang = t_emb_scale[:, None] * 1000.0 * freqs[None]
        t_emb = jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], -1)
        t_emb = nn.Dense(C, name="time_mlp2")(nn.silu(nn.Dense(C, name="time_mlp1")(t_emb)))

        # upsample latents to mel frame rate (nearest)
        T = x.shape[1]
        idx = (jnp.arange(T) * (latents.shape[1] / T)).astype(jnp.int32)
        cond = nn.Dense(C, name="latent_proj")(latents[:, idx])

        h = nn.Dense(C, name="in_proj")(x) + cond
        for i in range(self.num_layers):
            scale_shift = nn.Dense(2 * C, name=f"film_{i}")(nn.silu(t_emb))
            scale, shift = jnp.split(scale_shift[:, None], 2, axis=-1)
            r = nn.LayerNorm(name=f"norm_{i}")(h) * (1 + scale) + shift
            r = nn.Conv(C, (3,), padding=[(1, 1)], name=f"conv_{i}")(nn.silu(r))
            if i % 3 == 2:
                r = AttentionBlock(C, self.num_heads, name=f"attn_{i}")(r)
            h = h + r
        out = nn.Dense(self.in_channels, name="out_proj")(nn.silu(nn.LayerNorm(name="out_norm")(h)))
        return out  # predicted noise


def ddim_sample(decoder, params, latents, T_mel: int, rng, steps: int = 30,
                in_channels: int = 100, temperature: float = 1.0):
    """DDIM sampling scan (replaces the reference's DPM-solver/k-diffusion
    loops, ``dpm_solver.py``/``diffusion.py``)."""
    B = latents.shape[0]
    betas = jnp.linspace(1e-4, 0.02, 1000)
    alphas = jnp.cumprod(1 - betas)
    ts = jnp.linspace(999, 0, steps).astype(jnp.int32)
    r0, rng = jax.random.split(rng)
    x = jax.random.normal(r0, (B, T_mel, in_channels)) * temperature

    def step(x, i):
        t = ts[i]
        t_next = jnp.where(i + 1 < steps, ts[jnp.minimum(i + 1, steps - 1)], 0)
        a_t = alphas[t]
        a_next = jnp.where(i + 1 < steps, alphas[t_next], 1.0)
        eps = decoder.apply(params, x, jnp.full((B,), t / 1000.0), latents)
        x0 = (x - jnp.sqrt(1 - a_t) * eps) / jnp.sqrt(a_t)
        x = jnp.sqrt(a_next) * x0 + jnp.sqrt(1 - a_next) * eps
        return x, None

    x, _ = jax.lax.scan(step, x, jnp.arange(steps))
    return x


class Tortoise:
    """Host pipeline (reference ``models/tortoise.py:309``)."""

    def __init__(self, config: TortoiseConfig):
        self.config = config
        a = config.model_args
        self.autoregressive = UnifiedVoice(
            layers=a.ar_layers, model_dim=a.ar_model_dim, heads=a.ar_heads,
            number_text_tokens=a.ar_number_text_tokens,
            number_mel_codes=a.ar_number_mel_codes,
            start_mel_token=a.ar_start_mel_token, stop_mel_token=a.ar_stop_mel_token,
            start_text_token=a.ar_start_text_token, stop_text_token=a.ar_stop_text_token,
            max_text_tokens=a.ar_max_text_tokens, max_mel_tokens=a.ar_max_mel_tokens,
        )
        self.diffusion = DiffusionDecoder(
            model_channels=a.diff_model_channels, num_layers=a.diff_num_layers,
            in_channels=a.diff_in_channels, in_latent_channels=a.diff_in_latent_channels,
            num_heads=a.diff_num_heads,
        )
        self.ar_params = None
        self.diff_params = None

    @classmethod
    def init_from_config(cls, config: TortoiseConfig, samples=None):
        return cls(config)

    def init_params(self, rng, t_text: int = 12, t_mel: int = 20, t_cond: int = 32):
        r1, r2 = jax.random.split(rng)
        self.ar_params = self.autoregressive.init(
            r1,
            jnp.zeros((1, t_cond, 80)),
            jnp.zeros((1, t_text), jnp.int32),
            jnp.zeros((1, t_mel), jnp.int32),
            method=self.autoregressive.init_all,
        )
        self.diff_params = self.diffusion.init(
            r2,
            jnp.zeros((1, t_mel * 4, self.config.model_args.diff_in_channels)),
            jnp.zeros((1,)),
            jnp.zeros((1, t_mel, self.config.model_args.ar_model_dim)),
        )
        return self.ar_params, self.diff_params

    def inference(self, text_tokens: jnp.ndarray, cond_mels: jnp.ndarray, rng=None,
                  max_mel_tokens: int = 100, diffusion_iterations: Optional[int] = None):
        a = self.config.model_args
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        r1, r2 = jax.random.split(rng)
        cond_latent = self.autoregressive.apply(
            self.ar_params, cond_mels, method=self.autoregressive.get_conditioning
        )
        gen = self.autoregressive.apply(
            self.ar_params, cond_latent, text_tokens, r1,
            max_new_tokens=max_mel_tokens,
            temperature=a.temperature, top_p=a.top_p,
            repetition_penalty=a.repetition_penalty,
            method=self.autoregressive.generate,
        )
        T_mel = gen["latents"].shape[1] * 4  # ~4 mel frames per code
        mel = ddim_sample(
            self.diffusion, self.diff_params, gen["latents"], T_mel, r2,
            steps=diffusion_iterations or a.diffusion_iterations,
            in_channels=a.diff_in_channels, temperature=a.diffusion_temperature,
        )
        return {"mel": mel, "codes": gen["codes"], "code_lengths": gen["lengths"]}
