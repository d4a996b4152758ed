"""Tortoise — AR GPT over mel codes + diffusion mel decoder (inference
pipeline; reference ``TTS/tts/models/tortoise.py:309`` +
``layers/tortoise/{autoregressive,diffusion_decoder,clvp}.py``).

Stages: reference audio → conditioning latents; text → mel codes via the
KV-cached UnifiedVoice GPT (k candidates); CLVP reranks the candidates;
codes+latents → mel via the weight-compatible ``DiffusionTts`` (DDIM scan
with classifier-free guidance); mel → wav via a trained vocoder (the
reference bundles a UnivNet — ours plugs ``tts_tpu.vocoder``).
"""

from __future__ import annotations

import math
import os
from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tts_tpu.models.xtts.gpt_core import GPT2Core, causal_mask, sample_logits

from .audio import (
    denormalize_tacotron_mel,
    format_conditioning,
    pad_or_truncate,
    wav_to_univnet_mel,
)
from .config import TortoiseArgs, TortoiseConfig
from .layers import CLVP, AttentionBlock, DiffusionTts
from .tokenizer import VoiceBpeTokenizer

CALM_TOKEN = 83  # mel code for silence (reference models/tortoise.py:712)
LOG_MEL_PAD = -11.512925  # log(1e-5): silence frame fed to the vocoder


def fix_autoregressive_codes(codes: np.ndarray, stop_token: int,
                             calm_token: int = CALM_TOKEN) -> np.ndarray:
    """Re-code the tail of AR outputs the way the DVAE expects (reference
    ``models/tortoise.py:89 fix_autoregressive_output``): everything from the
    first stop token on becomes the "calm"/silence code and the final three
    codes are the DVAE's trained zero-padding suffix (45, 45, 248).

    Vectorized over the batch: [B, T] int codes → [B, T].
    """
    codes = np.array(codes)
    # reduced-dim safety: the DVAE-specific codes must stay inside the vocab
    suffix = np.minimum([45, 45, 248], stop_token - 1)
    calm_token = min(calm_token, stop_token - 1)
    is_stop = codes == stop_token
    any_stop = is_stop.any(axis=1)
    first_stop = np.where(any_stop, is_stop.argmax(axis=1), codes.shape[1])
    tail = np.arange(codes.shape[1])[None, :] >= first_stop[:, None]
    codes = np.where(tail, calm_token, codes)
    codes[any_stop, -3:] = suffix
    return codes


def trim_index_at_calm(codes_row: np.ndarray, calm_token: int = CALM_TOKEN,
                       breathing_room: int = 8) -> int:
    """Position of the first code where more than ``breathing_room``
    consecutive calm codes have accumulated (reference
    ``models/tortoise.py:783-790``); the latents are cut there so the
    diffusion model stops at end-of-speech."""
    calm = np.asarray(codes_row) == calm_token
    run = 0
    for i, c in enumerate(calm):
        run = run + 1 if c else 0
        if run > breathing_room:
            return i
    return len(calm)


def random_latent_converter_apply(params: Dict[str, np.ndarray], rng,
                                  channels: int) -> jnp.ndarray:
    """Inference of the reference ``RandomLatentConverter``
    (``random_latent_generator.py:39``): 5 EqualLinear layers (lr_mul=0.1,
    scaled weights, fused leaky-relu ×√2) then a plain Linear, applied to a
    standard-normal draw."""
    x = jax.random.normal(rng, (1, channels))
    lr_mul = 0.1
    for i in range(5):
        w, b = params[f"layers.{i}.weight"], params[f"layers.{i}.bias"]
        scale = (1.0 / math.sqrt(w.shape[1])) * lr_mul
        x = x @ (w * scale).T
        x = jax.nn.leaky_relu(x + b * lr_mul, 0.2) * math.sqrt(2.0)
    w, b = params["layers.5.weight"], params["layers.5.bias"]
    return x @ w.T + b


class TortoiseConditioningEncoder(nn.Module):
    """Reference ``autoregressive.ConditioningEncoder``: 1×1 conv in +
    attention stack; the conditioning latent is the FIRST position
    (``arch_utils`` ConditioningEncoder with mean=False)."""

    embedding_dim: int
    attn_blocks: int = 6
    num_attn_heads: int = 16

    @nn.compact
    def __call__(self, x):  # [B, T, 80]
        h = nn.Dense(self.embedding_dim, name="init")(x)
        for i in range(self.attn_blocks):
            h = AttentionBlock(self.embedding_dim, self.num_attn_heads, name=f"attn_{i}")(h)
        return h


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
    max_conditioning_inputs: int = 1

    def setup(self):
        D = self.model_dim
        self.conditioning_encoder = TortoiseConditioningEncoder(
            D, attn_blocks=6, num_attn_heads=self.heads, name="conditioning_encoder"
        )
        self.text_embedding = nn.Embed(self.number_text_tokens + 1, D, name="text_embedding")
        self.mel_embedding = nn.Embed(self.number_mel_codes, D, name="mel_embedding")
        self.text_pos_embedding = self.param(
            "text_pos_embedding", nn.initializers.normal(0.02), (self.max_text_tokens + 2, D)
        )
        self.mel_pos_embedding = self.param(
            "mel_pos_embedding",
            nn.initializers.normal(0.02),
            # reference build_hf_gpt_transformer: + max_conditioning_inputs
            (self.max_mel_tokens + 2 + self.max_conditioning_inputs, D),
        )
        self.gpt = GPT2Core(layers=self.layers, dim=D, heads=self.heads, name="gpt")
        self.final_norm = nn.LayerNorm(epsilon=1e-5, name="final_norm")
        self.text_head = nn.Dense(self.number_text_tokens + 1, name="text_head")
        self.mel_head = nn.Dense(self.number_mel_codes, name="mel_head")

    def get_conditioning(self, cond_mels: jnp.ndarray) -> jnp.ndarray:
        """[B, T, 80] → one conditioning latent [B, 1, D] (first attention
        position, reference ``arch_utils`` ConditioningEncoder mean=False)."""
        h = self.conditioning_encoder(cond_mels)
        return h[:, :1]

    def init_all(self, cond_mels, text_tokens, mel_codes):
        """Trace conditioning + forward so ``init`` creates all params."""
        cond = self.get_conditioning(cond_mels)
        return self(cond, text_tokens, mel_codes)

    def __call__(self, cond_latent, text_tokens, mel_codes):
        """Teacher-forced forward → (text_logits, mel_logits, mel_latents).

        Segment offsets follow the reference ``get_logits``: the hidden
        state at the conditioning position is dropped
        (``autoregressive.py:419`` "first logit is tied to the
        speech_conditioning_input"), so each segment's logits cover its
        full token count.
        """
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
        h = self.final_norm(h[:, 1:])  # drop the conditioning position
        T_t = text.shape[1]
        text_latents = h[:, :T_t]
        mel_latents = h[:, T_t:]
        return (
            self.text_head(text_latents),
            self.mel_head(mel_latents),
            mel_latents,
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
        caches = self.gpt.init_cache(B, max_len, prefix.dtype)
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
            # pin carry dtypes to the prefill's: a caller-supplied fp32
            # conditioning latent with bf16 weights would otherwise make the
            # prefill fp32 while the step runs bf16, breaking the scan carry
            return (new_caches, cur + 1, pos + 1,
                    self.mel_head(h[:, -1]).astype(last_logits.dtype),
                    h[:, -1].astype(last_h.dtype),
                    rep, new_done, n), (tok, last_h)

        # generated code k takes mel position k (start token at 0) — pinned
        # token-for-token against the reference HF inference stack by the
        # greedy parity test
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


def ddim_sample(decoder, params, embeddings, T_mel: int, rng, steps: int = 30,
                in_channels: int = 100, temperature: float = 1.0,
                cond_free: bool = True, cond_free_k: float = 2.0,
                trained_steps: int = 4000):
    """DDIM sampling scan over the weight-compatible ``DiffusionTts``
    (replaces the reference's SpacedDiffusion p-sample loop,
    ``tortoise/diffusion.py``; same linear schedule: betas scaled from the
    1000-step [1e-4, 2e-2] range to ``trained_steps``).

    ``embeddings`` are the precomputed timestep-independent conditioning
    embeddings [B, T_mel, MC].  ``cond_free`` applies the reference's
    classifier-free guidance (``cond_free_k``).
    """
    B = embeddings.shape[0]
    scale = 1000.0 / trained_steps
    betas = jnp.linspace(1e-4 * scale, 2e-2 * scale, trained_steps)
    alphas = jnp.cumprod(1 - betas)
    ts = jnp.linspace(trained_steps - 1, 0, steps).astype(jnp.int32)
    r0, rng = jax.random.split(rng)
    x = jax.random.normal(r0, (B, T_mel, in_channels)) * temperature

    def eps_fn(x, t_vec):
        out = decoder.apply(params, x, t_vec, precomputed_embeddings=embeddings)
        eps = out[..., :in_channels]  # second half is the learned variance
        if cond_free:
            out_free = decoder.apply(
                params, x, t_vec, precomputed_embeddings=embeddings, conditioning_free=True
            )
            eps_free = out_free[..., :in_channels]
            eps = (1 + cond_free_k) * eps - cond_free_k * eps_free
        return eps

    def step(x, i):
        t = ts[i]
        t_next = jnp.where(i + 1 < steps, ts[jnp.minimum(i + 1, steps - 1)], 0)
        a_t = alphas[t]
        a_next = jnp.where(i + 1 < steps, alphas[t_next], 1.0)
        eps = eps_fn(x, jnp.full((B,), t))
        x0 = (x - jnp.sqrt(1 - a_t) * eps) / jnp.sqrt(a_t)
        x0 = jnp.clip(x0, -1.0, 1.0)  # reference clip_denoised
        x = jnp.sqrt(a_next) * x0 + jnp.sqrt(1 - a_next) * eps
        return x, None

    x, _ = jax.lax.scan(step, x, jnp.arange(steps))
    return x


def dpm_solver_sample(decoder, params, embeddings, T_mel: int, rng, steps: int = 10,
                      in_channels: int = 100, temperature: float = 1.0,
                      cond_free: bool = True, cond_free_k: float = 2.0,
                      trained_steps: int = 4000):
    """DPM-Solver++(2M) sampling (Lu et al., arXiv:2211.01095) — the
    fast sampler the reference vendors as ``tortoise/dpm_solver.py`` (1,562
    LoC), reduced to the multistep data-prediction update actually used:
    ~10 steps match 30+ DDIM steps on the same probability-flow ODE.

    Same schedule/eps-model wiring as :func:`ddim_sample`; deterministic.
    """
    B = embeddings.shape[0]
    scale = 1000.0 / trained_steps
    betas = jnp.linspace(1e-4 * scale, 2e-2 * scale, trained_steps)
    abar = jnp.cumprod(1 - betas)
    ts = jnp.linspace(trained_steps - 1, 0, steps).astype(jnp.int32)
    r0, rng = jax.random.split(rng)
    x = jax.random.normal(r0, (B, T_mel, in_channels)) * temperature

    def eps_fn(x, t_vec):
        out = decoder.apply(params, x, t_vec, precomputed_embeddings=embeddings)
        eps = out[..., :in_channels]
        if cond_free:
            out_free = decoder.apply(
                params, x, t_vec, precomputed_embeddings=embeddings, conditioning_free=True
            )
            eps = (1 + cond_free_k) * eps - cond_free_k * out_free[..., :in_channels]
        return eps

    def x0_of(x, t):
        a = abar[t]
        al, sg = jnp.sqrt(a), jnp.sqrt(1 - a)
        x0 = (x - sg * eps_fn(x, jnp.full((B,), t))) / al
        return jnp.clip(x0, -1.0, 1.0)

    def lam_of(t):
        a = abar[t]
        return 0.5 * (jnp.log(a) - jnp.log1p(-a))

    def step(carry, i):
        x, x0_prev, h_prev = carry
        t, t_next = ts[i], ts[jnp.minimum(i + 1, steps - 1)]
        x0 = x0_of(x, t)
        lam, lam_next = lam_of(t), lam_of(t_next)
        h = lam_next - lam
        # 2M correction: extrapolate the data prediction with the previous
        # step's x0 (first step falls back to first order)
        r = h_prev / jnp.where(h == 0, 1.0, h)
        use_2m = (i > 0) & (h != 0)
        D = jnp.where(use_2m, x0 + (x0 - x0_prev) / (2.0 * jnp.where(r == 0, 1.0, r)), x0)
        a_next = abar[t_next]
        al_next, sg_next = jnp.sqrt(a_next), jnp.sqrt(1 - a_next)
        sg_cur = jnp.sqrt(1 - abar[t])
        x_new = (sg_next / sg_cur) * x - al_next * jnp.expm1(-h) * D
        # final step emits the clean data prediction
        x_new = jnp.where(i == steps - 1, x0, x_new)
        return (x_new, x0, h), None

    (x, _, _), _ = jax.lax.scan(
        step, (x, jnp.zeros_like(x), jnp.asarray(0.0)), jnp.arange(steps)
    )
    return x


SAMPLERS = {"ddim": ddim_sample, "dpm++2m": dpm_solver_sample}


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
        self.diffusion = DiffusionTts(
            model_channels=a.diff_model_channels, num_layers=a.diff_num_layers,
            in_channels=a.diff_in_channels, in_latent_channels=a.diff_in_latent_channels,
            out_channels=a.diff_out_channels, num_heads=a.diff_num_heads,
        )
        self.clvp = CLVP()
        from tts_tpu.vocoder.models.univnet_generator import UnivnetGenerator

        # the bundled UnivNet vocoder variant (reference tortoise/vocoder.py:277)
        self.vocoder = UnivnetGenerator(
            in_channels=a.voc_noise_dim, hidden_channels=a.voc_channel_size,
            cond_channels=100, upsample_factors=tuple(a.voc_strides),
            pad_mode="reflect", kpnet_lrelu_slope=0.2,
            final_lrelu_slope=0.2, kpnet_residual_style="per_block",
        )
        self.tokenizer = VoiceBpeTokenizer()
        self.ar_params = None
        self.diff_params = None
        self.clvp_params = None  # optional reranker (converted checkpoint)
        self.vocoder_params = None
        self.rlg_auto_state = None  # random-voice latent generators
        self.rlg_diff_state = None
        self.mel_norms = None  # per-channel norms for the AR conditioning mel
        self.output_sample_rate = config.audio.output_sample_rate
        self._jit = {}  # one fused XLA program per (stage, static-args)

    def _jitted(self, key, make_fn):
        """Cache a jitted stage function — eager flax ``apply`` dispatches
        every primitive separately, which is pathological over the
        remote-TPU tunnel."""
        if key not in self._jit:
            self._jit[key] = jax.jit(make_fn())
        return self._jit[key]

    @classmethod
    def init_from_config(cls, config: TortoiseConfig, samples=None):
        return cls(config)

    def init_params(self, rng, t_text: int = 12, t_mel: int = 20, t_cond: int = 32):
        r1, r2 = jax.random.split(rng)
        a = self.config.model_args
        self.ar_params = self.autoregressive.init(
            r1,
            jnp.zeros((1, t_cond, 80)),
            jnp.zeros((1, t_text), jnp.int32),
            jnp.zeros((1, t_mel), jnp.int32),
            method=self.autoregressive.init_all,
        )
        self.diff_params = self.diffusion.init(
            r2,
            jnp.zeros((1, t_mel * 4, a.diff_in_channels)),
            jnp.zeros((1,)),
            jnp.zeros((1, t_mel, a.diff_in_latent_channels)),
            jnp.zeros((1, t_cond, a.diff_in_channels)),
            method=self.diffusion.init_all,
        )
        return self.ar_params, self.diff_params

    def quantize_weights_int8(self, compute_dtype=None) -> None:
        """Serving optimization: int8 weight-only storage for the UnifiedVoice
        AR stack (see ``ops/quant.py`` and the XTTS counterpart) — the
        autoregressive decode is HBM-bandwidth-bound."""
        from tts_tpu.ops.quant import install_int8

        install_int8(self, ("ar_params",), compute_dtype)

    def _dq(self, params):
        from tts_tpu.ops.quant import maybe_dequantize

        return maybe_dequantize(self, params)

    def rerank(self, text_tokens: jnp.ndarray, candidate_codes: jnp.ndarray) -> jnp.ndarray:
        """CLVP scores for k candidate code sequences (reference
        ``tortoise.py`` clvp reranking); requires ``clvp_params``."""
        k = candidate_codes.shape[0]
        text = jnp.broadcast_to(text_tokens, (k, text_tokens.shape[-1]))
        return self.clvp.apply(self.clvp_params, text, candidate_codes)

    def get_conditioning_latents(self, voice_samples):
        """Reference ``tortoise.py:405 get_conditioning_latents`` (averaging
        mode 0): ``voice_samples`` is a list of ``(wav_22050, wav_24000)``
        numpy pairs → (auto_latent [1,1,D], diffusion_latent [1,2*MC]).
        Per-clip latents are averaged (reference ``autoregressive.py:442``
        / ``diffusion_decoder.py:271`` — with mode-0 equal-length clips the
        time-concat mean equals the mean of per-clip means)."""
        a = self.config.model_args
        auto_lats, diff_lats = [], []
        ar_cond = self._jitted("ar_cond", lambda: lambda p, m: self.autoregressive.apply(
            self._dq(p), m, method=self.autoregressive.get_conditioning))
        diff_cond = self._jitted("diff_cond", lambda: lambda p, m: self.diffusion.apply(
            p, wav_to_univnet_mel(m), method=self.diffusion.get_conditioning))
        for wav22, wav24 in voice_samples:
            cond = format_conditioning(wav22, mel_norms=self.mel_norms)
            auto_lats.append(ar_cond(self.ar_params, cond))
            clip = pad_or_truncate(np.asarray(wav24, np.float32).reshape(-1), 102400)
            diff_lats.append(diff_cond(self.diff_params, jnp.asarray(clip)[None]))
        auto = jnp.mean(jnp.stack(auto_lats), axis=0)
        diff = jnp.mean(jnp.stack(diff_lats), axis=0)
        return auto, diff

    def get_random_conditioning_latents(self, rng):
        """Random-voice latents via the converted RLG nets (reference
        ``tortoise.py:482``); falls back to scaled normal draws when the
        ``rlg_auto.pth``/``rlg_diffuser.pth`` weights are not loaded."""
        r1, r2 = jax.random.split(rng)
        D = self.config.model_args.ar_model_dim
        MC2 = 2 * self.config.model_args.diff_model_channels
        if self.rlg_auto_state is not None and self.rlg_diff_state is not None:
            auto = random_latent_converter_apply(self.rlg_auto_state, r1, D)
            diff = random_latent_converter_apply(self.rlg_diff_state, r2, MC2)
            return auto[:, None, :], diff
        return (jax.random.normal(r1, (1, 1, D)) * 0.02,
                jax.random.normal(r2, (1, MC2)) * 0.02)

    def inference(self, text_tokens: jnp.ndarray, cond_mels: Optional[jnp.ndarray] = None,
                  rng=None, max_mel_tokens: int = 100,
                  diffusion_iterations: Optional[int] = None,
                  auto_latent: Optional[jnp.ndarray] = None,
                  diffusion_latent: Optional[jnp.ndarray] = None,
                  diffusion_cond_mels: Optional[jnp.ndarray] = None,
                  num_samples: int = 1, vocode: bool = True,
                  sampler: Optional[str] = None,
                  cond_free: Optional[bool] = None):
        """text tokens + voice conditioning → mel (+ wav when the bundled
        vocoder weights are loaded) — reference ``tortoise.py:599``.

        Conditioning: either precomputed latents (``auto_latent``
        [1,1,D] + ``diffusion_latent`` [1,2*MC]) or mels (``cond_mels``
        [B,T,80] tacotron-domain for the AR; ``diffusion_cond_mels``
        [B,T,100] univnet-domain, reference ``wav_to_univnet_mel``).
        ``num_samples > 1`` draws k AR candidates and picks the best by
        CLVP (when loaded) or by AR length heuristic.
        """
        a = self.config.model_args
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        r1, r2 = jax.random.split(rng)
        if auto_latent is None:
            if cond_mels is None:
                raise ValueError("pass auto_latent or cond_mels")
            auto_latent = self._jitted("ar_cond", lambda: lambda p, m: self.autoregressive.apply(
                self._dq(p), m, method=self.autoregressive.get_conditioning))(self.ar_params, cond_mels)
        if diffusion_latent is None:
            if diffusion_cond_mels is None:
                raise ValueError(
                    "pass diffusion_latent or diffusion_cond_mels (univnet-"
                    "domain, reference tortoise.py:446) — 80-ch AR mels are "
                    "not a valid substitute"
                )
            diffusion_latent = self._jitted(
                "diff_cond_mel", lambda: lambda p, m: self.diffusion.apply(
                    p, m, method=self.diffusion.get_conditioning)
            )(self.diff_params, diffusion_cond_mels)
        B = text_tokens.shape[0]
        k = max(1, num_samples)
        if k > 1 and B > 1:
            raise ValueError(
                "num_samples > 1 (CLVP best-of-k) supports batch size 1; "
                "got B={} — run utterances separately".format(B)
            )
        text_rep = jnp.repeat(text_tokens, k, axis=0)
        cond_rep = jnp.repeat(auto_latent, k, axis=0)
        gen = self._jitted(
            ("generate", max_mel_tokens, a.temperature, a.top_p, a.repetition_penalty),
            lambda: lambda p, c, t, r: self.autoregressive.apply(
                self._dq(p), c, t, r, max_new_tokens=max_mel_tokens,
                temperature=a.temperature, top_p=a.top_p,
                repetition_penalty=a.repetition_penalty,
                method=self.autoregressive.generate,
            ),
        )(self.ar_params, cond_rep, text_rep, r1)
        codes = np.asarray(gen["codes"])
        if k > 1 and B == 1:
            fixed = fix_autoregressive_codes(codes, a.ar_stop_mel_token)
            if self.clvp_params is not None:
                scores = np.asarray(self.rerank(text_tokens[0], jnp.asarray(fixed)))
            else:
                scores = np.asarray(gen["lengths"], np.float32)  # prefer non-degenerate
            best = int(np.argmax(scores))
            codes = codes[best][None]
            lengths = gen["lengths"][best][None]
        else:
            lengths = gen["lengths"]
        codes = fix_autoregressive_codes(codes, a.ar_stop_mel_token)

        # Teacher-forced re-run over the fixed codes for the diffusion
        # conditioning latents (reference tortoise.py:761 return_latent=True)
        _, _, mel_latents = self._jitted(
            "teacher_forced", lambda: lambda p, cl, t, c: self.autoregressive.apply(self._dq(p), cl, t, c)
        )(self.ar_params, auto_latent, text_tokens, jnp.asarray(codes))
        latents = mel_latents[:, :-2]  # strip the start/stop positions

        # cut at end-of-speech so the diffusion model can terminate; round
        # the cut UP to a bucket boundary (the trimmed-off latents encode
        # the calm/silence continuation, so padded positions carry real
        # context) — a data-dependent exact length would recompile the
        # diffusion + vocoder programs for nearly every utterance on TPU
        calm = min(CALM_TOKEN, a.ar_stop_mel_token - 1)
        n_true = max(1, trim_index_at_calm(codes[0], calm_token=calm))
        bucket = int(getattr(a, "diffusion_length_bucket", 32) or 1)
        n_keep = min(-(-n_true // bucket) * bucket, latents.shape[1])
        latents = latents[:, :n_keep]

        # 22.05 kHz code frames → 24 kHz output frames (tortoise.py:132)
        T_mel = latents.shape[1] * 4 * 24000 // 22050
        T_true = n_true * 4 * 24000 // 22050
        sampler_name = sampler if sampler is not None else getattr(a, "sampler", "ddim")
        steps = diffusion_iterations or a.diffusion_iterations
        use_cond_free = a.cond_free if cond_free is None else cond_free
        sampler_fn = SAMPLERS.get(sampler_name, ddim_sample)

        def _make_diffuse():
            def fn(p, lat, dlat, rng_d):
                emb = self.diffusion.apply(
                    p, lat, dlat, T_mel, method=self.diffusion.timestep_independent
                )
                mel = sampler_fn(
                    self.diffusion, p, emb, T_mel, rng_d, steps=steps,
                    in_channels=a.diff_in_channels,
                    temperature=a.diffusion_temperature,
                    cond_free=use_cond_free, cond_free_k=a.cond_free_k,
                )
                return denormalize_tacotron_mel(mel)
            return fn

        mel = self._jitted(("diffuse", sampler_name, steps, T_mel, use_cond_free), _make_diffuse)(
            self.diff_params, latents, diffusion_latent, r2
        )
        out = {"mel": mel, "codes": jnp.asarray(codes), "code_lengths": lengths}
        if vocode and self.vocoder_params is not None:
            r3 = jax.random.fold_in(r2, 1)
            out["wav"] = self.vocode(mel, r3)
        return out

    def vocode(self, mel: jnp.ndarray, rng) -> jnp.ndarray:
        """Denormalized log-mel [B, T, 100] → wav [B, T*256] via the bundled
        UnivNet (reference ``tortoise/vocoder.py:363 inference``: 10 silence
        frames appended against edge artifacts, trimmed post-hoc)."""
        a = self.config.model_args
        hop = int(np.prod(a.voc_strides))
        B, T, _ = mel.shape
        pad = jnp.full((B, 10, mel.shape[-1]), LOG_MEL_PAD, mel.dtype)
        melp = jnp.concatenate([mel, pad], axis=1)
        noise = jax.random.normal(rng, (B, melp.shape[1], a.voc_noise_dim))
        wav = self._jitted(
            "vocode", lambda: lambda p, m, z: self.vocoder.apply(p, m, z)
        )(self.vocoder_params, melp, noise)[..., 0]
        wav = wav[:, : hop * T]
        return jnp.clip(wav, -1.0, 1.0)

    # quality/speed presets (reference ``tortoise.py:556``): values override
    # config defaults; explicit kwargs override the preset
    PRESETS = {
        "single_sample": {"num_autoregressive_samples": 8, "diffusion_iterations": 10,
                          "sampler": "ddim"},
        "ultra_fast": {"num_autoregressive_samples": 16, "diffusion_iterations": 10,
                       "sampler": "ddim"},
        "ultra_fast_old": {"num_autoregressive_samples": 16, "diffusion_iterations": 30,
                           "cond_free": False},
        "very_fast": {"num_autoregressive_samples": 32, "diffusion_iterations": 30,
                      "sampler": "dpm++2m"},
        "fast": {"num_autoregressive_samples": 5, "diffusion_iterations": 50,
                 "sampler": "ddim"},
        "fast_old": {"num_autoregressive_samples": 96, "diffusion_iterations": 80},
        "standard": {"num_autoregressive_samples": 5, "diffusion_iterations": 200},
        "high_quality": {"num_autoregressive_samples": 256, "diffusion_iterations": 400},
    }

    def synthesize(self, text: str, config=None, speaker_id: Optional[str] = None,
                   speaker_wav=None, voice_dirs=None, language=None, rng=None,
                   **kwargs):
        """Full text→speech (reference ``tortoise.py:503 synthesize``):
        resolves the voice (reference wav paths, a voice directory, or the
        random-voice latent generators), tokenizes, and runs the pipeline.
        Returns ``{"wav": np.ndarray}`` at 24 kHz for the Synthesizer
        dispatch (``utils/synthesizer.py``)."""
        import glob as _glob

        from tts_tpu.audio.numpy_transforms import load_wav

        a = self.config.model_args
        rng = rng if rng is not None else jax.random.PRNGKey(
            int(kwargs.pop("seed", 0))
        )
        preset = kwargs.pop("preset", None)
        if preset is not None:
            if preset not in self.PRESETS:
                raise ValueError(
                    f"unknown tortoise preset {preset!r}; known: "
                    f"{sorted(self.PRESETS)}"
                )
            # preset fills defaults; explicit kwargs keep priority
            for k, v in self.PRESETS[preset].items():
                kwargs.setdefault(k, v)
        wav_paths = []
        if speaker_wav is not None:
            wav_paths = [speaker_wav] if isinstance(speaker_wav, str) else list(speaker_wav)
        elif voice_dirs is not None and speaker_id not in (None, "random"):
            dirs = [voice_dirs] if isinstance(voice_dirs, str) else list(voice_dirs)
            for d in dirs:
                wav_paths += sorted(_glob.glob(os.path.join(d, speaker_id, "*.wav")))
            if not wav_paths:
                raise ValueError(f"no reference wavs for voice {speaker_id!r} in {dirs}")
        elif speaker_id not in (None, "random"):
            raise ValueError(
                f"speaker {speaker_id!r} requested but no speaker_wav or "
                "voice_dirs given — pass voice_dirs (reference voice folders) "
                "or use speaker_id='random'"
            )
        if wav_paths:
            samples = [
                (load_wav(filename=p, sample_rate=22050, resample=True),
                 load_wav(filename=p, sample_rate=24000, resample=True))
                for p in wav_paths
            ]
            auto_latent, diffusion_latent = self.get_conditioning_latents(samples)
        else:  # "random" voice
            r_v, rng = jax.random.split(rng)
            auto_latent, diffusion_latent = self.get_random_conditioning_latents(r_v)

        ids = self.tokenizer.encode(text)
        ids = ids + [a.ar_stop_text_token]  # reference tortoise.py:677 pad
        if len(ids) >= 400:
            raise ValueError(
                "Too much text for one Tortoise pass; split into sentences "
                f"(got {len(ids)} tokens, reference cap 400)"
            )
        text_tokens = jnp.asarray(np.asarray(ids, np.int32)[None])
        out = self.inference(
            text_tokens,
            rng=rng,
            auto_latent=auto_latent,
            diffusion_latent=diffusion_latent,
            max_mel_tokens=kwargs.pop("max_mel_tokens", 500),
            diffusion_iterations=kwargs.pop(
                "diffusion_iterations", a.diffusion_iterations),
            num_samples=kwargs.pop(
                "num_autoregressive_samples", a.num_autoregressive_samples),
            sampler=kwargs.pop("sampler", None),
            cond_free=kwargs.pop("cond_free", None),
        )
        if "wav" not in out:
            raise RuntimeError(
                "tortoise vocoder weights not loaded (vocoder.pth missing "
                "from the checkpoint dir)"
            )
        return {
            "wav": np.asarray(out["wav"][0]),
            "text_inputs": ids,
            "conditioning_latents": (auto_latent, diffusion_latent),
        }


def _load_or_convert(path_torch: str, convert_fn, cache_suffix="_flax.msgpack"):
    """Convert a torch sub-checkpoint once, cache the msgpack beside it."""
    import os

    from tts_tpu.utils.io import load_checkpoint, save_checkpoint

    out = os.path.splitext(path_torch)[0] + cache_suffix
    if os.path.isfile(out):
        params, _, _ = load_checkpoint(out)
        return params
    from tts_tpu.utils.convert import load_torch_checkpoint

    params = convert_fn(load_torch_checkpoint(path_torch))
    save_checkpoint(out, params)
    params, _, _ = load_checkpoint(out)
    return params


def load_tortoise_checkpoint(model: "Tortoise", checkpoint_dir: str) -> "Tortoise":
    """Load the reference tortoise-v2 zoo layout (``autoregressive.pth``,
    ``diffusion_decoder.pth``, ``clvp2.pth``, ``vocoder.pth``,
    ``mel_norms.pth``, ``rlg_auto.pth``, ``rlg_diffuser.pth``), converting
    each to flax on first use (reference ``models/tortoise.py
    load_checkpoint``)."""
    from tts_tpu.utils.convert import (
        convert_clvp,
        convert_diffusion_decoder,
        convert_tortoise_univnet,
        convert_unified_voice,
        load_torch_checkpoint,
    )

    a = model.config.model_args
    ar = os.path.join(checkpoint_dir, "autoregressive.pth")
    diff = os.path.join(checkpoint_dir, "diffusion_decoder.pth")
    clvp = os.path.join(checkpoint_dir, "clvp2.pth")
    voc = os.path.join(checkpoint_dir, "vocoder.pth")
    if os.path.isfile(ar):
        model.ar_params = {"params": _load_or_convert(
            ar, lambda s: convert_unified_voice(s, layers=a.ar_layers))["params"]}
    if os.path.isfile(diff):
        model.diff_params = {"params": _load_or_convert(
            diff, lambda s: convert_diffusion_decoder(s, num_layers=a.diff_num_layers))["params"]}
    if os.path.isfile(clvp):
        model.clvp_params = {"params": _load_or_convert(clvp, convert_clvp)["params"]}
    if os.path.isfile(voc):
        model.vocoder_params = {"params": _load_or_convert(
            voc, convert_tortoise_univnet)["params"]}
    norms = os.path.join(checkpoint_dir, "mel_norms.pth")
    if os.path.isfile(norms):
        loaded = load_torch_checkpoint(norms)
        model.mel_norms = np.asarray(
            loaded if not isinstance(loaded, dict) else next(iter(loaded.values())),
            np.float32,
        )
    for attr, name in (("rlg_auto_state", "rlg_auto.pth"),
                       ("rlg_diff_state", "rlg_diffuser.pth")):
        p = os.path.join(checkpoint_dir, name)
        if os.path.isfile(p):
            setattr(model, attr, {
                k: np.asarray(v, np.float32)
                for k, v in load_torch_checkpoint(p).items()
            })
    return model


Tortoise.load_checkpoint_dir = load_tortoise_checkpoint


def _tortoise_load_checkpoint(self, config=None, checkpoint_dir: str = None, **kwargs):
    """Synthesizer dir-model contract (``utils/synthesizer.py
    _load_tts_from_dir``): converts the reference tortoise-v2 zoo file
    layout on first use."""
    return load_tortoise_checkpoint(self, checkpoint_dir)


Tortoise.load_checkpoint = _tortoise_load_checkpoint
