"""XTTS GPT — conditioned autoregressive decoder over mel codes
(reference ``TTS/tts/layers/xtts/gpt.py:88`` + ``perceiver_encoder.py``).

Sequence layout: ``[cond_latents | start_text text… stop_text | start_audio
codes… stop_audio]``; text and mel segments carry separate learned position
tables, matching the reference so converted checkpoints line up.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .gpt_core import GPT2Core, causal_mask, sample_logits


class AttentionBlock(nn.Module):
    """Self-attention block for the conditioning encoder
    (reference ``latent_encoder.py`` AttentionBlock)."""

    dim: int
    heads: int

    @staticmethod
    def num_groups(channels: int) -> int:
        """Reference ``latent_encoder.py:25`` normalization() group count."""
        groups = 32 if channels > 64 else (16 if channels > 16 else 8)
        while channels % groups != 0:
            groups //= 2
        return groups

    @nn.compact
    def __call__(self, x):  # [B, T, D]
        h = nn.GroupNorm(num_groups=self.num_groups(self.dim), name="norm")(x)
        B, T, D = h.shape
        qkv = nn.Dense(3 * D, name="qkv")(h).reshape(B, T, 3, self.heads, D // self.heads)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        scores = jnp.einsum("bthd,bshd->bhts", q, k) / math.sqrt(D // self.heads)
        out = jnp.einsum("bhts,bshd->bthd", nn.softmax(scores, -1), v).reshape(B, T, D)
        # reference quirk (latent_encoder.py:109): x is reassigned to norm(x)
        # before the residual, so the skip rides the NORMALIZED input
        return h + nn.Dense(D, name="proj_out")(out)


class ConditioningEncoder(nn.Module):
    """mel [B, T, 80] → conditioning features [B, T, D]
    (reference ``latent_encoder.py:119``)."""

    embedding_dim: int
    attn_blocks: int = 6
    num_attn_heads: int = 4

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.embedding_dim, name="init")(x)
        for i in range(self.attn_blocks):
            h = AttentionBlock(self.embedding_dim, self.num_attn_heads, name=f"attn_{i}")(h)
        return h


class PerceiverResampler(nn.Module):
    """32 learned latents cross-attend to conditioning features.

    Mirrors the reference computation exactly (``perceiver_encoder.py:225``):
    no pre-norms, queries prepended to the cross-attention context, fused
    ``to_kv`` projection, GEGLU feed-forward with inner dim ``dim*mult*2/3``,
    and a final RMSNorm — so converted torch checkpoints line up 1:1."""

    dim: int
    depth: int = 2
    num_latents: int = 32
    dim_head: int = 64
    heads: int = 8
    ff_mult: int = 4

    @nn.compact
    def __call__(self, ctx):  # ctx: [B, S, D]
        B = ctx.shape[0]
        latents = self.param(
            "latents", nn.initializers.normal(0.02), (self.num_latents, self.dim)
        )
        x = jnp.broadcast_to(latents[None], (B, self.num_latents, self.dim))
        inner = self.dim_head * self.heads
        ff_inner = int(self.dim * self.ff_mult * 2 / 3)
        for i in range(self.depth):
            kv_src = jnp.concatenate([x, ctx], axis=1)
            q = nn.Dense(inner, use_bias=False, name=f"to_q_{i}")(x)
            kv = nn.Dense(2 * inner, use_bias=False, name=f"to_kv_{i}")(kv_src)
            k, v = jnp.split(kv, 2, axis=-1)
            q = q.reshape(B, -1, self.heads, self.dim_head)
            k = k.reshape(B, -1, self.heads, self.dim_head)
            v = v.reshape(B, -1, self.heads, self.dim_head)
            scores = jnp.einsum("bthd,bshd->bhts", q, k) / math.sqrt(self.dim_head)
            out = jnp.einsum("bhts,bshd->bthd", nn.softmax(scores, -1), v)
            out = out.reshape(B, -1, inner)
            x = x + nn.Dense(self.dim, use_bias=False, name=f"to_out_{i}")(out)
            ff = nn.Dense(2 * ff_inner, name=f"ff1_{i}")(x)
            val, gate = jnp.split(ff, 2, axis=-1)
            x = x + nn.Dense(self.dim, name=f"ff2_{i}")(nn.gelu(gate, approximate=False) * val)
        gamma = self.param("norm_gamma", nn.initializers.ones, (self.dim,))
        norm = jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
        return x / norm * math.sqrt(self.dim) * gamma


class XttsGPT(nn.Module):
    """(reference ``gpt.py:88`` GPT)"""

    layers: int = 30
    model_dim: int = 1024
    heads: int = 16
    number_text_tokens: int = 6681
    num_audio_tokens: int = 1026
    start_audio_token: int = 1024
    stop_audio_token: int = 1025
    start_text_token: int = 261
    stop_text_token: int = 0
    max_text_tokens: int = 402
    max_mel_tokens: int = 605
    max_prompt_tokens: int = 70
    code_stride_len: int = 1024
    use_perceiver_resampler: bool = True
    use_remat: bool = False  # checkpoint block activations during training

    def setup(self):
        D = self.model_dim
        self.conditioning_encoder = ConditioningEncoder(
            D, attn_blocks=6, num_attn_heads=self.heads, name="conditioning_encoder"
        )
        if self.use_perceiver_resampler:
            self.conditioning_perceiver = PerceiverResampler(
                dim=D, depth=2, num_latents=32, dim_head=64, heads=8, name="conditioning_perceiver"
            )
        self.text_embedding = nn.Embed(self.number_text_tokens, D, name="text_embedding")
        self.mel_embedding = nn.Embed(self.num_audio_tokens, D, name="mel_embedding")
        self.text_pos_embedding = self.param(
            "text_pos_embedding", nn.initializers.normal(0.02), (self.max_text_tokens + 2, D)
        )
        self.mel_pos_embedding = self.param(
            "mel_pos_embedding", nn.initializers.normal(0.02), (self.max_mel_tokens + 3, D)
        )
        self.gpt = GPT2Core(
            layers=self.layers, dim=D, heads=self.heads, remat=self.use_remat, name="gpt"
        )
        self.final_norm = nn.LayerNorm(epsilon=1e-5, name="final_norm")
        self.text_head = nn.Dense(self.number_text_tokens, name="text_head")
        self.mel_head = nn.Dense(self.num_audio_tokens, name="mel_head")

    # ------------------------------------------------------------------
    def get_style_emb(self, cond_mels: jnp.ndarray) -> jnp.ndarray:
        """cond mel [B, T, 80] → conditioning latents [B, 32|T', D]
        (reference ``gpt.py:353``)."""
        h = self.conditioning_encoder(cond_mels)
        if self.use_perceiver_resampler:
            h = self.conditioning_perceiver(h)
        # without the perceiver (XTTS v1.x layout) every conditioning frame
        # stays a prompt latent (reference gpt.py:362-364 returns (b, d, s))
        return h

    def _embed_text(self, text_ids):
        emb = self.text_embedding(text_ids)
        return emb + self.text_pos_embedding[None, : text_ids.shape[1]]

    def _embed_mel(self, mel_ids, offset: int = 0):
        emb = self.mel_embedding(mel_ids)
        pos = jax.lax.dynamic_slice_in_dim(self.mel_pos_embedding, offset, mel_ids.shape[1], 0)
        return emb + pos[None]

    def build_sequence(
        self,
        text_inputs: jnp.ndarray,  # [B, T_text] (no special tokens)
        text_lengths: jnp.ndarray,
        audio_codes: jnp.ndarray,  # [B, T_mel] codes (no special tokens)
        code_lengths: jnp.ndarray,
        cond_mels: Optional[jnp.ndarray] = None,  # [B, T_cond, 80]
        cond_latents: Optional[jnp.ndarray] = None,
    ):
        """Embedding phase of the teacher-forced forward: wrapped token
        sequences → concatenated GPT input [B, L_c+T_text+T_mel, D].
        Split out from :meth:`__call__` so the transformer core can run
        under ``shard_map`` (sequence-parallel ring attention; the pre/post
        phases stay data-parallel)."""
        B = text_inputs.shape[0]
        if cond_latents is None:
            cond_latents = self.get_style_emb(cond_mels)
        L_c = cond_latents.shape[1]

        # wrap segments with start/stop tokens; pad area filled with stop
        # tokens (reference set_mel_padding / set_inputs_and_targets)
        t_idx = jnp.arange(text_inputs.shape[1])[None]
        text_in = jnp.where(t_idx < text_lengths[:, None], text_inputs, self.stop_text_token)
        text_wrapped = jnp.concatenate(
            [
                jnp.full((B, 1), self.start_text_token),
                text_in,
                jnp.full((B, 1), self.stop_text_token),
            ],
            axis=1,
        )
        m_idx = jnp.arange(audio_codes.shape[1])[None]
        codes_in = jnp.where(m_idx < code_lengths[:, None], audio_codes, self.stop_audio_token)
        mel_wrapped = jnp.concatenate(
            [
                jnp.full((B, 1), self.start_audio_token),
                codes_in,
                jnp.full((B, 1), self.stop_audio_token),
            ],
            axis=1,
        )

        text_emb = self._embed_text(text_wrapped)
        mel_emb = self._embed_mel(mel_wrapped)
        h = jnp.concatenate([cond_latents, text_emb, mel_emb], axis=1)
        return h, {"text_wrapped": text_wrapped, "mel_wrapped": mel_wrapped, "L_c": L_c}

    def finalize(
        self,
        h: jnp.ndarray,  # transformer-core output [B, L, D]
        text_wrapped: jnp.ndarray,
        mel_wrapped: jnp.ndarray,
        L_c: int,
        return_latent: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        """Head phase of the teacher-forced forward (after the core)."""
        h = self.final_norm(h)
        T_text = text_wrapped.shape[1]
        text_latents = h[:, L_c : L_c + T_text]
        mel_latents = h[:, L_c + T_text :]
        if return_latent:
            # latents aligned with code inputs (drop the last position which
            # predicts beyond stop)
            return {"latents": mel_latents[:, :-1]}

        # next-token prediction: logits at position i predict token i+1
        text_logits = self.text_head(text_latents[:, :-1])
        mel_logits = self.mel_head(mel_latents[:, :-1])
        text_targets = text_wrapped[:, 1:]
        mel_targets = mel_wrapped[:, 1:]
        return {
            "text_logits": text_logits,
            "mel_logits": mel_logits,
            "text_targets": text_targets,
            "mel_targets": mel_targets,
            "latents": mel_latents[:, :-1],
        }

    def __call__(
        self,
        text_inputs: jnp.ndarray,  # [B, T_text] (no special tokens)
        text_lengths: jnp.ndarray,
        audio_codes: jnp.ndarray,  # [B, T_mel] codes (no special tokens)
        code_lengths: jnp.ndarray,
        cond_mels: Optional[jnp.ndarray] = None,  # [B, T_cond, 80]
        cond_latents: Optional[jnp.ndarray] = None,
        return_latent: bool = False,
        train: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        """Teacher-forced forward → text/mel logits + mel latents
        (reference ``gpt.py:370``)."""
        h, aux = self.build_sequence(
            text_inputs, text_lengths, audio_codes, code_lengths,
            cond_mels=cond_mels, cond_latents=cond_latents,
        )
        h, _ = self.gpt(h, attn_mask=causal_mask(h.shape[1]))
        return self.finalize(h, return_latent=return_latent, **aux)

    # ------------------------------------------------------------------
    def prefill(
        self,
        cond_latents: jnp.ndarray,  # [B, L_c, D]
        text_inputs: jnp.ndarray,  # [B, T_text] token ids (unwrapped)
        text_lengths: jnp.ndarray,
        max_new_tokens: int = 600,
    ):
        """Run the conditioning+text prefix once; returns the decode state
        pytree consumed by :meth:`decode_chunk` (chunked streaming) or the
        full scan in :meth:`generate`."""
        B = text_inputs.shape[0]
        # ragged batches: pad positions become stop tokens (same convention
        # as the training forward above) so shorter rows see repeated stops
        # instead of arbitrary pad ids
        t_idx = jnp.arange(text_inputs.shape[1])[None]
        text_inputs = jnp.where(
            t_idx < text_lengths[:, None], text_inputs, self.stop_text_token
        )
        text_wrapped = jnp.concatenate(
            [
                jnp.full((B, 1), self.start_text_token),
                text_inputs,
                jnp.full((B, 1), self.stop_text_token),
            ],
            axis=1,
        )
        text_emb = self._embed_text(text_wrapped)
        start_emb = self._embed_mel(jnp.full((B, 1), self.start_audio_token), offset=0)
        prefix = jnp.concatenate([cond_latents, text_emb, start_emb], axis=1)
        L_pre = prefix.shape[1]
        max_len = L_pre + max_new_tokens

        caches = self.gpt.init_cache(B, max_len, prefix.dtype)
        pre_mask = causal_mask(L_pre)
        pre_mask = jnp.pad(pre_mask, ((0, 0), (0, 0), (0, 0), (0, max_len - L_pre)))
        h, caches = self.gpt(prefix, attn_mask=pre_mask, caches=caches, cache_index=0)
        h = self.final_norm(h)
        logits0 = self.mel_head(h[:, -1])
        return {
            "caches": caches,
            "cur_index": jnp.asarray(L_pre, jnp.int32),
            "tok_pos": jnp.asarray(1, jnp.int32),
            "last_logits": logits0,
            "last_h": h[:, -1],
            "rep_counts": jnp.zeros((B, self.num_audio_tokens), jnp.int32),
            "done": jnp.zeros((B,), bool),
            "out_len": jnp.zeros((B,), jnp.int32),
        }

    def decode_chunk(
        self,
        state: Dict,
        rng: jax.Array,
        chunk_size: int = 20,
        temperature: float = 0.75,
        top_k: int = 50,
        top_p: float = 0.85,
        repetition_penalty: float = 5.0,
    ):
        """Decode ``chunk_size`` tokens from a prefill/decode state.
        Returns (new_state, tokens [B, chunk], latents [B, chunk, D])."""
        # max cache length is static (cache array shape), not traced state
        max_len = state["caches"][0]["k"].shape[1]
        step = self._make_step(max_len, temperature, top_k, top_p, repetition_penalty)
        carry0 = (
            state["caches"], state["cur_index"], state["tok_pos"],
            state["last_logits"], state["last_h"], state["rep_counts"],
            state["done"], state["out_len"],
        )
        rngs = jax.random.split(rng, chunk_size)
        (caches, cur, pos, logits, h, rep, done, n), (toks, lats) = jax.lax.scan(
            step, carry0, rngs
        )
        new_state = {
            "caches": caches, "cur_index": cur, "tok_pos": pos,
            "last_logits": logits, "last_h": h, "rep_counts": rep,
            "done": done, "out_len": n,
        }
        return new_state, jnp.moveaxis(toks, 0, 1), jnp.moveaxis(lats, 0, 1)

    def _make_step(self, max_len, temperature, top_k, top_p, repetition_penalty):
        B = None  # inferred from carry

        def step(carry, rng_t):
            caches, cur_index, tok_pos, last_logits, last_h, rep_counts, done, out_len = carry
            tok = sample_logits(
                rng_t,
                last_logits,
                temperature=temperature,
                top_k=top_k,
                top_p=top_p,
                repetition_counts=rep_counts,
                repetition_penalty=repetition_penalty,
            )
            tok = jnp.where(done, self.stop_audio_token, tok)
            new_done = done | (tok == self.stop_audio_token)
            out_len = out_len + (~new_done).astype(jnp.int32)
            rep_counts = rep_counts.at[jnp.arange(tok.shape[0]), tok].add(1)

            emb = self.mel_embedding(tok)[:, None, :]
            pos_emb = jax.lax.dynamic_slice_in_dim(self.mel_pos_embedding, tok_pos, 1, 0)
            emb = emb + pos_emb[None]
            # decode-step validity is exactly "positions <= cur_index", so we
            # pass it as a scalar cache_len → enables the fused decode kernel
            h, new_caches = self.gpt(
                emb, caches=caches, cache_index=cur_index, cache_len=cur_index + 1
            )
            h = self.final_norm(h)
            logits = self.mel_head(h[:, -1])
            return (
                (new_caches, cur_index + 1, tok_pos + 1, logits, h[:, -1], rep_counts, new_done, out_len),
                # emit the hidden state that PREDICTED tok (reference latent
                # alignment: state at the previous position)
                (tok, last_h),
            )

        return step

    def generate(
        self,
        cond_latents: jnp.ndarray,  # [B, L_c, D]
        text_inputs: jnp.ndarray,  # [B, T_text] token ids (unwrapped)
        text_lengths: jnp.ndarray,
        rng: jax.Array,
        max_new_tokens: int = 600,
        temperature: float = 0.75,
        top_k: int = 50,
        top_p: float = 0.85,
        repetition_penalty: float = 5.0,
    ) -> Dict[str, jnp.ndarray]:
        """KV-cached autoregressive mel-code generation
        (reference ``gpt.py:583`` + HF generate).

        Returns codes ``[B, max_new_tokens]`` (stop-padded) and lengths.
        """
        state = self.prefill(cond_latents, text_inputs, text_lengths, max_new_tokens)
        state, tokens, latents = self.decode_chunk(
            state, rng, chunk_size=max_new_tokens,
            temperature=temperature, top_k=top_k, top_p=top_p,
            repetition_penalty=repetition_penalty,
        )
        return {"codes": tokens, "code_lengths": state["out_len"], "latents": latents}
