"""Bark — three-stage autoregressive audio generation
(reference ``TTS/tts/models/bark.py`` + ``layers/bark/{model,model_fine,
inference_funcs}.py``).

text → semantic tokens (AR GPT) → coarse EnCodec codes (AR GPT) → fine
codes (non-causal per-codebook GPT) → waveform via the flax EnCodec
decoder (``models/bark/encodec.py`` — no torch on the compute path).  All
generation loops are KV-cached ``lax.scan``s reusing
:class:`tts_tpu.models.xtts.gpt_core.GPT2Core`.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tts_tpu.models.xtts.gpt_core import GPT2Core, causal_mask, sample_logits

from .config import BarkConfig, BarkGPTArgs


class BarkGPT(nn.Module):
    """Causal GPT with learned positions and separate in/out vocabularies
    (reference ``bark/model.py:233``)."""

    args: BarkGPTArgs

    def setup(self):
        a = self.args
        self.wte = nn.Embed(a.input_vocab_size, a.n_embd, name="wte")
        self.wpe = self.param("wpe", nn.initializers.normal(0.02), (a.block_size, a.n_embd))
        self.core = GPT2Core(
            layers=a.n_layer, dim=a.n_embd, heads=a.n_head,
            use_bias=a.bias, gelu_exact=True, name="core",
        )
        self.lm_head = nn.Dense(a.output_vocab_size, use_bias=False, name="lm_head")

    def __call__(self, idx, caches=None, cache_index=None, position_offset=0, attn_mask=None,
                 cache_len=None, merge_context: bool = False):
        if merge_context:
            # reference semantic prompt (model.py:259): the first 256 text and
            # next 256 history tokens share positions via summed embeddings
            h = jnp.concatenate(
                [self.wte(idx[:, :256]) + self.wte(idx[:, 256:512]), self.wte(idx[:, 512:])],
                axis=1,
            )
        else:
            h = self.wte(idx)
        T = h.shape[1]
        pos = jax.lax.dynamic_slice_in_dim(self.wpe, position_offset, T, 0)
        h = h + pos[None]
        if attn_mask is None and cache_len is None:
            attn_mask = causal_mask(T)
        h, caches = self.core(h, attn_mask=attn_mask, caches=caches, cache_index=cache_index,
                              cache_len=cache_len)
        return self.lm_head(h), caches

    def generate(
        self,
        prompt: jnp.ndarray,  # [B, T_prompt]
        rng: jax.Array,
        max_new_tokens: int,
        eos_token: int,
        temperature: float = 0.7,
        top_k: int = 50,
        top_p: float = 0.95,
        logit_slice: Optional[int] = None,
        merge_context: bool = False,
        codebook_cycle: Optional[tuple] = None,
    ) -> Dict[str, jnp.ndarray]:
        """KV-cached AR sampling; ``logit_slice`` restricts sampling to the
        first N classes (semantic/coarse vocab subsets).
        ``codebook_cycle=(base, size, n)`` instead restricts step ``s`` to
        the vocab window ``[base + (s%n)·size, base + (s%n+1)·size)`` — the
        reference coarse loop's alternating codebook slices
        (``inference_funcs.py:447 logit_start_idx``)."""
        a = self.args
        B = prompt.shape[0]
        L_pre = prompt.shape[1] - (256 if merge_context else 0)
        max_len = L_pre + max_new_tokens
        # cache in the embedding (compute) dtype so bf16 serving halves KV
        # HBM traffic and prefill/decode logits agree for the scan carry
        caches = self.core.init_cache(B, max_len, self.wte.embedding.dtype)

        pre_mask = jnp.pad(causal_mask(L_pre), ((0, 0), (0, 0), (0, 0), (0, max_len - L_pre)))
        logits, caches = self(
            prompt, caches=caches, cache_index=0, attn_mask=pre_mask, merge_context=merge_context
        )
        last_logits = logits[:, -1]
        positions = jnp.arange(max_len)

        def step(carry, xs):
            rng_t, s_idx = xs
            caches, cur, last_logits, done, out_len = carry
            lg = last_logits
            if codebook_cycle is not None:
                base, size, n_cb = codebook_cycle
                lo = base + (s_idx % n_cb) * size
                v = jnp.arange(lg.shape[-1])
                lg = jnp.where((v >= lo) & (v < lo + size), lg, -jnp.inf)
            elif logit_slice is not None:
                lg = lg[:, :logit_slice]
            tok = sample_logits(rng_t, lg, temperature=temperature, top_k=top_k, top_p=top_p)
            tok = jnp.where(done, eos_token, tok)
            new_done = done | (tok == eos_token)
            out_len = out_len + (~new_done).astype(jnp.int32)
            # position_offset must advance past the cache length (reference
            # bark/model.py:212 position_ids = past_length + arange)
            logits, new_caches = self(
                tok[:, None], caches=caches, cache_index=cur, position_offset=cur,
                cache_len=cur + 1,
            )
            return (new_caches, cur + 1, logits[:, -1], new_done, out_len), tok

        rngs = jax.random.split(rng, max_new_tokens)
        toks0 = jnp.full((B, max_new_tokens), eos_token, jnp.int32)
        carry0 = (caches, jnp.asarray(L_pre, jnp.int32), last_logits,
                  jnp.zeros((B,), bool), jnp.zeros((B,), jnp.int32),
                  toks0, jnp.asarray(0, jnp.int32))

        # while_loop, not scan: decode stops as soon as every sequence has
        # sampled EOS (the reference host loop breaks there too,
        # inference_funcs.py:294) — a short utterance pays for its own
        # length, not the max_gen_duration_s budget
        def cond(carry):
            done, s_idx = carry[3], carry[6]
            return (s_idx < max_new_tokens) & ~jnp.all(done)

        def body(carry):
            caches, cur, lg, done, out_len, toks, s_idx = carry
            (caches, cur, lg, done, out_len), tok = step(
                (caches, cur, lg, done, out_len), (rngs[s_idx], s_idx)
            )
            toks = jax.lax.dynamic_update_slice(toks, tok[:, None], (0, s_idx))
            return (caches, cur, lg, done, out_len, toks, s_idx + 1)

        caches, _, _, done, out_len, toks, _ = jax.lax.while_loop(cond, body, carry0)
        return {"tokens": toks, "lengths": out_len}

    def generate_coarse_windows(
        self,
        sem_padded: jnp.ndarray,    # [1, S] semantic ctx, right-padded ≥256
        coarse_init: jnp.ndarray,   # [1, C] history in [0, n_hist), rest 0
        sem_starts: jnp.ndarray,    # [W] per-window semantic slice starts
        tail_starts: jnp.ndarray,   # [W] per-window coarse-tail slice starts
        valid_tails: jnp.ndarray,   # [W] valid tokens in each 630-wide tail
        write_starts: jnp.ndarray,  # [W] where each window's output lands
        rng: jax.Array,
        window_steps: int,          # tokens generated per window (60)
        max_coarse_history: int,    # tail width (630)
        infer_token: int,
        temperature: float,
        top_k: int,
        top_p: float,
        codebook_cycle: tuple,
    ) -> jnp.ndarray:
        """TPU-native coarse stage: the reference's sliding-window host loop
        (``inference_funcs.py:330``) re-built as ONE ``lax.scan`` over
        windows with fixed-shape buffers.  Every window slices its 256-token
        semantic context and ≤630-token coarse tail out of on-device
        buffers, prefills a fixed 887-token prompt (garbage tail masked via
        ``valid_len``), decodes ``window_steps`` tokens KV-cached, and
        writes them back — no host round-trips, one compile for the whole
        stage (the host-loop version compiled 11 distinct prompt shapes and
        paid a tunnel sync per window: 122 s steady-state for 8 s of audio).
        """
        W_PROMPT = 256 + 1 + max_coarse_history
        max_len = W_PROMPT + window_steps
        caches0 = self.core.init_cache(1, max_len, self.wte.embedding.dtype)
        base, size, n_cb = codebook_cycle
        rows = jnp.arange(W_PROMPT)
        cols = jnp.arange(max_len)

        def window_fn(carry, xs):
            coarse_buf, caches, rng = carry
            sem_start, tail_start, valid_tail, write_start = xs
            valid_len = 257 + valid_tail
            win = jax.lax.dynamic_slice(sem_padded, (0, sem_start), (1, 256))
            tail = jax.lax.dynamic_slice(
                coarse_buf, (0, tail_start), (1, max_coarse_history)
            )
            prompt = jnp.concatenate(
                [win, jnp.full((1, 1), infer_token, jnp.int32), tail], axis=1
            )
            mask = ((cols[None, :] <= rows[:, None]) & (cols[None, :] < valid_len))[None, None]
            logits, caches = self(prompt, caches=caches, cache_index=0, attn_mask=mask)
            V = logits.shape[-1]
            last = jax.lax.dynamic_slice(logits, (0, valid_len - 1, 0), (1, 1, V))[:, 0]
            v = jnp.arange(V)

            def step(c, xs2):
                caches, cur, lg = c
                r_t, s_idx = xs2
                lo = base + (s_idx % n_cb) * size
                lgm = jnp.where((v >= lo) & (v < lo + size), lg, -jnp.inf)
                tok = sample_logits(r_t, lgm, temperature=temperature,
                                    top_k=top_k, top_p=top_p)
                lgs, new_caches = self(
                    tok[:, None], caches=caches, cache_index=cur,
                    position_offset=cur, cache_len=cur + 1,
                )
                return (new_caches, cur + 1, lgs[:, -1]), tok

            rng, sub = jax.random.split(rng)
            rngs = jax.random.split(sub, window_steps)
            (caches, _, _), toks = jax.lax.scan(
                step, (caches, valid_len, last), (rngs, jnp.arange(window_steps))
            )
            coarse_buf = jax.lax.dynamic_update_slice(
                coarse_buf, jnp.moveaxis(toks, 0, 1).astype(coarse_buf.dtype),
                (0, write_start),
            )
            return (coarse_buf, caches, rng), None

        (coarse_buf, _, _), _ = jax.lax.scan(
            window_fn, (coarse_init, caches0, rng),
            (sem_starts, tail_starts, valid_tails, write_starts),
        )
        return coarse_buf


class BarkFineGPT(nn.Module):
    """Non-causal GPT predicting codebook ``k`` from codebooks ``<k``
    (reference ``bark/model_fine.py:142``)."""

    args: BarkGPTArgs

    def setup(self):
        a = self.args
        self.wtes = [
            nn.Embed(a.input_vocab_size, a.n_embd, name=f"wte_{i}")
            for i in range(a.n_codes_total)
        ]
        self.wpe = self.param("wpe", nn.initializers.normal(0.02), (a.block_size, a.n_embd))
        # FineBlock uses plain nn.LayerNorm (bias always on) + exact GELU
        self.core = GPT2Core(
            layers=a.n_layer, dim=a.n_embd, heads=a.n_head, gelu_exact=True, name="core"
        )
        self.lm_heads = [
            nn.Dense(a.output_vocab_size, use_bias=False, name=f"lm_head_{i}")
            for i in range(a.n_codes_given, a.n_codes_total)
        ]

    def init_all(self, idx: jnp.ndarray):
        """Trace every head so ``init`` creates all parameters."""
        outs = [
            self(k, idx) for k in range(self.args.n_codes_given, self.args.n_codes_total)
        ]
        return outs[0]

    def __call__(self, pred_idx: int, idx: jnp.ndarray):
        """idx: [B, T, n_codes_total]; predict codebook ``pred_idx``
        attending over the whole sequence (non-causal)."""
        B, T, _ = idx.shape
        h = 0.0
        # sum embeddings of codebooks < pred_idx + 1 (reference model_fine)
        for i in range(self.args.n_codes_total):
            contrib = self.wtes[i](idx[:, :, i])
            h = h + jnp.where(i <= pred_idx, 1.0, 0.0) * contrib
        h = h + self.wpe[None, :T]
        full_mask = jnp.ones((1, 1, T, T), bool)
        h, _ = self.core(h, attn_mask=full_mask)
        return self.lm_heads[pred_idx - self.args.n_codes_given](h)

    def generate_fine_windows(
        self,
        buf: jnp.ndarray,      # [1, T, n_codes_total] int32 codes buffer
        starts: jnp.ndarray,   # [W] per-window read offsets into ``buf``
        rels: jnp.ndarray,     # [W] first position each window may overwrite
        rng: jax.Array,
        n_coarse: int,         # codebooks already fixed by the coarse stage
        window: int,           # window width (reference: 1024)
        temperature: Optional[float],
        codebook_size: int,
    ) -> jnp.ndarray:
        """TPU-native fine stage: the reference's 512-hop sliding-window host
        loop (``inference_funcs.py:561-588``) as ONE ``lax.scan`` over
        windows.  Each window slices a fixed ``window``-wide view of the
        codes buffer, runs the 6 per-codebook non-causal forwards (static
        unroll), samples every frame at or past ``rel`` (earlier frames are
        overlap from the previous window / in-context history and stay
        fixed), and writes the window back.  One compile per (T, W) bucket
        instead of six unjitted full-sequence forwards per utterance — and
        sequences longer than ``block_size`` now work at all."""
        n_fine = self.args.n_codes_total

        def window_fn(carry, xs):
            buf, rng = carry
            start, rel = xs
            win = jax.lax.dynamic_slice(buf, (0, start, 0), (1, window, n_fine))
            pos = jnp.arange(window)
            for nn in range(n_coarse, n_fine):
                logits = self(nn, win)[:, :, :codebook_size]
                if temperature is None:
                    sampled = jnp.argmax(logits, axis=-1)
                else:
                    rng, sub = jax.random.split(rng)
                    sampled = jax.random.categorical(
                        sub, logits / temperature, axis=-1
                    )
                col = jnp.where(pos[None] < rel, win[:, :, nn], sampled.astype(win.dtype))
                win = win.at[:, :, nn].set(col)
            buf = jax.lax.dynamic_update_slice(buf, win, (0, start, 0))
            return (buf, rng), None

        (buf, _), _ = jax.lax.scan(window_fn, (buf, rng), (starts, rels))
        return buf


class Bark:
    """Host pipeline wrapper (reference ``models/bark.py:30``)."""

    def __init__(self, config: BarkConfig):
        self.config = config
        self.semantic_model = BarkGPT(args=config.semantic_config)
        self.coarse_model = BarkGPT(args=config.coarse_config)
        self.fine_model = BarkFineGPT(args=config.fine_config)
        self.semantic_params = None
        self.coarse_params = None
        self.fine_params = None
        self.encodec_vocoder = None  # flax EnCodec decoder bundle
        # each stage's apply is jit-compiled once per static-kwarg set
        # (jit handles shape buckets internally): eager flax dispatch pays
        # a per-op device round-trip that dominates wall-clock on a
        # tunneled TPU (measured 38.9 s eager vs 41 ms jitted for one
        # fine-stage window)
        self._jit_cache: Dict[tuple, Any] = {}

    def _jitted(self, key: tuple, make):
        fn = self._jit_cache.get(key)
        if fn is None:
            fn = self._jit_cache[key] = jax.jit(make())
        return fn

    @classmethod
    def init_from_config(cls, config: BarkConfig, samples=None):
        return cls(config)

    def quantize_weights_int8(self, compute_dtype=None) -> None:
        """Serving optimization: int8 weight-only storage for the three AR
        GPTs (see ``ops/quant.py`` and the XTTS counterpart) — Bark decode is
        likewise HBM-bandwidth-bound."""
        from tts_tpu.ops.quant import install_int8

        install_int8(
            self, ("semantic_params", "coarse_params", "fine_params"), compute_dtype
        )

    def _dq(self, params):
        from tts_tpu.ops.quant import maybe_dequantize

        return maybe_dequantize(self, params)

    def init_params(self, rng, t: int = 16):
        r1, r2, r3 = jax.random.split(rng, 3)
        tok = jnp.zeros((1, t), jnp.int32)
        self.semantic_params = self.semantic_model.init(r1, tok)
        self.coarse_params = self.coarse_model.init(r2, tok)
        self.fine_params = self.fine_model.init(
            r3,
            jnp.zeros((1, t, self.config.fine_config.n_codes_total), jnp.int32),
            method=self.fine_model.init_all,
        )
        return self.semantic_params, self.coarse_params, self.fine_params

    # -- voice cloning (reference inference_funcs.py:105 generate_voice) ---
    def generate_voice(self, wav: np.ndarray, hubert_params, tokenizer_params,
                       output_path: str = None, sample_rate: int = 16000):
        """Reference wav @16 kHz → Bark voice-prompt dict: semantic tokens
        via HuBERT layer-9 features + the LSTM semantic tokenizer
        (``models/bark/hubert.py``); coarse/fine codes via EnCodec when the
        codec is available (gated otherwise, like ``codes_to_audio``)."""
        from tts_tpu.audio.numpy_transforms import resample_wav
        from tts_tpu.models.bark.hubert import semantic_tokens_from_audio

        wav16 = np.asarray(wav, np.float32)
        if sample_rate != 16000:  # HuBERT operates at 16 kHz
            wav16 = resample_wav(wav16, sample_rate, 16000)
        semantic = semantic_tokens_from_audio(wav16, hubert_params, tokenizer_params)
        prompt = {"semantic_prompt": semantic}
        if self.encodec_vocoder is not None and self.encodec_vocoder.can_encode:
            # reference clip → 24 kHz → EnCodec codes (reference
            # generate_voice: encodec.encode on the resampled clip)
            wav24 = resample_wav(np.asarray(wav, np.float32), sample_rate, 24000)
            codes = self.encodec_vocoder.encode(wav24)  # [n_q, T]
            prompt["coarse_prompt"] = codes[:2]
            prompt["fine_prompt"] = codes
        if output_path:
            np.savez(output_path, **prompt)
        return prompt

    # -- stage 1: text → semantic (reference inference_funcs.py:178) -------
    def generate_text_semantic(self, text_tokens: np.ndarray, rng, max_gen_duration_s: float = 8.0,
                               temperature: float = 0.7, top_k: int = 50, top_p: float = 0.95,
                               semantic_history=None):
        c = self.config
        text = np.asarray(text_tokens) + c.TEXT_ENCODING_OFFSET
        text = text[:256]
        text = np.pad(text, (0, 256 - len(text)), constant_values=c.TEXT_PAD_TOKEN)
        if semantic_history is not None:
            # reference inference_funcs.py:214: last 256 tokens, right-padded
            history = np.asarray(semantic_history, np.int64)[-256:]
            history = np.pad(history, (0, 256 - len(history)),
                             constant_values=c.SEMANTIC_PAD_TOKEN)
        else:
            history = np.full(256, c.SEMANTIC_PAD_TOKEN)
        prompt = jnp.asarray(
            np.concatenate([text, history, [c.SEMANTIC_INFER_TOKEN]])[None], jnp.int32
        )
        n = int(max_gen_duration_s * c.SEMANTIC_RATE_HZ)
        fn = self._jitted(
            ("semantic", n, temperature, top_k, top_p),
            lambda: lambda p, prompt, rng: self.semantic_model.apply(
                p, prompt, rng, max_new_tokens=n,
                eos_token=c.SEMANTIC_VOCAB_SIZE, temperature=temperature,
                top_k=top_k, top_p=top_p, logit_slice=c.SEMANTIC_VOCAB_SIZE + 1,
                merge_context=True, method=self.semantic_model.generate,
            ),
        )
        out = fn(self._dq(self.semantic_params), prompt, rng)
        toks = np.asarray(out["tokens"][0])
        return toks[: int(out["lengths"][0])]

    # -- stage 2: semantic → coarse (reference inference_funcs.py:330) -----
    def generate_coarse(self, semantic_tokens: np.ndarray, rng, temperature: float = 0.7,
                        top_k: int = 50, top_p: float = 0.95, history=None,
                        max_coarse_history: int = 630, sliding_window_len: int = 60):
        """Reference sliding-window loop: per window the prompt is the
        256-token (padded) semantic context + COARSE_INFER + the last
        ≤630 generated coarse tokens, and each step's logits are restricted
        to the alternating codebook slice.  ``history``:
        ``(semantic_prompt [T], coarse_prompt [N_COARSE, T'])`` voice clone
        prompts (reference history trimming incl. the off-by-two
        time-alignment hack)."""
        c = self.config
        # fixed prompt layout: 256 semantic + INFER + tail + decode budget
        # must fit the model's learned positions (tiny test configs shrink)
        block = c.coarse_config.block_size
        sliding_window_len = min(sliding_window_len, max(1, (block - 257) // 2))
        max_coarse_history = min(max_coarse_history, block - 257 - sliding_window_len)
        ratio = c.COARSE_RATE_HZ / c.SEMANTIC_RATE_HZ * c.N_COARSE_CODEBOOKS
        max_sem_hist = int(np.floor(max_coarse_history / ratio))
        sem = np.asarray(semantic_tokens, np.int32)
        if history is not None:
            sem_hist = np.asarray(history[0], np.int32)
            cb2d = np.asarray(history[1], np.int32)
            # interleave codebooks with per-codebook vocab offsets
            flat = (cb2d + np.arange(cb2d.shape[0])[:, None] * c.CODEBOOK_SIZE).T.reshape(-1)
            flat = flat + c.SEMANTIC_VOCAB_SIZE
            n_sem = min(max_sem_hist, len(sem_hist) - len(sem_hist) % 2,
                        int(np.floor(len(flat) / ratio)))
            n_coarse = int(round(n_sem * ratio))
            sem_hist = sem_hist[-n_sem:] if n_sem > 0 else sem_hist[:0]
            flat = (flat[-n_coarse:] if n_coarse > 0 else flat[:0])[:-2]
        else:
            sem_hist = np.array([], np.int32)
            flat = np.array([], np.int32)

        n_steps = int(round(np.floor(len(sem) * ratio / c.N_COARSE_CODEBOOKS))
                      * c.N_COARSE_CODEBOOKS)
        n_steps = max(n_steps, c.N_COARSE_CODEBOOKS)
        x_semantic = np.concatenate([sem_hist, sem]).astype(np.int32)
        base_idx = len(sem_hist)
        n_hist_coarse = len(flat)

        # whole sliding-window stage on-device (generate_coarse_windows):
        # the host only lays out the static per-window slice offsets
        swl = int(sliding_window_len)
        mch = int(max_coarse_history)
        n_windows = -(-n_steps // swl)
        buf_len = max(mch, n_hist_coarse + n_windows * swl)
        coarse_init = np.zeros(buf_len, np.int32)
        coarse_init[:n_hist_coarse] = flat
        sem_padded = np.pad(x_semantic, (0, 256),
                            constant_values=c.COARSE_SEMANTIC_PAD_TOKEN)
        pos = n_hist_coarse + swl * np.arange(n_windows)
        sem_idx = base_idx + np.round(swl * np.arange(n_windows) / ratio).astype(int)
        sem_starts = np.maximum(0, sem_idx - max_sem_hist).astype(np.int32)
        tail_starts = np.maximum(0, pos - mch).astype(np.int32)
        valid_tails = np.minimum(mch, pos).astype(np.int32)
        write_starts = pos.astype(np.int32)

        coarse_params = self._dq(self.coarse_params)
        fn = self._jitted(
            ("coarse", swl, mch, temperature, top_k, top_p),
            lambda: lambda p, sem, init, ss, ts, vt, ws, rng: self.coarse_model.apply(
                p, sem, init, ss, ts, vt, ws, rng,
                window_steps=swl, max_coarse_history=mch,
                infer_token=c.COARSE_INFER_TOKEN,
                temperature=temperature, top_k=top_k, top_p=top_p,
                codebook_cycle=(c.SEMANTIC_VOCAB_SIZE, c.CODEBOOK_SIZE,
                                c.N_COARSE_CODEBOOKS),
                method=self.coarse_model.generate_coarse_windows,
            ),
        )
        buf = fn(
            coarse_params,
            jnp.asarray(sem_padded[None]), jnp.asarray(coarse_init[None]),
            jnp.asarray(sem_starts), jnp.asarray(tail_starts),
            jnp.asarray(valid_tails), jnp.asarray(write_starts), rng,
        )
        toks = np.asarray(buf[0])[n_hist_coarse:][:n_steps]
        # de-interleave into [N_COARSE, T] and remove vocab offsets
        toks = np.array(toks.reshape(-1, c.N_COARSE_CODEBOOKS).T)  # writable copy
        for i in range(c.N_COARSE_CODEBOOKS):
            toks[i] = np.clip(toks[i] - c.SEMANTIC_VOCAB_SIZE - i * c.CODEBOOK_SIZE, 0, c.CODEBOOK_SIZE - 1)
        return toks

    # -- stage 3: coarse → fine (reference inference_funcs.py:495) ---------
    def generate_fine(self, coarse_codes: np.ndarray, rng, temperature: float = 0.5,
                      history=None):
        """``history``: fine voice prompt [N_FINE, T_hist] — the last ≤512
        columns are prepended as in-context audio (reference
        inference_funcs.py:520 ``x_fine_history``) and stripped after.

        Windowing mirrors the reference exactly (1024-wide windows, 512
        hop, overlap frames held fixed — ``inference_funcs.py:549-588``);
        the host only lays out per-window offsets, the whole stage runs in
        :meth:`BarkFineGPT.generate_fine_windows` on device."""
        c = self.config
        n_fine = c.N_FINE_CODEBOOKS
        win = min(1024, c.fine_config.block_size)  # tiny test configs shrink
        hop = win // 2
        n_coarse = coarse_codes.shape[0]
        t_gen = coarse_codes.shape[1]
        codes = np.full((n_fine, t_gen), c.CODEBOOK_SIZE, np.int32)
        codes[:n_coarse] = coarse_codes
        n_hist = 0
        if history is not None:
            hist = np.asarray(history, np.int32)[:, -hop:]
            n_hist = hist.shape[1]
            codes = np.concatenate([hist[:n_fine], codes], axis=1)
        # pad right to ≥ one window, then to a hop multiple (shape bucket)
        T = max(win, codes.shape[1])
        T = -(-T // hop) * hop
        if T > codes.shape[1]:
            pad = np.full((n_fine, T - codes.shape[1]), c.CODEBOOK_SIZE, np.int32)
            codes = np.concatenate([codes, pad], axis=1)
        n_loops = max(0, int(np.ceil((t_gen - (win - n_hist)) / hop))) + 1
        starts = np.minimum(hop * np.arange(n_loops), T - win).astype(np.int32)
        fills = np.minimum(n_hist + hop * np.arange(n_loops), T - hop)
        rels = (fills - starts).astype(np.int32)
        fine_params = self._dq(self.fine_params)  # once per utterance
        fn = self._jitted(
            ("fine", n_coarse, win, temperature),
            lambda: lambda p, buf, s, r, rng: self.fine_model.apply(
                p, buf, s, r, rng,
                n_coarse=n_coarse, window=win, temperature=temperature,
                codebook_size=c.CODEBOOK_SIZE,
                method=self.fine_model.generate_fine_windows,
            ),
        )
        buf = fn(fine_params, jnp.asarray(codes.T[None]),
                 jnp.asarray(starts), jnp.asarray(rels), rng)
        return np.asarray(buf[0]).T[:, n_hist:n_hist + t_gen]  # [n_fine, T_gen]

    def codes_to_audio(self, fine_codes: np.ndarray) -> np.ndarray:
        """EnCodec decode via the flax decoder (``models/bark/encodec.py``;
        reference ``inference_funcs.py:599 codec_decode`` through the torch
        ``encodec`` package — here fully on-device)."""
        if self.encodec_vocoder is None:
            raise RuntimeError(
                "EnCodec decoder weights not loaded (no encodec checkpoint "
                "in the model dir); codes were generated successfully."
            )
        return self.encodec_vocoder.decode(np.asarray(fine_codes))

    def synthesize(self, text: str, config, rng=None, **kwargs) -> Dict:
        """Full 3-stage pipeline; tokenizes with the BERT tokenizer like the
        reference (``bark.py:34``) if available, else bytes."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        try:
            from transformers import BertTokenizer

            tok = BertTokenizer.from_pretrained(
                "bert-base-multilingual-cased", local_files_only=True
            )
            text_tokens = np.asarray(tok.encode(text, add_special_tokens=False))
        except Exception:
            # offline fallback: raw utf-8 bytes as token ids
            text_tokens = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.int64)
        # resolve an optional voice prompt (reference speaker .npz dicts
        # with semantic/coarse/fine histories — bark/inference_funcs.py:43
        # load_voice; produced locally by generate_voice())
        kwargs.pop("speaker_wav", None)  # cloning needs generate_voice() first
        kwargs.pop("language", None)  # implicit in the text
        speaker_id = kwargs.pop("speaker_id", None)
        voice_dirs = kwargs.pop("voice_dirs", None)
        prompt = kwargs.pop("history_prompt", None)
        if prompt is None and speaker_id not in (None, "random") and voice_dirs:
            import os as _os

            dirs = [voice_dirs] if isinstance(voice_dirs, str) else list(voice_dirs)
            for d in dirs:
                cand = _os.path.join(d, f"{speaker_id}.npz")
                if _os.path.isfile(cand):
                    prompt = cand
                    break
            if prompt is None:
                raise ValueError(
                    f"no bark voice prompt {speaker_id}.npz in {dirs} "
                    "(create one with Bark.generate_voice)"
                )
        if isinstance(prompt, str):
            data = np.load(prompt)
            prompt = {k: data[k] for k in data.files}
        sem_hist = coarse_hist = fine_hist = None
        if prompt is not None:
            sem_hist = prompt.get("semantic_prompt")
            fine_hist = prompt.get("fine_prompt")
            coarse_hist = prompt.get("coarse_prompt")
            if coarse_hist is None and fine_hist is not None:
                coarse_hist = np.asarray(fine_hist)[: self.config.N_COARSE_CODEBOOKS]
        r1, r2, r3 = jax.random.split(rng, 3)
        semantic = self.generate_text_semantic(
            text_tokens, r1, semantic_history=sem_hist, **kwargs
        )
        coarse = self.generate_coarse(
            semantic, r2,
            history=(sem_hist, coarse_hist)
            if sem_hist is not None and coarse_hist is not None else None,
        )
        fine = self.generate_fine(coarse, r3, history=fine_hist)
        out = {"semantic": semantic, "coarse": coarse, "fine": fine}
        try:
            out["wav"] = self.codes_to_audio(fine)
        except RuntimeError as e:
            out["wav"] = None
            out["decode_error"] = str(e)
        return out


def load_bark_checkpoint(model: "Bark", checkpoint_dir: str) -> "Bark":
    """Load the reference bark zoo layout (``text_2.pt``, ``coarse_2.pt``,
    ``fine_2.pt``), converting each to flax on first use (reference
    ``bark/load_model.py``)."""
    import os

    from tts_tpu.models.tortoise.model import _load_or_convert
    from tts_tpu.utils.convert import convert_bark_fine, convert_bark_gpt

    c = model.config
    pairs = (
        ("text_2.pt", "semantic_params", lambda s: convert_bark_gpt(s, c.semantic_config.n_layer)),
        ("coarse_2.pt", "coarse_params", lambda s: convert_bark_gpt(s, c.coarse_config.n_layer)),
        (
            "fine_2.pt",
            "fine_params",
            lambda s: convert_bark_fine(
                s, c.fine_config.n_layer, c.fine_config.n_codes_total, c.fine_config.n_codes_given
            ),
        ),
    )
    for fname, attr, fn in pairs:
        path = os.path.join(checkpoint_dir, fname)
        if os.path.isfile(path):
            setattr(model, attr, {"params": _load_or_convert(path, fn)["params"]})
    for fname in ("encodec_24khz.pth", "encodec.pth", "encodec_model_24khz.pth"):
        path = os.path.join(checkpoint_dir, fname)
        if os.path.isfile(path):
            model.load_encodec(path)
            break
    return model


def load_bark_encodec(model: "Bark", path: str, decoder=None, encoder=None) -> "Bark":
    """Convert an EnCodec 24 kHz checkpoint (HF ``EncodecModel`` or the
    original ``encodec`` package state dict) into the flax decoder (+encoder
    when present) used for the waveform stage and cloning prompts.
    ``decoder``/``encoder`` override the default 24 kHz module dims
    (reduced-dim tests)."""
    from tts_tpu.models.bark.encodec import (
        EncodecDecoder,
        EncodecEncoder,
        EncodecVocoder,
    )
    from tts_tpu.utils.convert import (
        convert_encodec_decoder,
        convert_encodec_encoder,
        infer_encodec_dims,
        load_torch_checkpoint,
    )

    state = load_torch_checkpoint(path)
    if decoder is None:  # read the SEANet dims off the checkpoint
        dims = infer_encodec_dims(state)
        decoder = EncodecDecoder(**dims)
    if encoder is None:  # mirror the decoder dims (SEANet is symmetric)
        encoder = EncodecEncoder(**{
            f: getattr(decoder, f)
            for f in ("hidden_size", "num_filters", "upsampling_ratios",
                      "kernel_size", "last_kernel_size", "residual_kernel_size",
                      "num_lstm_layers", "compress", "dilation_growth_rate",
                      "num_residual_layers", "pad_mode")
        })
    ratios = tuple(decoder.upsampling_ratios)
    params, codebooks = convert_encodec_decoder(
        state, upsampling_ratios=ratios,
        num_residual_layers=decoder.num_residual_layers,
        num_lstm_layers=decoder.num_lstm_layers,
    )
    enc_params = None
    try:
        enc_params = convert_encodec_encoder(
            state, upsampling_ratios=ratios,
            num_residual_layers=decoder.num_residual_layers,
            num_lstm_layers=decoder.num_lstm_layers,
        )
    except KeyError:
        pass  # decoder-only checkpoint
    model.encodec_vocoder = EncodecVocoder(
        params, codebooks, decoder=decoder, encoder_params=enc_params,
        encoder=encoder,
    )
    return model


Bark.load_encodec = load_bark_encodec


def _bark_load_checkpoint(self, config=None, checkpoint_dir: str = None, **kwargs):
    """Synthesizer dir-model contract (``utils/synthesizer.py
    _load_tts_from_dir``)."""
    return load_bark_checkpoint(self, checkpoint_dir)


Bark.load_checkpoint = _bark_load_checkpoint


Bark.load_checkpoint_dir = load_bark_checkpoint
