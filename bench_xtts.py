"""Benchmark: XTTS v2 streaming time-to-first-audio on one TPU chip.

Measures the reference's headline metric (README.md:5 "<200ms latency"):
tokenized text in → first audio chunk out, with speaker/conditioning
latents precomputed (the reference's claim assumes the same).

Pipeline per iteration: GPT prefill (cond 32 + text 50 + start token) →
20-token KV-cached decode chunk → HiFi decoder on the chunk latents →
host transfer of the first sample (the only real sync point on the axon
backend — block_until_ready is a no-op here).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np  # noqa: E402



def _mark(what):
    print(f"  bench_xtts {what}: {time.strftime('%H:%M:%S')}", file=__import__("sys").stderr, flush=True)

def measure_ttfa(with_throughput: bool = False):
    """Median time-to-first-audio in ms (serving path, conditioning cached).

    ``with_throughput=True`` additionally measures the sustained streaming
    loop (decode chunk + vocode, pipelined) and returns
    ``(ttfa_ms, decode_tok_s, stream_rtf)``.

    ``BENCH_XTTS_DTYPE=bfloat16`` (default) halves the weight-bandwidth of
    the decode (measured 1.58 vs 2.76 ms/token fp32 on one v5e — the step is
    weight-bandwidth-bound); the reference's <200 ms claim likewise assumes
    fp16 deepspeed inference.
    """
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from tts_tpu.models.xtts.gpt import XttsGPT
    from tts_tpu.models.xtts.hifi_decoder import HifiDecoder

    T_TEXT = int(os.environ.get("BENCH_TEXT_TOKENS", "50"))
    CHUNK = int(os.environ.get("BENCH_CHUNK", "20"))
    # serving capacity: decode BATCH concurrent streams in one scan (the
    # decode is weight-bandwidth-bound, so tokens/s scales nearly with B)
    BATCH = int(os.environ.get("BENCH_XTTS_BATCH", "1"))
    DTYPE = os.environ.get("BENCH_XTTS_DTYPE", "bfloat16")
    MAX_NEW = 600

    _mark("ttfa start")
    gpt = XttsGPT()  # full XTTS v2 dims: 30 layers / 1024 dim / 16 heads
    dec = HifiDecoder()

    rng = jax.random.PRNGKey(0)
    text = jnp.asarray(np.random.RandomState(0).randint(1, 6000, (BATCH, T_TEXT)))
    tlen = jnp.full((BATCH,), T_TEXT, jnp.int32)
    cond_mel = jnp.asarray(np.random.RandomState(1).randn(1, 64, 80), jnp.float32)
    spk_mel = jnp.abs(jnp.asarray(np.random.RandomState(2).randn(1, 90, 64), jnp.float32)) + 0.1

    # jit the inits: un-jitted flax init dispatches thousands of tiny ops
    # individually — measured 4.5 MINUTES through the tunnel vs seconds as
    # one compiled graph
    gpt_params = jax.jit(
        lambda r: gpt.init(
            {"params": r}, text[:1], tlen[:1], jnp.zeros((1, 8), jnp.int32),
            jnp.full((1,), 8, jnp.int32), cond_mels=cond_mel.astype(jnp.float32),
        )
    )(rng)
    dec_params = jax.jit(
        lambda r: dec.init(
            r, jnp.zeros((1, CHUNK, 1024)), jnp.zeros((1, 1, 512)),
            jnp.zeros((1, 30, 64)), method=HifiDecoder.init_all,
        )
    )(rng)
    if DTYPE in ("bfloat16", "bf16"):
        cast = lambda t: jax.tree.map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, t
        )
        gpt_params, cond_mel = cast(gpt_params), cast(cond_mel)

    _mark("params initialized")
    if os.environ.get("BENCH_XTTS_INT8"):
        # weight-only int8 decode (ops/quant.py): weights stream from HBM as
        # int8; dequant fuses into the consuming matmuls inside jit
        from tts_tpu.ops.quant import dequantize, quantize_int8

        gpt_params = jax.tree.map(jnp.asarray, quantize_int8(gpt_params))
        _dq = lambda p: dequantize(p, jnp.bfloat16)
    else:
        _dq = lambda p: p

    style = jax.jit(lambda p, m: gpt.apply(_dq(p), m, method=XttsGPT.get_style_emb))
    embed_spk = jax.jit(lambda p, m: dec.apply(p, m, method=HifiDecoder.embed_speaker))
    prefill = jax.jit(
        lambda p, c, t, tl: gpt.apply(_dq(p), c, t, tl, MAX_NEW, method=XttsGPT.prefill)
    )
    chunk_fn = jax.jit(
        lambda p, s, r: gpt.apply(
            _dq(p), s, r, CHUNK, 0.75, 50, 0.85, 5.0, method=XttsGPT.decode_chunk
        ),
        # donate the decode state so the KV cache updates in place rather
        # than being copied every chunk (it dominates decode bandwidth)
        donate_argnums=(1,),
    )
    vocode = jax.jit(lambda p, z, g: dec.apply(p, z, g=g))

    # precomputed conditioning (cached per speaker in the serving path)
    cond = style(gpt_params, cond_mel)
    g = embed_spk(dec_params, spk_mel)[:, None, :]
    if BATCH > 1:
        cond = jnp.broadcast_to(cond, (BATCH,) + tuple(cond.shape[1:]))
        g = jnp.broadcast_to(g, (BATCH,) + tuple(g.shape[1:]))

    def first_audio(r):
        state = prefill(gpt_params, cond, text, tlen)
        state, toks, latents = chunk_fn(gpt_params, state, r)
        wav = vocode(dec_params, latents, g)
        return np.asarray(wav[0, 0, 0])  # host sync

    _mark("conditioning ready")
    _ = first_audio(rng)  # compile
    _mark("first_audio warm")
    # each trial carries a synchronous host transfer whose tunnel RPC
    # overhead is highly variable (0.2-6 s) — cap the trial loop by count
    # AND wall-clock so one bad-weather run cannot eat the bench budget
    n_trials = int(os.environ.get("BENCH_TTFA_TRIALS", "7"))
    budget_s = float(os.environ.get("BENCH_TTFA_BUDGET_S", "45"))
    times = []
    loop_t0 = time.time()
    for i in range(n_trials):
        r = jax.random.PRNGKey(i + 1)
        t0 = time.time()
        _ = first_audio(r)
        times.append(time.time() - t0)
        if len(times) >= 3 and time.time() - loop_t0 > budget_s:
            break
    ttfa_ms = float(np.median(times) * 1000)
    _mark(f"trials done ({len(times)})")
    if not with_throughput:
        return ttfa_ms

    # Sustained streaming: decode chunk → vocode, chained, synced once at
    # the end (axon: only host transfers synchronize).  tokens/s is the
    # serving-capacity number; stream RTF = audio seconds per wall second
    # (each GPT token is 1024 output samples at 24 kHz).
    N_CHUNKS = int(os.environ.get("BENCH_STREAM_CHUNKS", "25"))
    state = prefill(gpt_params, cond, text, tlen)
    state, toks, latents = chunk_fn(gpt_params, state, rng)  # warm shapes
    wav = vocode(dec_params, latents, g)
    _ = np.asarray(wav[0, 0, 0])
    samples_per_token = wav.shape[1] // CHUNK

    t0 = time.time()
    state = prefill(gpt_params, cond, text, tlen)
    for i in range(N_CHUNKS):
        state, toks, latents = chunk_fn(gpt_params, state, jax.random.PRNGKey(100 + i))
        wav = vocode(dec_params, latents, g)
    _ = np.asarray(wav[0, 0, 0])
    dt = time.time() - t0
    n_tokens = N_CHUNKS * CHUNK * BATCH  # aggregate across concurrent streams
    decode_tok_s = n_tokens / dt
    stream_rtf = (n_tokens * samples_per_token / 24000.0) / dt
    return ttfa_ms, float(decode_tok_s), float(stream_rtf)


def measure_serving(n_clients: int):
    """Aggregate decode tokens/s for ``n_clients`` concurrent streaming
    clients multiplexed through the server-side ``StreamBatcher`` (the
    user-reachable path: /api/tts-stream with --stream_batch), at full XTTS
    v2 dims. The batched-scan capacity (``BENCH_XTTS_BATCH=4``) is the
    model-level ceiling; this measures how much of it the serving bridge
    delivers, including per-chunk host transfers of the audio bytes (which
    on the tunneled axon backend carry RPC overhead a local chip does not).
    """
    import threading

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from tts_tpu.models.xtts import Xtts, XttsConfig
    from tts_tpu.server.stream_batching import StreamBatcher

    T_TEXT = int(os.environ.get("BENCH_TEXT_TOKENS", "50"))
    CHUNK = int(os.environ.get("BENCH_CHUNK", "20"))
    N_CHUNKS = int(os.environ.get("BENCH_STREAM_CHUNKS", "25"))
    DTYPE = os.environ.get("BENCH_XTTS_DTYPE", "bfloat16")

    cfg = XttsConfig()
    model = Xtts(cfg)
    model.init_params(jax.random.PRNGKey(0))
    if DTYPE in ("bfloat16", "bf16"):
        model.gpt_params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
            model.gpt_params,
        )
    token_ids = list(np.random.RandomState(0).randint(1, 6000, (T_TEXT,)))
    model.tokenizer = type(
        "T", (), {"encode": staticmethod(lambda t, l: token_ids)}
    )()
    cond_mel = jnp.asarray(np.random.RandomState(1).randn(1, 64, 80), jnp.float32)
    lat = model.gpt.apply(model.gpt_params, cond_mel, method=type(model.gpt).get_style_emb)
    spk = jnp.asarray(np.random.RandomState(2).randn(1, 512), jnp.float32) * 0.1
    model.resolve_conditioning = (
        lambda config, speaker_id=None, speaker_wav=None: (lat, spk)
    )

    batcher = StreamBatcher(model_synth := _ServeSynth(model, cfg), n_clients, 300.0)
    kw = dict(max_new_tokens=N_CHUNKS * CHUNK, stream_chunk_size=CHUNK)
    results = {}

    def client(i):
        samples = 0
        for chunk in batcher.stream("bench", **kw):
            samples += chunk.shape[0]
        results[i] = samples

    # warm-up round compiles prefill/chunk/vocode at batch n_clients
    threads = [threading.Thread(target=client, args=(i,)) for i in range(n_clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=3600)

    t0 = time.time()
    threads = [threading.Thread(target=client, args=(i,)) for i in range(n_clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=3600)
    dt = time.time() - t0
    batcher.close()
    total_samples = sum(results.values())
    samples_per_token = 1024  # HiFi decoder: 1024 output samples per GPT token
    tok_s = total_samples / samples_per_token / dt
    agg_rtf = (total_samples / 24000.0) / dt
    return float(tok_s), float(agg_rtf)


class _ServeSynth:
    """Minimal synthesizer facade for StreamBatcher benchmarking."""

    vocoder_model = None
    output_sample_rate = 24000

    def __init__(self, model, cfg):
        self.tts_model = model
        self.tts_config = cfg


def main():
    serve = int(os.environ.get("BENCH_XTTS_SERVE", "0"))
    if serve > 1:
        tok_s, agg_rtf = measure_serving(serve)
        print(
            json.dumps(
                {
                    "metric": "xtts_v2_serving_tok_s",
                    "value": round(tok_s, 1),
                    "unit": f"tok/s aggregate over {serve} streaming clients",
                    "vs_baseline": None,
                    "xtts_serving_rtf": round(agg_rtf, 2),
                }
            )
        )
        return
    ttfa_ms, tok_s, stream_rtf = measure_ttfa(with_throughput=True)
    print(
        json.dumps(
            {
                "metric": "xtts_v2_streaming_ttfa_p50",
                "value": round(ttfa_ms, 1),
                "unit": "ms",
                "vs_baseline": round(200.0 / ttfa_ms, 3),
                "xtts_decode_tok_s": round(tok_s, 1),
                "xtts_stream_rtf": round(stream_rtf, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
