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


def measure_ttfa() -> float:
    """Median time-to-first-audio in ms (serving path, conditioning cached).

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
    DTYPE = os.environ.get("BENCH_XTTS_DTYPE", "bfloat16")
    MAX_NEW = 600

    gpt = XttsGPT()  # full XTTS v2 dims: 30 layers / 1024 dim / 16 heads
    dec = HifiDecoder()

    rng = jax.random.PRNGKey(0)
    text = jnp.asarray(np.random.RandomState(0).randint(1, 6000, (1, T_TEXT)))
    tlen = jnp.full((1,), T_TEXT, jnp.int32)
    cond_mel = jnp.asarray(np.random.RandomState(1).randn(1, 64, 80), jnp.float32)
    spk_mel = jnp.abs(jnp.asarray(np.random.RandomState(2).randn(1, 90, 64), jnp.float32)) + 0.1

    gpt_params = gpt.init(
        {"params": rng}, text, tlen, jnp.zeros((1, 8), jnp.int32),
        jnp.full((1,), 8, jnp.int32), cond_mels=cond_mel,
    )
    dec_params = dec.init(rng, jnp.zeros((1, CHUNK, 1024)), jnp.zeros((1, 1, 512)),
                          jnp.zeros((1, 30, 64)), method=HifiDecoder.init_all)
    if DTYPE in ("bfloat16", "bf16"):
        cast = lambda t: jax.tree.map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, t
        )
        gpt_params, cond_mel = cast(gpt_params), cast(cond_mel)

    style = jax.jit(lambda p, m: gpt.apply(p, m, method=XttsGPT.get_style_emb))
    embed_spk = jax.jit(lambda p, m: dec.apply(p, m, method=HifiDecoder.embed_speaker))
    prefill = jax.jit(
        lambda p, c, t, tl: gpt.apply(p, c, t, tl, MAX_NEW, method=XttsGPT.prefill)
    )
    chunk_fn = jax.jit(
        lambda p, s, r: gpt.apply(
            p, s, r, CHUNK, 0.75, 50, 0.85, 5.0, method=XttsGPT.decode_chunk
        )
    )
    vocode = jax.jit(lambda p, z, g: dec.apply(p, z, g=g))

    # precomputed conditioning (cached per speaker in the serving path)
    cond = style(gpt_params, cond_mel)
    g = embed_spk(dec_params, spk_mel)[:, None, :]

    def first_audio(r):
        state = prefill(gpt_params, cond, text, tlen)
        state, toks, latents = chunk_fn(gpt_params, state, r)
        wav = vocode(dec_params, latents, g)
        return np.asarray(wav[0, 0, 0])  # host sync

    _ = first_audio(rng)  # compile
    times = []
    for i in range(10):
        r = jax.random.PRNGKey(i + 1)
        t0 = time.time()
        _ = first_audio(r)
        times.append(time.time() - t0)
    return float(np.median(times) * 1000)


def main():
    ttfa_ms = measure_ttfa()
    print(
        json.dumps(
            {
                "metric": "xtts_v2_streaming_ttfa_p50",
                "value": round(ttfa_ms, 1),
                "unit": "ms",
                "vs_baseline": round(200.0 / ttfa_ms, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
