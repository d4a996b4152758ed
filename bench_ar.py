"""Benchmark: Tortoise and Bark inference throughput on one TPU chip.

The reference claims "faster inference" for its Tortoise with no number
(``/root/reference/README.md:9``) and publishes nothing for Bark.  This
publishes numbers: per-stage throughput (AR tok/s, diffusion steps/s) and
the derived end-to-end real-time factor, at the full default model dims
with randomly initialized weights (throughput is weight-value-independent;
all stage loops are fixed-work ``lax.scan``s).

Writes ``BENCH_AR_MODELS.json`` at the repo root and prints one JSON line
per model.  Not part of the driver's ``bench.py`` (its 420 s deadline is
reserved for the headline VITS/XTTS numbers).

Env knobs: BENCH_AR_DTYPE=bfloat16|float32 (default bfloat16 — the AR
decodes are weight-bandwidth-bound, matching the serving configuration).
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np  # noqa: E402


def _sync(x):
    # axon backend: only a device->host transfer forces execution
    return np.asarray(x).reshape(-1)[0]


def _timeit(fn, *args, n_iter=3, sync=_sync):
    out = fn(*args)
    _sync_out = sync(out)
    t0 = time.time()
    for _ in range(n_iter):
        out = fn(*args)
    sync(out)
    return (time.time() - t0) / n_iter, out


def bench_tortoise(dtype):
    import jax
    import jax.numpy as jnp

    from tts_tpu.models.tortoise import Tortoise, TortoiseConfig
    from tts_tpu.models.tortoise.model import SAMPLERS, ddim_sample

    cfg = TortoiseConfig()
    a = cfg.model_args
    model = Tortoise(cfg)
    model.init_params(jax.random.PRNGKey(0))
    if dtype == "bfloat16":
        model.ar_params = jax.tree.map(
            lambda v: v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v,
            model.ar_params,
        )

    N_CODES = int(os.environ.get("BENCH_TORTOISE_CODES", "200"))
    T_TEXT = 60
    rng = jax.random.PRNGKey(1)
    act_dtype = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    text = jnp.asarray(np.random.RandomState(0).randint(1, 255, (1, T_TEXT)))
    auto_latent = (jax.random.normal(rng, (1, 1, a.ar_model_dim)) * 0.02).astype(act_dtype)
    diff_latent = jax.random.normal(rng, (1, 2 * a.diff_model_channels)) * 0.02

    # stage 1: AR mel-code decode (fixed-work scan of N_CODES steps)
    gen = jax.jit(
        lambda p, c, t, r: model.autoregressive.apply(
            p, c, t, r, max_new_tokens=N_CODES,
            temperature=a.temperature, top_p=a.top_p,
            repetition_penalty=a.repetition_penalty,
            method=model.autoregressive.generate,
        )
    )
    t_ar, out = _timeit(gen, model.ar_params, auto_latent, text, rng,
                        sync=lambda o: _sync(o["codes"]))
    ar_tok_s = N_CODES / t_ar

    # stage 2: teacher-forced latent pass over the fixed codes
    codes = jnp.asarray(np.random.RandomState(1).randint(0, 8000, (1, N_CODES)))
    tf = jax.jit(lambda p, cl, t, c: model.autoregressive.apply(p, cl, t, c))
    t_tf, _ = _timeit(tf, model.ar_params, auto_latent, text, codes,
                      sync=lambda o: _sync(o[2]))

    # stage 3: diffusion decode (DDIM, the default sampler/steps)
    steps = a.diffusion_iterations
    sampler = SAMPLERS.get(a.sampler, ddim_sample)
    latents = jax.random.normal(rng, (1, N_CODES, a.diff_in_latent_channels))
    T_mel = N_CODES * 4 * 24000 // 22050

    def diffuse(p, lat, dlat, r):
        emb = model.diffusion.apply(
            p, lat, dlat, T_mel, method=model.diffusion.timestep_independent
        )
        return sampler(
            model.diffusion, p, emb, T_mel, r, steps=steps,
            in_channels=a.diff_in_channels,
            temperature=a.diffusion_temperature,
            cond_free=a.cond_free, cond_free_k=a.cond_free_k,
        )

    t_diff, mel = _timeit(jax.jit(diffuse), model.diff_params, latents, diff_latent, rng)
    diff_steps_s = steps / t_diff

    # stage 4: UnivNet vocoder mel → wav (the reference bundles the same
    # variant, tortoise/vocoder.py:277); conv throughput is weight-value-
    # independent, so random init gives the honest end-to-end time
    model.vocoder_params = model.vocoder.init(
        jax.random.PRNGKey(5),
        jnp.zeros((1, 24, 100)),
        jnp.zeros((1, 24, a.voc_noise_dim)),
    )
    voc_mel = jax.random.normal(rng, (1, T_mel, 100)).astype(jnp.float32)
    t_voc, wav = _timeit(lambda m: model.vocode(m, rng), voc_mel)
    assert np.isfinite(np.asarray(wav)).all()

    audio_s = T_mel * 256 / 24000  # univnet hop 256 @ 24 kHz
    total = t_ar + t_tf + t_diff + t_voc
    return {
        "ar_tok_s": round(ar_tok_s, 1),
        "ar_ms_per_token": round(1000 * t_ar / N_CODES, 3),
        "teacher_forced_ms": round(1000 * t_tf, 1),
        "diffusion_steps_s": round(diff_steps_s, 2),
        "diffusion_sampler": a.sampler,
        "diffusion_iterations": steps,
        "vocoder_ms": round(1000 * t_voc, 1),
        "mel_frames": T_mel,
        "audio_seconds": round(audio_s, 2),
        "e2e_seconds": round(total, 3),
        "rtf": round(audio_s / total, 2),
        "notes": f"{N_CODES} mel codes, dims {a.ar_layers}L/{a.ar_model_dim}d AR + "
                 f"{a.diff_num_layers}L diffusion + UnivNet vocoder (end-to-end)",
    }


def bench_bark(dtype):
    import jax
    import jax.numpy as jnp

    from tts_tpu.models.bark import Bark, BarkConfig

    cfg = BarkConfig()
    model = Bark(cfg)
    model.init_params(jax.random.PRNGKey(0))
    if dtype == "bfloat16":
        for name in ("semantic_params", "coarse_params", "fine_params"):
            setattr(model, name, jax.tree.map(
                lambda v: v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v,
                getattr(model, name),
            ))

    DUR_S = float(os.environ.get("BENCH_BARK_SECONDS", "8"))
    rng = jax.random.PRNGKey(2)
    rs = np.random.RandomState(0)

    # stage 1: text -> semantic (fixed-work scan; 49.9 tok/s of audio)
    text_tokens = rs.randint(0, 10_000, (32,))
    n_sem = int(DUR_S * cfg.SEMANTIC_RATE_HZ)
    t0 = time.time()
    sem_out = model.generate_text_semantic(text_tokens, rng, max_gen_duration_s=DUR_S)
    t_sem_first = time.time() - t0  # includes compile on a cold cache
    t0 = time.time()
    model.generate_text_semantic(text_tokens, rng, max_gen_duration_s=DUR_S)
    t_sem = time.time() - t0
    sem_tok_s = n_sem / t_sem

    # stage 2: semantic -> coarse (sliding-window loop, 2 codebooks @ 75 Hz)
    sem = rs.randint(0, cfg.SEMANTIC_VOCAB_SIZE, (n_sem,)).astype(np.int32)
    t0 = time.time()
    coarse = model.generate_coarse(sem, rng)
    t_coarse_first = time.time() - t0
    t0 = time.time()
    coarse = model.generate_coarse(sem, rng)
    t_coarse = time.time() - t0
    n_coarse = coarse.shape[0] * coarse.shape[1]
    coarse_tok_s = n_coarse / t_coarse

    # stage 3: coarse -> fine (6 non-AR codebook passes)
    t0 = time.time()
    fine = model.generate_fine(coarse, rng)
    _ = np.asarray(fine)
    t_fine_first = time.time() - t0
    t0 = time.time()
    fine = model.generate_fine(coarse, rng)
    _ = np.asarray(fine)
    t_fine = time.time() - t0

    # stage 4: EnCodec decode (fine codes → 24 kHz wav) via the flax SEANet
    # decoder (models/bark/encodec.py); random weights — conv/LSTM
    # throughput is weight-value-independent
    from tts_tpu.models.bark.encodec import EncodecDecoder, EncodecVocoder

    dec = EncodecDecoder()
    dec_params = dec.init(jax.random.PRNGKey(6), jnp.zeros((1, 64, 128)))
    codebooks = jax.random.normal(jax.random.PRNGKey(7), (8, 1024, 128)) * 0.02
    model.encodec_vocoder = EncodecVocoder(dec_params, codebooks, dec)
    fine_np = np.asarray(fine)
    t0 = time.time()
    wav = model.codes_to_audio(fine_np)
    t_enc_first = time.time() - t0
    t0 = time.time()
    wav = model.codes_to_audio(fine_np)
    t_enc = time.time() - t0
    assert np.isfinite(wav).all()

    audio_s = coarse.shape[1] / cfg.COARSE_RATE_HZ
    total = t_sem + t_coarse + t_fine + t_enc
    return {
        "semantic_tok_s": round(sem_tok_s, 1),
        "coarse_tok_s": round(coarse_tok_s, 1),
        "fine_seconds": round(t_fine, 3),
        "stage_seconds": {
            "semantic": round(t_sem, 3),
            "coarse": round(t_coarse, 3),
            "fine": round(t_fine, 3),
            "encodec": round(t_enc, 3),
        },
        "first_call_seconds": {
            "semantic": round(t_sem_first, 1),
            "coarse": round(t_coarse_first, 1),
            "fine": round(t_fine_first, 1),
            "encodec": round(t_enc_first, 1),
        },
        "audio_seconds": round(audio_s, 2),
        "e2e_seconds": round(total, 3),
        "rtf": round(audio_s / total, 2),
        "notes": f"{n_sem} semantic + {n_coarse} coarse tokens, "
                 f"dims {cfg.semantic_config.n_layer}L/{cfg.semantic_config.n_embd}d x3 "
                 "+ EnCodec SEANet decode (end-to-end)",
    }


def main():
    import jax

    from tts_tpu.utils.backend import default_backend_alive

    if os.environ.get("BENCH_FORCE_CPU") or not default_backend_alive():
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    dtype = os.environ.get("BENCH_AR_DTYPE", "bfloat16")
    platform = jax.devices()[0].platform
    results = {"platform": platform, "dtype": dtype}

    only = os.environ.get("BENCH_AR_ONLY", "")
    if only in ("", "tortoise"):
        results["tortoise"] = bench_tortoise(dtype)
        print(json.dumps({
            "metric": "tortoise_rtf", "value": results["tortoise"]["rtf"],
            "unit": "x realtime",
            "vs_baseline": None,  # reference publishes no number (README.md:9)
        }))
    if only in ("", "bark"):
        results["bark"] = bench_bark(dtype)
        print(json.dumps({
            "metric": "bark_rtf", "value": results["bark"]["rtf"],
            "unit": "x realtime", "vs_baseline": None,
        }))

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_AR_MODELS.json")
    existing = {}
    if os.path.exists(out):
        try:
            with open(out) as f:
                existing = json.load(f)
        except ValueError:
            pass
    existing.update(results)
    with open(out, "w") as f:
        json.dump(existing, f, indent=1)
        f.write("\n")


if __name__ == "__main__":
    main()
