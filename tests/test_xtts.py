"""XTTS tests (reference model: tests/xtts_tests/, tests/zoo_tests xtts)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tts_tpu.models.xtts import Xtts, XttsArgs, XttsConfig
from tts_tpu.models.xtts.gpt import XttsGPT
from tts_tpu.models.xtts.gpt_core import sample_logits


from helpers import fast_init_model, tiny_xtts_config as _tiny_config  # noqa: E402


@pytest.fixture(scope="module")
def xtts_tiny():
    model = Xtts(_tiny_config())
    fast_init_model(model, jax.random.PRNGKey(0), attrs=("gpt_params", "decoder_params"))
    return model


def test_gpt_train_forward(xtts_tiny):
    model = xtts_tiny
    out = model.gpt.apply(
        model.gpt_params,
        jnp.asarray(np.random.RandomState(0).randint(1, 48, (2, 10))),
        jnp.asarray([10, 7]),
        jnp.asarray(np.random.RandomState(1).randint(0, 32, (2, 16))),
        jnp.asarray([16, 12]),
        cond_mels=jnp.asarray(np.random.RandomState(2).randn(2, 64, 80).astype(np.float32)),
    )
    assert out["text_logits"].shape == (2, 11, 50)  # T_text+2-1
    assert out["mel_logits"].shape == (2, 17, 34)
    assert out["latents"].shape == (2, 17, 64)
    assert np.isfinite(np.asarray(out["mel_logits"])).all()
    # CE losses finite
    logp = jax.nn.log_softmax(out["mel_logits"], -1)
    ce = -jnp.mean(jnp.take_along_axis(logp, out["mel_targets"][..., None], -1))
    assert np.isfinite(float(ce))


def test_gpt_generate_and_decode(xtts_tiny):
    model = xtts_tiny
    cond = model.gpt.apply(
        model.gpt_params,
        jnp.asarray(np.random.RandomState(2).randn(1, 64, 80).astype(np.float32)),
        method=model.gpt.get_style_emb,
    )
    assert cond.shape == (1, 32, 64)  # perceiver latents
    text = jnp.asarray(np.random.RandomState(0).randint(1, 48, (1, 8)))
    gen = model.gpt.apply(
        model.gpt_params,
        cond,
        text,
        jnp.asarray([8]),
        jax.random.PRNGKey(1),
        max_new_tokens=12,
        method=model.gpt.generate,
    )
    assert gen["codes"].shape == (1, 12)
    codes = np.asarray(gen["codes"])
    assert ((codes >= 0) & (codes < 34)).all()
    # latents + hifi decode
    latents = model.gpt.apply(
        model.gpt_params,
        text,
        jnp.asarray([8]),
        gen["codes"],
        gen["code_lengths"],
        cond_latents=cond,
        return_latent=True,
    )["latents"]
    spk = jnp.zeros((1, 512))
    wav = model.hifigan_decoder.apply(model.decoder_params, latents, spk)
    assert wav.shape[1] > latents.shape[1] * 100  # heavy upsampling
    assert np.isfinite(np.asarray(wav)).all()


def test_sampling_respects_topk():
    rng = jax.random.PRNGKey(0)
    logits = jnp.asarray(np.array([[0.0, 10.0, 9.0, -5.0, 1.0]], np.float32))
    # top_k=2 should only ever sample tokens 1 or 2
    samples = [
        int(sample_logits(jax.random.fold_in(rng, i), logits, temperature=1.0, top_k=2, top_p=1.0)[0])
        for i in range(20)
    ]
    assert set(samples) <= {1, 2}


def test_repetition_penalty_discourages_repeats():
    rng = jax.random.PRNGKey(0)
    logits = jnp.asarray(np.array([[2.0, 2.0, 2.0, 2.0]], np.float32))
    counts = jnp.asarray(np.array([[5, 0, 0, 0]], np.int32))
    hits = 0
    for i in range(50):
        tok = int(
            sample_logits(
                jax.random.fold_in(rng, i), logits, temperature=1.0, top_k=0, top_p=1.0,
                repetition_counts=counts, repetition_penalty=5.0,
            )[0]
        )
        hits += tok == 0
    assert hits <= 5  # token 0 heavily penalized


def test_tokenizer_preprocessing():
    from tts_tpu.models.xtts.tokenizer import multilingual_cleaners

    assert multilingual_cleaners("Hello & 3 worlds!", "en") == "hello and three worlds!"
    assert multilingual_cleaners('El "gato" & yo', "es") == "el gato y yo"


def test_v1_layout_cond_latents_keep_frames():
    """Without the perceiver (XTTS v1.x), get_gpt_cond_latents computes one
    coarse mel (hop 1024) over the whole clip and keeps every frame as a
    prompt latent (reference xtts.py:299-314)."""
    cfg = _tiny_config()
    cfg.model_args.gpt_use_perceiver_resampler = False
    model = Xtts(cfg)
    fast_init_model(model, jax.random.PRNGKey(1), attrs=("gpt_params", "decoder_params"))
    audio = 0.1 * np.random.RandomState(0).randn(22050 * 2).astype(np.float32)
    lat = np.asarray(model.get_gpt_cond_latents(audio, 22050))
    # 2 s at hop 1024 (centered stft) → ~44 frames, one latent per frame
    assert lat.shape[0] == 1 and lat.shape[2] == 64
    assert 40 <= lat.shape[1] <= 48
    assert np.isfinite(lat).all()


def test_batched_streaming_matches_single_greedy(xtts_tiny):
    """inference_stream_batched decodes B streams in one scan; with greedy
    sampling (top_k=1) each row must reproduce the single-stream decode."""
    model = xtts_tiny
    cond = jnp.asarray(np.random.RandomState(5).randn(1, 8, 64), jnp.float32)
    spk = jnp.asarray(np.random.RandomState(6).randn(1, 512), jnp.float32)
    model.tokenizer = type(
        "_Tok", (), {"encode": staticmethod(lambda t, l: [5, 9, 11, 3])}
    )()
    kw = dict(stream_chunk_size=4, max_new_tokens=12, temperature=0.01, top_k=1,
              top_p=1.0, rng=jax.random.PRNGKey(7))
    single = list(model.inference_stream("x", "en", cond, spk, **kw))
    batched = list(
        model.inference_stream_batched(["x", "x"], "en", cond, spk, **kw)
    )
    got_rows = [[c[i] for c in batched if c[i] is not None] for i in range(2)]
    for row in got_rows:
        assert len(row) == len(single)
        for a, b in zip(row, single):
            np.testing.assert_allclose(a, b, atol=2e-4)


def test_batched_streaming_ragged_lengths(xtts_tiny):
    """Ragged texts: pad rows see stop tokens, outputs stay finite and each
    stream terminates independently."""
    model = xtts_tiny
    cond = jnp.asarray(np.random.RandomState(8).randn(1, 8, 64), jnp.float32)
    spk = jnp.asarray(np.random.RandomState(9).randn(1, 512), jnp.float32)
    rows = {"a": [5, 9], "bbb": [5, 9, 11, 3, 7, 2]}
    model.tokenizer = type(
        "_Tok", (), {"encode": staticmethod(lambda t, l: rows[t])}
    )()
    chunks = list(model.inference_stream_batched(
        ["a", "bbb"], "en", cond, spk,
        stream_chunk_size=4, max_new_tokens=8, rng=jax.random.PRNGKey(1),
    ))
    assert chunks, "no audio yielded"
    for c in chunks:
        for item in c:
            if item is not None:
                assert np.isfinite(item).all()


def test_batched_streaming_bf16_params(xtts_tiny):
    """bf16 serving params + fp32 conditioning latents: the prefill must
    cast conditioning to the params' compute dtype or the decode_chunk
    scan carry (last_logits/last_h, fp32 from prefill) disagrees with the
    bf16 step outputs and jit rejects the scan (regression: TPU serve
    stage yielded xtts_served_tok_s=0.0)."""
    model = xtts_tiny
    model.gpt_params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        model.gpt_params,
    )
    model.decoder_params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        model.decoder_params,
    )
    cond = jnp.asarray(np.random.RandomState(8).randn(1, 8, 64), jnp.float32)
    spk = jnp.asarray(np.random.RandomState(9).randn(1, 512), jnp.float32)
    model.tokenizer = type(
        "_Tok", (), {"encode": staticmethod(lambda t, l: [5, 9, 11, 3])}
    )()
    chunks = list(model.inference_stream_batched(
        ["x", "x"], "en", cond, spk,
        stream_chunk_size=4, max_new_tokens=8, rng=jax.random.PRNGKey(2),
    ))
    assert chunks, "no audio yielded"
    for c in chunks:
        for item in c:
            if item is not None:
                assert np.isfinite(np.asarray(item, np.float32)).all()
