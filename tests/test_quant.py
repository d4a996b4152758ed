"""Weight-only int8 quantization (``ops/quant.py``) and the XTTS int8
serving path (no reference counterpart — TPU serving feature)."""

import jax
import jax.numpy as jnp
import numpy as np

from tts_tpu.ops.quant import dequantize, is_quantized, quantize_int8, quantized_bytes


def test_roundtrip_error_bounded():
    rng = np.random.RandomState(0)
    w = rng.randn(64, 128).astype(np.float32)
    tree = {"dense": {"kernel": jnp.asarray(w), "bias": jnp.zeros((128,))}}
    q = quantize_int8(tree, min_elems=1)
    assert is_quantized(q)
    assert q["dense"]["kernel"]["int8"].dtype == jnp.int8
    back = dequantize(q, jnp.float32)
    # symmetric per-channel int8: max error ≤ scale/2 per element
    scale = np.abs(w).max(axis=0, keepdims=True) / 127.0
    err = np.abs(np.asarray(back["dense"]["kernel"]) - w)
    assert (err <= scale / 2 + 1e-7).all()
    # bias untouched
    assert np.asarray(back["dense"]["bias"]).dtype == np.float32


def test_small_and_nonkernel_leaves_skipped():
    tree = {
        "ln": {"scale": jnp.ones((32,)), "bias": jnp.zeros((32,))},
        "tiny": {"kernel": jnp.ones((4, 4))},
    }
    q = quantize_int8(tree)  # default min_elems leaves both alone
    assert not is_quantized(q)


def test_bytes_halved():
    w = jnp.asarray(np.random.RandomState(1).randn(256, 256), jnp.float32)
    tree = {"d": {"kernel": w}}
    q = quantize_int8(tree)
    assert quantized_bytes(q) < quantized_bytes(tree) / 3  # int8 vs fp32


def test_xtts_int8_decode_close_to_fp32():
    """End to end: quantized GPT decode matches fp32 latents closely and
    still streams."""
    from helpers import fast_init_model, tiny_xtts_config

    from tts_tpu.models.xtts import Xtts

    model = Xtts(tiny_xtts_config())
    fast_init_model(model, jax.random.PRNGKey(0), attrs=("gpt_params", "decoder_params"))
    cond = jnp.asarray(np.random.RandomState(2).randn(1, 8, 64), jnp.float32)
    text = jnp.asarray([[5, 9, 11, 3]], jnp.int32)

    def run(m):
        return m.gpt.apply(
            m._dq(m.gpt_params), cond, text, jnp.asarray([4]),
            jax.random.PRNGKey(3), max_new_tokens=8, temperature=0.01,
            method=m.gpt.generate,
        )

    ref = run(model)
    model.quantize_weights_int8(compute_dtype=jnp.float32)
    assert is_quantized(model.gpt_params)
    got = run(model)
    a = np.asarray(ref["latents"], np.float32)
    b = np.asarray(got["latents"], np.float32)
    cos = (a * b).sum() / max(np.linalg.norm(a) * np.linalg.norm(b), 1e-8)
    assert cos > 0.99, cos


def test_bark_int8_semantic_generation():
    """Bark AR stages run with int8 weights and stay in-vocab."""
    from helpers import make_tiny_bark

    model = make_tiny_bark()
    model.quantize_weights_int8(compute_dtype=jnp.float32)
    assert is_quantized(model.semantic_params)
    sem = model.generate_text_semantic(
        np.arange(10), jax.random.PRNGKey(1), max_gen_duration_s=0.5
    )
    assert sem.ndim == 1 and (sem <= model.config.SEMANTIC_VOCAB_SIZE).all()


def test_tortoise_int8_decode():
    """Tortoise AR decode runs with int8 weights; codes stay in-vocab."""
    from tts_tpu.models.tortoise import Tortoise, TortoiseConfig
    from helpers import fast_init_model

    from tts_tpu.models.tortoise.config import TortoiseArgs

    cfg = TortoiseConfig()
    cfg.model_args = TortoiseArgs(
        ar_layers=1, ar_model_dim=32, ar_heads=2,
        ar_number_text_tokens=30, ar_number_mel_codes=20,
        ar_start_mel_token=18, ar_stop_mel_token=19, ar_start_text_token=29,
        ar_max_text_tokens=24, ar_max_mel_tokens=32,
        diff_model_channels=32, diff_num_layers=3, diff_in_channels=20,
        diff_in_latent_channels=32, diff_num_heads=2, diffusion_iterations=2,
    )
    model = Tortoise(cfg)
    fast_init_model(model, jax.random.PRNGKey(0), attrs=("ar_params", "diff_params"))
    model.quantize_weights_int8(compute_dtype=jnp.float32)
    assert is_quantized(model.ar_params)
    text = jnp.asarray(np.random.RandomState(0).randint(1, 29, (1, 8)))
    cond = jnp.asarray(np.random.RandomState(1).randn(1, 32, 80).astype(np.float32))
    dcond = jnp.asarray(np.random.RandomState(2).randn(1, 24, 20).astype(np.float32))
    out = model.inference(
        text, cond, diffusion_cond_mels=dcond, rng=jax.random.PRNGKey(2),
        max_mel_tokens=6,
    )
    codes = np.asarray(out["codes"])
    assert ((codes >= 0) & (codes < 20)).all()
