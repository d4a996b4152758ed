"""Bark tests (reference model: tests/zoo_tests bark)."""

import jax
import numpy as np
import pytest

from helpers import make_tiny_bark  # noqa: E402


@pytest.fixture(scope="module")
def bark_tiny():
    return make_tiny_bark()


def test_semantic_generation(bark_tiny):
    text_tokens = np.arange(10)
    sem = bark_tiny.generate_text_semantic(text_tokens, jax.random.PRNGKey(1), max_gen_duration_s=0.5)
    assert sem.ndim == 1
    assert (sem <= bark_tiny.config.SEMANTIC_VOCAB_SIZE).all()


def test_semantic_generation_bf16(bark_tiny):
    """bf16 serving: prefill and decode logits must share a dtype or the
    decode ``lax.scan`` carry fails to typecheck (round-4 bench_ar crash)."""
    import jax.numpy as jnp

    saved = bark_tiny.semantic_params
    bark_tiny.semantic_params = jax.tree.map(
        lambda v: v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v, saved
    )
    try:
        sem = bark_tiny.generate_text_semantic(
            np.arange(10), jax.random.PRNGKey(1), max_gen_duration_s=0.5
        )
        assert sem.ndim == 1
        assert (sem <= bark_tiny.config.SEMANTIC_VOCAB_SIZE).all()
    finally:
        bark_tiny.semantic_params = saved


def test_full_pipeline_codes(bark_tiny):
    out = bark_tiny.synthesize("hi", bark_tiny.config, rng=jax.random.PRNGKey(2),
                               max_gen_duration_s=0.3)
    assert out["semantic"].ndim == 1
    assert out["coarse"].shape[0] == bark_tiny.config.N_COARSE_CODEBOOKS
    assert out["fine"].shape[0] == bark_tiny.config.N_FINE_CODEBOOKS
    assert (out["fine"] < 32).all()
    # encodec absent in this env: wav is gated with a clear message
    assert out["wav"] is None and "encodec" in out["decode_error"]


def test_bark_waveform_via_flax_encodec(bark_tiny, tmp_path):
    """Full text→waveform with the flax EnCodec decoder — no torch on the
    compute path (VERDICT r2 missing #2; reference bark.py:43 +
    inference_funcs.py:599)."""
    import sys

    import torch

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from test_convert_encodec import _small_config

    tfe = pytest.importorskip("transformers.models.encodec.modeling_encodec")

    torch.manual_seed(0)
    ref = tfe.EncodecModel(_small_config()).eval()
    ck = tmp_path / "encodec_24khz.pth"
    torch.save(ref.state_dict(), ck)

    # SEANet dims are inferred from the checkpoint (infer_encodec_dims)
    bark_tiny.load_encodec(str(ck))
    assert bark_tiny.encodec_vocoder.can_encode
    assert tuple(bark_tiny.encodec_vocoder.decoder.upsampling_ratios) == (4, 2)

    out = bark_tiny.synthesize("hi", bark_tiny.config, rng=jax.random.PRNGKey(3),
                               max_gen_duration_s=0.3)
    assert out["wav"] is not None
    T = out["fine"].shape[1]
    assert out["wav"].shape == (T * 8,)
    assert np.isfinite(out["wav"]).all()

    # encode side: wav → codes for cloning prompts
    codes = bark_tiny.encodec_vocoder.encode(np.random.RandomState(0).randn(64) * 0.1, n_q=4)
    assert codes.shape[0] == 4 and (codes >= 0).all() and (codes < 32).all()


def test_bark_voice_prompt_paths(bark_tiny, tmp_path):
    """Voice prompts flow through all three stages (reference history_prompt
    semantics: semantic history window, trimmed+interleaved coarse history,
    fine in-context frames stripped from the output)."""
    c = bark_tiny.config
    rngnp = np.random.RandomState(0)
    prompt = {
        "semantic_prompt": rngnp.randint(0, c.SEMANTIC_VOCAB_SIZE, 40).astype(np.int64),
        "coarse_prompt": rngnp.randint(0, c.CODEBOOK_SIZE,
                                       (c.N_COARSE_CODEBOOKS, 120)).astype(np.int64),
        "fine_prompt": rngnp.randint(0, c.CODEBOOK_SIZE,
                                     (c.N_FINE_CODEBOOKS, 120)).astype(np.int64),
    }
    np.savez(tmp_path / "alice.npz", **prompt)

    out = bark_tiny.synthesize(
        "hi", c, rng=jax.random.PRNGKey(5), max_gen_duration_s=0.3,
        speaker_id="alice", voice_dirs=str(tmp_path),
    )
    assert out["semantic"].ndim == 1
    assert out["coarse"].shape[0] == c.N_COARSE_CODEBOOKS
    # fine history frames are stripped: output length matches coarse length
    assert out["fine"].shape == (c.N_FINE_CODEBOOKS, out["coarse"].shape[1])
    assert (out["fine"] < 32).all() and (out["fine"] >= 0).all()

    # unknown speaker fails loudly instead of using the default voice
    with pytest.raises(ValueError, match="voice prompt"):
        bark_tiny.synthesize("hi", c, speaker_id="bob", voice_dirs=str(tmp_path),
                             max_gen_duration_s=0.2)

    # coarse respects the alternating codebook slices even without history
    coarse = out["coarse"]
    assert (coarse < c.CODEBOOK_SIZE).all()


def test_fine_sliding_window_long_sequence(bark_tiny):
    """Fine generation longer than the model's block_size: the reference
    slides 1024-wide windows with a 512 hop (inference_funcs.py:561); our
    scan version must handle history + frames > block_size (the pre-window
    implementation indexed wpe out of range here)."""
    c = bark_tiny.config
    block = c.fine_config.block_size  # 640 → win 640, hop 320
    rngnp = np.random.RandomState(3)
    t_gen = block + 60  # forces ≥2 windows even without history
    coarse = rngnp.randint(0, c.CODEBOOK_SIZE,
                           (c.N_COARSE_CODEBOOKS, t_gen)).astype(np.int32)
    hist = rngnp.randint(0, c.CODEBOOK_SIZE,
                         (c.N_FINE_CODEBOOKS, 100)).astype(np.int32)
    out = bark_tiny.generate_fine(coarse, jax.random.PRNGKey(7), history=hist)
    assert out.shape == (c.N_FINE_CODEBOOKS, t_gen)
    # coarse codebooks pass through untouched; fine rows are real codes
    assert (out[: c.N_COARSE_CODEBOOKS] == coarse).all()
    assert (out >= 0).all() and (out < c.CODEBOOK_SIZE).all()
