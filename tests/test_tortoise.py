"""Tortoise tests (reference model: tests/zoo_tests tortoise)."""

import jax
import jax.numpy as jnp
import numpy as np

from tts_tpu.models.tortoise import Tortoise, TortoiseConfig
from tts_tpu.models.tortoise.config import TortoiseArgs
from helpers import fast_init_model


def test_tortoise_pipeline():
    cfg = TortoiseConfig()
    cfg.model_args = TortoiseArgs(
        ar_layers=1, ar_model_dim=32, ar_heads=2,
        ar_number_text_tokens=30, ar_number_mel_codes=20,
        ar_start_mel_token=18, ar_stop_mel_token=19, ar_start_text_token=29,
        ar_max_text_tokens=24, ar_max_mel_tokens=32,
        diff_model_channels=32, diff_num_layers=3, diff_in_channels=20,
        diff_in_latent_channels=32, diff_num_heads=2, diffusion_iterations=4,
    )
    model = Tortoise(cfg)
    fast_init_model(model, jax.random.PRNGKey(0), attrs=("ar_params", "diff_params"))
    text = jnp.asarray(np.random.RandomState(0).randint(1, 29, (1, 8)))
    cond = jnp.asarray(np.random.RandomState(1).randn(1, 32, 80).astype(np.float32))
    dcond = jnp.asarray(np.random.RandomState(2).randn(1, 24, 20).astype(np.float32))
    out = model.inference(
        text, cond, diffusion_cond_mels=dcond, rng=jax.random.PRNGKey(2),
        max_mel_tokens=10,
    )
    assert out["codes"].shape == (1, 10)
    n_keep = out["mel"].shape[1]
    assert n_keep <= 10 * 4 * 24000 // 22050 and n_keep % 1 == 0
    assert out["mel"].shape[2] == 20
    assert np.isfinite(np.asarray(out["mel"])).all()
    codes = np.asarray(out["codes"])
    assert ((codes >= 0) & (codes < 20)).all()
    # no stand-in: diffusion conditioning is mandatory
    import pytest

    with pytest.raises(ValueError):
        model.inference(text, cond, rng=jax.random.PRNGKey(2), max_mel_tokens=4)


def test_dpm_solver_matches_ddim_ode_limit():
    """DPM-Solver++(2M) integrates the same probability-flow ODE as DDIM
    and converges faster: with a bounded synthetic denoiser (implied x0 in
    [-0.5, 0.5], the regime a trained model operates in), the 2nd-order
    solver tracks the fine-step solution better at equal budgets."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tts_tpu.models.tortoise.model import ddim_sample, dpm_solver_sample

    trained = 4000
    scale = 1000.0 / trained
    betas = jnp.linspace(1e-4 * scale, 2e-2 * scale, trained)
    abar = jnp.cumprod(1 - betas)

    class DenoiserNet:
        def apply(self, params, x, t_vec, precomputed_embeddings=None,
                  conditioning_free=False):
            a = abar[t_vec][:, None, None]
            al, sg = jnp.sqrt(a), jnp.sqrt(1 - a)
            x0 = 0.5 * jnp.tanh(x @ params["w"])
            eps = (x - al * x0) / sg
            return jnp.concatenate([eps, eps], axis=-1)

    C = 8
    net = DenoiserNet()
    params = {"w": jnp.asarray(
        np.random.RandomState(0).randn(C, C).astype(np.float32) * 0.4)}
    emb = jnp.zeros((1, 12, C))
    rng = jax.random.PRNGKey(3)
    kw = dict(in_channels=C, cond_free=False)

    ref = ddim_sample(net, params, emb, 12, rng, steps=800, **kw)
    for n in (16, 30):
        d = float(jnp.abs(ddim_sample(net, params, emb, 12, rng, steps=n, **kw) - ref).mean())
        p_arr = dpm_solver_sample(net, params, emb, 12, rng, steps=n, **kw)
        p = float(jnp.abs(p_arr - ref).mean())
        assert np.isfinite(np.asarray(p_arr)).all()
        assert p < d, (n, p, d)


REF_TOKENIZER_JSON = "/root/reference/TTS/tts/utils/assets/tortoise/tokenizer.json"


def test_voice_bpe_tokenizer_parity():
    """Our greedy-BPE VoiceBpeTokenizer vs the HF ``tokenizers`` runtime on
    the reference vocab (reference ``tortoise/tokenizer.py:25-29``)."""
    import pytest

    tokenizers = pytest.importorskip("tokenizers")
    from tts_tpu.models.tortoise.tokenizer import VoiceBpeTokenizer

    ref = tokenizers.Tokenizer.from_file(REF_TOKENIZER_JSON)
    ours = VoiceBpeTokenizer()  # bundled asset

    texts = [
        "Hello world.",
        "The quick brown fox jumps over the lazy dog!",
        "I owe you $13.50 — pay up, mister; it's overdue.",
        "Dr. Smith lives on St. George's Rd.",
        "He said: \"twenty-two llamas?!\"",
        "aaa bbbb ccccc zzz qqq xyzzy",
        "1,234,567 and 3rd and 2nd and 1st",
    ]
    for txt in texts:
        pre = ours.preprocess_text(txt).replace(" ", "[SPACE]")
        ref_ids = ref.encode(pre).ids
        assert ours.encode(txt) == ref_ids, txt
        # decode matches the reference decode semantics (tokenizer.py:30-36)
        ref_dec = ref.decode(ref_ids, skip_special_tokens=False).replace(" ", "")
        ref_dec = ref_dec.replace("[SPACE]", " ").replace("[STOP]", "").replace("[UNK]", "")
        assert ours.decode(ref_ids) == ref_dec, txt


def test_voice_bpe_tokenizer_hf_format():
    """Loading an HF-format tokenizer.json directly yields the same ids as
    the bundled asset (user-supplied vocab path)."""
    from tts_tpu.models.tortoise.tokenizer import VoiceBpeTokenizer

    ours = VoiceBpeTokenizer()
    hf = VoiceBpeTokenizer(vocab_file=REF_TOKENIZER_JSON)
    for txt in ["Testing, one two three.", "it's a-okay y'all"]:
        assert ours.encode(txt) == hf.encode(txt)


def _torch_mel_oracle(wav, sr, n_mels, fmax, htk, power):
    """torch.stft-based mirror of the reference mel pipelines
    (torchaudio MelSpectrogram / TTS.utils.audio.torch_transforms.TorchSTFT:
    center=True, reflect pad, hann, slaney area-norm filterbank)."""
    import torch

    from tts_tpu.audio.mel import mel_filterbank

    x = torch.from_numpy(np.asarray(wav, np.float32))
    o = torch.stft(
        x, 1024, 256, 1024, torch.hann_window(1024), center=True,
        pad_mode="reflect", onesided=True, return_complex=True,
    )
    if power == 2:
        S = o.abs() ** 2
    else:
        S = torch.sqrt(torch.clamp(o.real**2 + o.imag**2, min=1e-8))
    basis = torch.from_numpy(
        mel_filterbank(sr, 1024, n_mels, fmin=0.0, fmax=fmax, htk=htk, norm="slaney")
    ).float()
    mel = basis @ S
    return torch.log(torch.clamp(mel, min=1e-5)).numpy()


def test_tortoise_tacotron_mel_parity():
    from tts_tpu.models.tortoise.audio import tacotron_mel

    wav = np.random.RandomState(0).randn(2, 4096).astype(np.float32) * 0.3
    ref = _torch_mel_oracle(wav, 22050, 80, 8000.0, True, 2)
    norms = np.linspace(0.5, 2.0, 80).astype(np.float32)
    got = np.asarray(tacotron_mel(jnp.asarray(wav), mel_norms=norms))
    ref = ref / norms[None, :, None]
    assert got.shape == (2, ref.shape[2], 80)
    np.testing.assert_allclose(np.swapaxes(got, 1, 2), ref, atol=2e-3, rtol=2e-3)


def test_tortoise_univnet_mel_parity():
    from tts_tpu.models.tortoise.audio import (
        normalize_tacotron_mel,
        wav_to_univnet_mel,
    )

    wav = np.random.RandomState(1).randn(1, 4800).astype(np.float32) * 0.3
    ref = _torch_mel_oracle(wav, 24000, 100, 12000.0, False, 1)
    got = np.asarray(wav_to_univnet_mel(jnp.asarray(wav)))
    assert got.shape == (1, ref.shape[2], 100)
    np.testing.assert_allclose(np.swapaxes(got, 1, 2), ref, atol=2e-3, rtol=2e-3)
    # normalized variant maps the tacotron range onto [-1, 1]
    normed = np.asarray(normalize_tacotron_mel(jnp.asarray(ref)))
    assert normed.max() <= 1.01 and normed.min() >= -1.01


def test_tortoise_speaker_errors():
    """Named speakers without voice material fail loudly; best-of-k with
    batch > 1 is rejected up front."""
    import pytest

    cfg = TortoiseConfig()
    cfg.model_args = TortoiseArgs(
        ar_layers=1, ar_model_dim=32, ar_heads=2,
        ar_number_text_tokens=255, ar_number_mel_codes=20,
        ar_start_mel_token=18, ar_stop_mel_token=19, ar_start_text_token=255,
        diff_model_channels=32, diff_num_layers=3, diff_in_channels=20,
        diff_in_latent_channels=32, diff_num_heads=2, diffusion_iterations=2,
    )
    model = Tortoise(cfg)
    with pytest.raises(ValueError, match="voice_dirs"):
        model.synthesize("Hi.", cfg, speaker_id="emma")

    fast_init_model(model, jax.random.PRNGKey(0), attrs=("ar_params", "diff_params"))
    text = jnp.asarray(np.random.RandomState(0).randint(1, 250, (2, 5)))
    cond = jnp.asarray(np.random.RandomState(1).randn(2, 16, 80).astype(np.float32))
    dcond = jnp.asarray(np.random.RandomState(2).randn(2, 12, 20).astype(np.float32))
    with pytest.raises(ValueError, match="batch size 1"):
        model.inference(text, cond, diffusion_cond_mels=dcond, num_samples=2,
                        max_mel_tokens=4)


def test_tortoise_presets():
    """Quality/speed presets (reference tortoise.py:556): preset values fill
    inference kwargs, explicit kwargs win, unknown names fail loudly."""
    import pytest

    cfg = TortoiseConfig()
    cfg.model_args = TortoiseArgs(
        ar_layers=1, ar_model_dim=32, ar_heads=2,
        ar_number_text_tokens=255, ar_number_mel_codes=20,
        ar_start_mel_token=18, ar_stop_mel_token=19, ar_start_text_token=255,
        diff_model_channels=32, diff_num_layers=3, diff_in_channels=20,
        diff_in_latent_channels=32, diff_num_heads=2, diffusion_iterations=2,
    )
    model = Tortoise(cfg)
    fast_init_model(model, jax.random.PRNGKey(0), attrs=("ar_params", "diff_params"))

    seen = {}
    real_inference = model.inference

    def spy(text_tokens, **kw):
        seen.update(kw)
        kw["vocode"] = False  # tiny fixture carries no vocoder weights
        out = real_inference(text_tokens, **kw)
        out["wav"] = np.zeros((1, 16), np.float32)
        return out

    model.inference = spy
    with pytest.raises(ValueError, match="unknown tortoise preset"):
        model.synthesize("Hi.", cfg, speaker_id="random", preset="warp9")

    out = model.synthesize("Hi.", cfg, speaker_id="random", preset="ultra_fast",
                           max_mel_tokens=4)
    assert seen["num_samples"] == 16 and seen["diffusion_iterations"] == 10
    assert seen["sampler"] == "ddim"
    assert "mel" in out or "wav" in out

    # explicit kwarg overrides the preset value
    seen.clear()
    model.synthesize("Hi.", cfg, speaker_id="random", preset="ultra_fast",
                     diffusion_iterations=3, max_mel_tokens=4)
    assert seen["diffusion_iterations"] == 3 and seen["num_samples"] == 16
