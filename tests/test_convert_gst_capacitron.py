"""GST + Capacitron torch→flax conversion parity
(reference gst_layers.py / capacitron_layers.py vs tts_tpu layers)."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "tests")
from ref_stubs import import_reference, install_reference_stubs  # noqa: E402

install_reference_stubs()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _np_state(mod):
    return {k: v.numpy() for k, v in mod.state_dict().items()}


def test_gst_parity():
    from tts_tpu.layers.tacotron_v1 import GST
    from tts_tpu.utils.convert import convert_gst

    ref_mod = import_reference("TTS.tts.layers.tacotron.gst_layers")
    torch.manual_seed(0)
    tg = ref_mod.GST(num_mel=80, num_heads=4, num_style_tokens=10, gst_embedding_dim=64)
    tg.eval()

    mel = np.random.RandomState(0).randn(2, 25, 80).astype(np.float32)
    with torch.no_grad():
        y_ref = tg(torch.from_numpy(mel)).numpy()[:, 0]  # [B, 64]

    params = {"params": convert_gst(_np_state(tg), prefix="")}
    fg = GST(num_mel=80, num_heads=4, num_style_tokens=10, gst_embedding_dim=64,
             norm_type="folded")
    y = np.asarray(fg.apply(params, jnp.asarray(mel)))
    np.testing.assert_allclose(y, y_ref, atol=2e-5)


def test_capacitron_posterior_parity():
    from tts_tpu.layers.capacitron import CapacitronVAE
    from tts_tpu.utils.convert import convert_capacitron

    ref_mod = import_reference("TTS.tts.layers.tacotron.capacitron_layers")
    torch.manual_seed(0)
    tc = ref_mod.CapacitronVAE(
        num_mel=80, capacitron_VAE_embedding_dim=32,
        encoder_output_dim=24, reference_encoder_out_dim=128,
        text_summary_embedding_dim=16,
    )
    tc.eval()

    rng = np.random.RandomState(1)
    mel = rng.randn(2, 37, 80).astype(np.float32)
    mel_lens = np.asarray([37, 25], np.int64)
    text = rng.randn(2, 11, 24).astype(np.float32)
    text_lens = np.asarray([11, 7], np.int64)
    with torch.no_grad():
        _, posterior, _, beta_ref = tc(
            reference_mel_info=[torch.from_numpy(mel), torch.from_numpy(mel_lens)],
            text_info=[torch.from_numpy(text), torch.from_numpy(text_lens)],
        )
    mu_ref = posterior.mean.numpy()
    # the reference feeds the softplus net output into MVN as the
    # *covariance* diagonal (capacitron_layers.py:74 diag_embed), so its
    # stddev is sqrt(net output); compare at the net-output level
    sigma_ref = posterior.stddev.numpy() ** 2

    params = {"params": convert_capacitron(_np_state(tc), prefix="")}
    fc = CapacitronVAE(
        capacitron_VAE_embedding_dim=32, reference_encoder_out_dim=128,
        text_summary_embedding_dim=16, norm_type="folded",
    )
    mu, sigma = fc.apply(
        params, jnp.asarray(mel), mel_lengths=jnp.asarray(mel_lens),
        text_embeddings=jnp.asarray(text), text_lengths=jnp.asarray(text_lens),
        method=fc.posterior_stats,
    )
    np.testing.assert_allclose(np.asarray(mu), mu_ref, atol=3e-5)
    np.testing.assert_allclose(np.asarray(sigma), sigma_ref, atol=3e-5)
    # softplus(beta_raw) equals the reference's softplus(beta)
    import flax.linen as nn

    beta = nn.softplus(params["params"]["beta"])
    np.testing.assert_allclose(
        float(beta), float(torch.nn.functional.softplus(beta_ref)), atol=1e-6
    )
