"""VITS model tests (reference model: tests/tts_tests/test_vits.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tts_tpu.models.vits import (
    Vits,
    VitsArgs,
    VitsConfig,
    discriminator_adv_loss,
    feature_loss,
    generator_adv_loss,
    kl_loss,
)
from helpers import fast_params


def _small_args(**kw):
    return VitsArgs(
        num_chars=32,
        out_channels=65,  # small linear spec
        spec_segment_size=8,
        hidden_channels=32,
        hidden_channels_ffn_text_encoder=64,
        num_layers_text_encoder=2,
        num_layers_posterior_encoder=2,
        num_layers_flow=2,
        upsample_rates_decoder=[4, 4],
        upsample_kernel_sizes_decoder=[8, 8],
        upsample_initial_channel_decoder=64,
        resblock_kernel_sizes_decoder=[3],
        resblock_dilation_sizes_decoder=[[1, 3]],
        periods_multi_period_discriminator=[2, 3],
        discriminator_width_mult=0.125,
        **kw,
    )


@pytest.fixture(scope="module")
def vits_small():
    cfg = VitsConfig(model_args=_small_args())
    model = Vits(cfg)
    gen_params, disc_params = fast_params(model.init_params, jax.random.PRNGKey(0))
    return model, gen_params, disc_params


def _batch(B=2, T_en=9, T_de=24, C=65, hop=16):
    rng = np.random.RandomState(0)
    return {
        "text_input": jnp.asarray(rng.randint(0, 32, (B, T_en))),
        "text_lengths": jnp.asarray([T_en, T_en - 2]),
        "spec": jnp.asarray(rng.randn(B, T_de, C).astype(np.float32)),
        "spec_lengths": jnp.asarray([T_de, T_de - 4]),
        "waveform": jnp.asarray(rng.randn(B, T_de * hop, 1).astype(np.float32)),
    }


def test_vits_forward(vits_small):
    model, gen_params, _ = vits_small
    batch = _batch()
    rngs = {
        "noise": jax.random.PRNGKey(1),
        "segments": jax.random.PRNGKey(2),
        "dropout": jax.random.PRNGKey(3),
    }
    out = model.forward(gen_params, batch, rngs)
    seg_wav_len = 8 * 16  # spec_segment_size * upsample product
    assert out["model_outputs"].shape == (2, seg_wav_len, 1)
    assert out["z"].shape == (2, 24, 32)
    assert out["z_p"].shape == (2, 24, 32)
    assert np.isfinite(np.asarray(out["model_outputs"])).all()
    assert np.isfinite(float(out["loss_duration"]))
    # alignments: valid frames sum to 1 token
    attn = np.asarray(out["alignments"])  # [B, T_de, T_en]
    assert np.allclose(attn[0].sum(-1), 1.0)


def test_vits_inference(vits_small):
    model, gen_params, _ = vits_small
    batch = _batch()
    out = model.inference(gen_params, batch["text_input"], batch["text_lengths"], max_frames=64)
    assert out["model_outputs"].shape == (2, 64 * 16, 1)
    assert np.isfinite(np.asarray(out["model_outputs"])).all()


def test_vits_bucketed_decode_matches_full(vits_small):
    """Duration-aware bucketed decode (round-4 serving path): the DP pass
    predicts the same frame counts as the full inference (same rng → same
    SDP sample), and with sampling noise disabled the bucketed decode's
    audio prefix equals the fixed-budget decode's."""
    model, gen_params, _ = vits_small
    batch = _batch()
    rng = jax.random.PRNGKey(7)
    x, xl = batch["text_input"], batch["text_lengths"]

    y_pred = np.asarray(model.infer_durations(gen_params, x, xl, rng=rng))
    assert y_pred.shape == (2,) and (y_pred >= 1).all()
    full = model.inference(gen_params, x, xl, max_frames=64, rng=rng)
    # durations from the dedicated pass match the full pass
    np.testing.assert_array_equal(y_pred.clip(max=64), np.asarray(full["y_lengths"]))

    # deterministic variant (posterior noise shape depends on max_frames, so
    # prefix equality only holds with noise scales zeroed)
    det = Vits(
        VitsConfig(
            model_args=_small_args(
                inference_noise_scale=0.0, inference_noise_scale_dp=0.0
            )
        )
    )
    y_det = np.asarray(det.infer_durations(gen_params, x, xl, rng=rng))
    full = det.inference(gen_params, x, xl, max_frames=64, rng=rng)
    bucket = min(64, (int(y_det.max()) + 15) // 16 * 16)
    out = det.inference(gen_params, x, xl, max_frames=bucket, rng=rng)
    assert out["model_outputs"].shape == (2, bucket * 16, 1)
    n = min(int(y_det.min()), bucket) * 16
    np.testing.assert_allclose(
        np.asarray(out["model_outputs"][:, :n]),
        np.asarray(full["model_outputs"][:, :n]),
        rtol=0,
        atol=1e-5,
    )


def test_vits_losses(vits_small):
    model, gen_params, disc_params = vits_small
    batch = _batch()
    rngs = {
        "noise": jax.random.PRNGKey(1),
        "segments": jax.random.PRNGKey(2),
        "dropout": jax.random.PRNGKey(3),
    }
    out = model.forward(gen_params, batch, rngs)
    from tts_tpu.ops import segment

    wav_seg = segment(
        batch["waveform"], out["slice_ids"] * 16, 8 * 16, pad_short=True
    )
    scores_hat, feats_hat, scores_real, feats_real = model.discriminator.apply(
        disc_params, out["model_outputs"], wav_seg
    )
    l_fm = feature_loss(feats_real, feats_hat)
    l_gen = generator_adv_loss(scores_hat)
    l_disc, _, _ = discriminator_adv_loss(scores_real, scores_hat)
    l_kl = kl_loss(
        out["z_p"], out["logs_q"], out["m_p"], out["logs_p"], z_mask=out["y_mask"]
    )
    for name, l in [("fm", l_fm), ("gen", l_gen), ("disc", l_disc), ("kl", l_kl)]:
        assert np.isfinite(float(l)), name


def test_spline_flow_invertibility():
    from tts_tpu.models.vits.transforms import piecewise_rational_quadratic_transform

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 7).astype(np.float32) * 2)
    uw = jnp.asarray(rng.randn(4, 7, 10).astype(np.float32))
    uh = jnp.asarray(rng.randn(4, 7, 10).astype(np.float32))
    ud = jnp.asarray(rng.randn(4, 7, 9).astype(np.float32))
    y, ld = piecewise_rational_quadratic_transform(x, uw, uh, ud, inverse=False)
    x_rec, ld_inv = piecewise_rational_quadratic_transform(y, uw, uh, ud, inverse=True)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ld), -np.asarray(ld_inv), atol=1e-4)


def test_vits_sdp_vs_dp():
    """Deterministic duration predictor variant also works."""
    cfg = VitsConfig(model_args=_small_args(use_sdp=False))
    model = Vits(cfg)
    gen_params, _ = fast_params(model.init_params, jax.random.PRNGKey(0))
    batch = _batch()
    rngs = {
        "noise": jax.random.PRNGKey(1),
        "segments": jax.random.PRNGKey(2),
        "dropout": jax.random.PRNGKey(3),
    }
    out = model.forward(gen_params, batch, rngs)
    assert np.isfinite(float(out["loss_duration"]))
    inf = model.inference(gen_params, batch["text_input"], batch["text_lengths"], max_frames=32)
    assert np.isfinite(np.asarray(inf["model_outputs"])).all()
