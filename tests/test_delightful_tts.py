"""DelightfulTTS tests (reference model: tests/tts_tests2/test_delightful_tts*)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tts_tpu.models.delightful_tts import DelightfulTTS, DelightfulTTSConfig
from tts_tpu.models.delightful_tts.config import DelightfulTtsArgs
from helpers import fast_params


@pytest.fixture(scope="module")
def dt_small():
    cfg = DelightfulTTSConfig()
    cfg.model_args = DelightfulTtsArgs(
        num_chars=24,
        n_hidden_conformer_encoder=32, n_layers_conformer_encoder=1, n_heads_conformer_encoder=2,
        n_hidden_conformer_decoder=32, n_layers_conformer_decoder=1, n_heads_conformer_decoder=2,
        n_hidden_variance_adaptor=32,
        bottleneck_size_u_reference_encoder=16, bottleneck_size_p_reference_encoder=4,
        ref_enc_filters_reference_encoder=[4, 4, 8, 8, 8, 8],
        ref_enc_gru_size_reference_encoder=8, token_num_reference_encoder=3,
    )
    cfg.audio.num_mels = 20
    cfg.vocoder.upsample_rates_decoder = [4, 4]
    cfg.vocoder.upsample_kernel_sizes_decoder = [8, 8]
    cfg.vocoder.upsample_initial_channel_decoder = 32
    cfg.vocoder.resblock_kernel_sizes_decoder = [3]
    cfg.vocoder.resblock_dilation_sizes_decoder = [[1, 3]]
    cfg.vocoder.periods_discriminator = [2, 3]
    cfg.vocoder.discriminator_width_mult = 0.125
    model = DelightfulTTS(cfg)
    params = fast_params(model.init_params, jax.random.PRNGKey(0))
    return model, params, cfg


def _batch(B=2, T_en=7, T_de=24, M=20):
    rng = np.random.RandomState(0)
    return {
        "text_input": jnp.asarray(rng.randint(0, 24, (B, T_en))),
        "text_lengths": jnp.asarray([T_en, T_en - 2]),
        "mel_input": jnp.asarray(rng.randn(B, T_de, M).astype(np.float32)),
        "mel_lengths": jnp.asarray([T_de, T_de - 6]),
        "pitch": jnp.asarray(np.abs(rng.randn(B, T_de, 1)).astype(np.float32)),
        "energy": jnp.asarray(np.abs(rng.randn(B, T_de, 1)).astype(np.float32)),
    }


def test_forward_losses(dt_small):
    model, params, cfg = dt_small
    batch = _batch()
    loss, aux = model.train_step(params, batch, rngs={"dropout": jax.random.PRNGKey(1)})
    assert np.isfinite(float(loss))
    for k in ("loss_mel", "loss_pitch", "loss_energy", "loss_u_prosody", "loss_p_prosody",
              "loss_aligner", "loss_binary"):
        assert np.isfinite(float(aux[k])), k
    assert aux["outputs"]["model_outputs"].shape == (2, 24, 20)


@pytest.mark.slow
def test_joint_gan_train_step(dt_small):
    """Joint acoustic+vocoder fused GAN step (reference trains both via two
    optimizer passes, delightful_tts.py:919; here one backward)."""
    model, _, cfg = dt_small
    cfg.audio.hop_length = 16
    cfg.audio.win_length = 64
    cfg.audio.fft_size = 64
    cfg.model_args.spec_segment_size = 8
    cfg.steps_to_start_discriminator = 0
    step_fn, optimizers, state = model.make_train_step(cfg, jax.random.PRNGKey(0))
    batch = _batch()
    batch["waveform"] = jnp.asarray(
        np.random.RandomState(1).randn(2, 24 * 16, 1).astype(np.float32) * 0.1
    )
    state2, metrics = jax.jit(step_fn)(state, batch, jax.random.PRNGKey(2))
    for k in ("loss", "loss_acoustic", "loss_vocoder_mel", "loss_feat", "loss_gen", "loss_disc"):
        assert np.isfinite(float(metrics[k])), k
    # both generator and discriminator parameters moved
    moved = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), state.params, state2.params)
    assert max(jax.tree.leaves(moved["gen"])) > 0
    assert max(jax.tree.leaves(moved["disc"])) > 0
    # eval step is deterministic no-grad
    ev = model.make_eval_step(cfg)(state2, batch)
    assert np.isfinite(float(ev["loss"]))


def test_inference_with_vocoder(dt_small):
    model, params, cfg = dt_small
    batch = _batch()
    out = model.inference(params, batch["text_input"], batch["text_lengths"], max_frames=32)
    assert out["model_outputs"].shape == (2, 32, 20)
    assert out["waveform"].shape == (2, 32 * 16, 1)
    assert np.isfinite(np.asarray(out["waveform"])).all()
