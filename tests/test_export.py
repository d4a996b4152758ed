"""StableHLO export/reload parity (the TPU-native analog of the
reference's ONNX export, vits.py:1806)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tts_tpu.utils.export import export_inference, export_vits_inference, load_exported
from helpers import fast_params


def test_roundtrip_simple_fn(tmp_path):
    w = jnp.asarray(np.random.RandomState(0).randn(8, 4).astype(np.float32))

    def fn(x):
        return jnp.tanh(x @ w)

    x = np.random.RandomState(1).randn(2, 8).astype(np.float32)
    path = str(tmp_path / "fn.tpuexport")
    export_inference(fn, (x,), path, platforms=("cpu",))
    call, meta = load_exported(path)
    np.testing.assert_allclose(np.asarray(call(x)), np.asarray(fn(x)), atol=1e-6)
    assert meta["signature"][0]["shape"] == [2, 8]


def test_vits_export_roundtrip(tmp_path):
    from tts_tpu.models.vits import Vits, VitsArgs, VitsConfig

    args = VitsArgs(
        num_chars=40, out_channels=65, spec_segment_size=8, hidden_channels=32,
        hidden_channels_ffn_text_encoder=64, num_layers_text_encoder=2,
        num_layers_posterior_encoder=2, num_layers_flow=2,
        upsample_rates_decoder=[4, 4], upsample_kernel_sizes_decoder=[8, 8],
        upsample_initial_channel_decoder=64, resblock_kernel_sizes_decoder=[3],
        resblock_dilation_sizes_decoder=[[1, 3]],
        periods_multi_period_discriminator=[2, 3],
        discriminator_width_mult=0.125,
    )
    cfg = VitsConfig(model_args=args)
    cfg.audio.fft_size = 128
    cfg.audio.win_length = 128
    cfg.audio.hop_length = 16
    cfg.audio.num_mels = 20
    model = Vits(cfg)
    gen_params, _ = fast_params(model.init_params, jax.random.PRNGKey(0))

    path = str(tmp_path / "vits.tpuexport")
    export_vits_inference(model, gen_params, path, max_frames=32, max_text_len=16)
    call, meta = load_exported(path)
    assert meta["model"] == "vits" and meta["max_frames"] == 32

    x = np.zeros((1, 16), np.int32)
    x[0, :10] = np.random.RandomState(2).randint(1, 40, 10)
    xl = np.asarray([10], np.int32)
    seed = np.asarray(jax.random.key_data(jax.random.PRNGKey(7)))
    wav_exported, _ = call(x, xl, seed)

    ref = model.inference(
        gen_params, jnp.asarray(x), jnp.asarray(xl), max_frames=32,
        rng=jax.random.PRNGKey(7),
    )["model_outputs"]
    np.testing.assert_allclose(
        np.asarray(wav_exported), np.asarray(ref), atol=2e-5
    )
