"""Torch→flax conversion parity tests: run the REFERENCE torch module and
our flax module on the same inputs and compare outputs numerically."""

import importlib.util
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _load_reference_module(rel_path: str, name: str):
    """Load a reference torch source file with stubbed package deps."""
    coqpit = types.ModuleType("coqpit")
    coqpit.Coqpit = object
    sys.modules.setdefault("coqpit", coqpit)
    sys.modules.setdefault("TTS", types.ModuleType("TTS"))
    sys.modules.setdefault("TTS.utils", types.ModuleType("TTS.utils"))
    io_mod = types.ModuleType("TTS.utils.io")
    io_mod.load_fsspec = lambda *a, **k: None
    sys.modules.setdefault("TTS.utils.io", io_mod)
    spec = importlib.util.spec_from_file_location(name, f"/root/reference/{rel_path}")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_hifigan_generator_parity():
    """Reference torch HiFiGAN vs converted flax HiFiGAN: same output."""
    from tts_tpu.utils.convert import convert_hifigan_generator
    from tts_tpu.vocoder.models.hifigan_generator import HifiganGenerator

    ref = _load_reference_module(
        "TTS/vocoder/models/hifigan_generator.py", "ref_hifigan"
    )
    torch.manual_seed(0)
    # small but structurally complete: 2 upsample stages, 2 resblock kernels
    tg = ref.HifiganGenerator(
        in_channels=20,
        out_channels=1,
        resblock_type="1",
        resblock_dilation_sizes=[[1, 3, 5], [1, 3, 5]],
        resblock_kernel_sizes=[3, 7],
        upsample_kernel_sizes=[8, 8],
        upsample_initial_channel=32,
        upsample_factors=[4, 4],
    )
    tg.eval()
    tg.remove_weight_norm()

    x = np.random.RandomState(0).randn(1, 20, 17).astype(np.float32)  # [B, C, T]
    with torch.no_grad():
        y_torch = tg(torch.from_numpy(x)).numpy()[0, 0]

    state = {k: v.numpy() for k, v in tg.state_dict().items()}
    params = convert_hifigan_generator(state)

    jg = HifiganGenerator(
        in_channels=20,
        out_channels=1,
        resblock_type="1",
        resblock_dilation_sizes=((1, 3, 5), (1, 3, 5)),
        resblock_kernel_sizes=(3, 7),
        upsample_kernel_sizes=(8, 8),
        upsample_initial_channel=32,
        upsample_factors=(4, 4),
    )
    y_jax = np.asarray(jg.apply(params, jnp.asarray(x.transpose(0, 2, 1))))[0, :, 0]

    assert y_torch.shape == y_jax.shape
    np.testing.assert_allclose(y_jax, y_torch, atol=2e-5)


def test_weight_norm_folding():
    from tts_tpu.utils.convert import fold_weight_norm

    conv = torch.nn.utils.parametrizations.weight_norm(torch.nn.Conv1d(4, 8, 3))
    x = torch.randn(1, 4, 10)
    with torch.no_grad():
        y_ref = conv(x).numpy()
    state = {("conv." + k): v.numpy() for k, v in conv.state_dict().items()}
    folded = fold_weight_norm(state)
    assert "conv.weight" in folded
    plain = torch.nn.Conv1d(4, 8, 3)
    plain.weight.data = torch.from_numpy(folded["conv.weight"].copy())
    plain.bias.data = torch.from_numpy(folded["conv.bias"].copy())
    with torch.no_grad():
        y_folded = plain(x).numpy()
    np.testing.assert_allclose(y_folded, y_ref, atol=1e-6)
