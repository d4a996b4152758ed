"""Torch→flax parity for the remaining vocoder generators: MelGAN,
ParallelWaveGAN, UnivNet, WaveGrad, WaveRNN — run the REFERENCE torch module
and the converted flax module on identical inputs (reference anchors:
``TTS/vocoder/models/*.py``)."""

import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module", autouse=True)
def ref_path():
    def stub(name, **attrs):
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules.setdefault(name, m)
        return sys.modules[name]

    np.cumproduct = np.cumprod  # removed in numpy 2; reference still calls it
    stub("coqpit", Coqpit=object)
    stub("trainer", TrainerModel=torch.nn.Module)
    stub("trainer.trainer_utils", get_optimizer=None, get_scheduler=None)
    stub("trainer.io", load_fsspec=None)
    stub("trainer.logging")
    stub("trainer.logging.tensorboard_logger", TensorboardLogger=None)
    lib = stub("librosa", magphase=None, pyin=None, stft=None, istft=None,
               resample=None, load=None, to_mono=None)
    lib.effects = stub("librosa.effects", trim=None)
    lib.filters = stub("librosa.filters", mel=None)
    lib.feature = stub("librosa.feature", melspectrogram=None)
    stub("soundfile", read=None, write=None)
    stub("umap", UMAP=None)
    from ref_stubs import ensure_reference_importable

    ensure_reference_importable()
    for key in list(sys.modules):
        if key == "TTS" or key.startswith("TTS."):
            if not str(getattr(sys.modules[key], "__file__", "")).startswith("/root/reference"):
                del sys.modules[key]
    yield


def _np_state(mod):
    return {k: v.numpy() for k, v in mod.state_dict().items()}


def test_melgan_generator_parity():
    from TTS.vocoder.models.melgan_generator import MelganGenerator as RefMelgan

    from tts_tpu.utils.convert import convert_melgan_generator
    from tts_tpu.vocoder.models.melgan_generator import MelganGenerator

    torch.manual_seed(0)
    tg = RefMelgan(in_channels=20, out_channels=1, proj_kernel=7, base_channels=32,
                   upsample_factors=[4, 4], res_kernel=3, num_res_blocks=2)
    tg.eval()
    tg.remove_weight_norm()
    x = np.random.RandomState(0).randn(1, 20, 17).astype(np.float32)
    with torch.no_grad():
        y_t = tg(torch.from_numpy(x)).numpy()[0, 0]

    params = convert_melgan_generator(_np_state(tg), num_upsample_stages=2, num_res_blocks=2)
    jm = MelganGenerator(in_channels=20, base_channels=32, upsample_factors=(4, 4),
                         num_res_blocks=2)
    y_j = np.asarray(jm.apply(params, jnp.asarray(x.transpose(0, 2, 1))))[0, :, 0]
    np.testing.assert_allclose(y_j, y_t, atol=2e-4)


def test_parallel_wavegan_generator_parity():
    from TTS.vocoder.models.parallel_wavegan_generator import (
        ParallelWaveganGenerator as RefPWG,
    )

    from tts_tpu.utils.convert import convert_parallel_wavegan_generator
    from tts_tpu.vocoder.models.parallel_wavegan_generator import ParallelWaveganGenerator

    torch.manual_seed(0)
    # NOTE: reference upsample_net hardcodes aux_channels=80 in ConvUpsample
    tg = RefPWG(in_channels=1, out_channels=1, kernel_size=3, num_res_blocks=6,
                stacks=3, res_channels=8, gate_channels=16, skip_channels=8,
                aux_channels=80, upsample_factors=[4, 4])
    tg.eval()
    tg.remove_weight_norm()
    rng = np.random.RandomState(0)
    c = rng.randn(1, 80, 7).astype(np.float32)
    x = rng.randn(1, 1, 7 * 16).astype(np.float32)
    import unittest.mock as mock
    with torch.no_grad(), mock.patch("torch.randn", lambda *a, **k: torch.from_numpy(x.copy())):
        y_t = tg(torch.from_numpy(c)).numpy()[0, 0]

    params = convert_parallel_wavegan_generator(
        _np_state(tg), num_res_blocks=6, num_upsample_stages=2
    )
    jm = ParallelWaveganGenerator(num_res_blocks=6, stacks=3, res_channels=8,
                                  gate_channels=16, skip_channels=8, aux_channels=80,
                                  upsample_factors=(4, 4))
    y_j = np.asarray(
        jm.apply(params, jnp.asarray(c.transpose(0, 2, 1)), jnp.asarray(x.transpose(0, 2, 1)))
    )[0, :, 0]
    np.testing.assert_allclose(y_j, y_t, atol=2e-4)


def test_univnet_generator_parity():
    from TTS.vocoder.models.univnet_generator import UnivnetGenerator as RefUnivnet

    from tts_tpu.utils.convert import convert_univnet_generator
    from tts_tpu.vocoder.models.univnet_generator import UnivnetGenerator

    torch.manual_seed(0)
    tg = RefUnivnet(in_channels=8, out_channels=1, hidden_channels=8, cond_channels=20,
                    upsample_factors=[2, 2], lvc_layers_each_block=2, lvc_kernel_size=3,
                    kpnet_hidden_channels=8, kpnet_conv_size=3, dropout=0.0)
    tg.eval()
    tg.remove_weight_norm()
    rng = np.random.RandomState(0)
    c = rng.randn(1, 20, 9).astype(np.float32)
    x = rng.randn(1, 8, 9).astype(np.float32)  # noise [B, in_ch, T_mel]
    import unittest.mock as mock
    with torch.no_grad(), mock.patch("torch.randn", lambda *a, **k: torch.from_numpy(x.copy())):
        y_t = tg(torch.from_numpy(c)).numpy()[0, 0]

    params = convert_univnet_generator(_np_state(tg), num_blocks=2, kpnet_res_blocks=3)
    jm = UnivnetGenerator(in_channels=8, hidden_channels=8, cond_channels=20,
                          upsample_factors=(2, 2), lvc_layers_each_block=2,
                          kpnet_hidden_channels=8)
    y_j = np.asarray(
        jm.apply(params, jnp.asarray(c.transpose(0, 2, 1)), x=jnp.asarray(x.transpose(0, 2, 1)))
    )[0, :, 0]
    np.testing.assert_allclose(y_j, y_t, atol=2e-4)


def test_wavegrad_parity():
    from TTS.vocoder.models.wavegrad import Wavegrad as RefWavegrad
    from TTS.vocoder.models.wavegrad import WavegradArgs

    from tts_tpu.utils.convert import convert_wavegrad
    from tts_tpu.vocoder.models.wavegrad import Wavegrad

    class FakeConfig:
        def __init__(self, p):
            self.model_params = p

        def __contains__(self, k):
            return hasattr(self, k)

    torch.manual_seed(0)
    args = WavegradArgs(in_channels=20, out_channels=1, use_weight_norm=False,
                        y_conv_channels=8, x_conv_channels=24,
                        dblock_out_channels=[8, 12], ublock_out_channels=[24, 12, 8],
                        upsample_factors=[2, 2, 2],
                        upsample_dilations=[[1, 2, 1, 2]] * 3)
    tg = RefWavegrad(FakeConfig(args))
    tg.eval()
    rng = np.random.RandomState(0)
    spec = rng.randn(1, 20, 6).astype(np.float32)
    x = rng.randn(1, 1, 48).astype(np.float32)
    noise_scale = np.asarray([0.37], np.float32)
    with torch.no_grad():
        y_t = tg(torch.from_numpy(x), torch.from_numpy(spec),
                 torch.from_numpy(noise_scale)).numpy()[0, 0]

    params = convert_wavegrad(_np_state(tg))
    jm = Wavegrad(in_channels=20, y_conv_channels=8, x_conv_channels=24,
                  dblock_out_channels=(8, 12), ublock_out_channels=(24, 12, 8),
                  upsample_factors=(2, 2, 2), upsample_dilations=((1, 2, 1, 2),) * 3)
    y_j = np.asarray(
        jm.apply(params, jnp.asarray(x.transpose(0, 2, 1)),
                 jnp.asarray(spec.transpose(0, 2, 1)), jnp.asarray(noise_scale))
    )[0, :, 0]
    np.testing.assert_allclose(y_j, y_t, atol=5e-4)


def test_wavernn_parity():
    import TTS.vocoder.models.wavernn as ref_wrn

    from tts_tpu.utils.convert import convert_wavernn
    from tts_tpu.vocoder.models.wavernn import Wavernn

    ref_wrn.AudioProcessor = lambda **kw: None

    class AudioObj:
        hop_length = 4

        def to_dict(self):
            return {}

    class FakeConfig:
        def __init__(self, p):
            self.model_args = p
            self.audio = AudioObj()

        def __contains__(self, k):
            return hasattr(self, k)

    torch.manual_seed(0)
    wargs = ref_wrn.WavernnArgs(rnn_dims=16, fc_dims=16, compute_dims=8, res_out_dims=8,
                                num_res_blocks=2, use_aux_net=True, use_upsample_net=True,
                                upsample_factors=[2, 2], feat_dims=20, mode="mold",
                                mulaw=True, pad=2)
    tw = ref_wrn.Wavernn(FakeConfig(wargs))
    tw.eval()
    rng = np.random.RandomState(0)
    mels = rng.randn(1, 20, 12).astype(np.float32)  # [B, M, T] (ref layout)
    T_wav = (12 - 2 * 2) * 4
    x = rng.randn(1, T_wav).astype(np.float32)
    with torch.no_grad():
        y_t = tw(torch.from_numpy(x), torch.from_numpy(mels)).numpy()[0]

    params = convert_wavernn(_np_state(tw), num_res_blocks=2, num_upsample_stages=2)
    jm = Wavernn(rnn_dims=16, fc_dims=16, compute_dims=8, res_out_dims=8,
                 num_res_blocks=2, feat_dims=20, upsample_factors=(2, 2),
                 norm_type="folded")
    y_j = np.asarray(jm.apply(params, jnp.asarray(x), jnp.asarray(mels.transpose(0, 2, 1))))[0]
    np.testing.assert_allclose(y_j, y_t, atol=5e-4)
