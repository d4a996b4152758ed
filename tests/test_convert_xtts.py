"""XTTS GPT torch→flax conversion parity: run the reference GPT stack and
our converted flax modules on identical inputs (reference
``TTS/tts/layers/xtts/gpt.py:88``)."""

import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

DIMS = dict(
    layers=2,
    model_dim=64,
    heads=4,
    max_text_tokens=40,
    max_mel_tokens=60,
    max_prompt_tokens=2,
    number_text_tokens=50,
    num_audio_tokens=30,
    start_audio_token=26,
    stop_audio_token=27,
    start_text_token=48,
    stop_text_token=0,
)


@pytest.fixture(scope="module")
def ref_gpt():
    import importlib.machinery

    def stub(name, **attrs):
        # reuse a stub another test already registered, but make sure it has
        # a real __spec__ — transformers probes importlib.util.find_spec on
        # optional deps and a None __spec__ makes that raise
        m = sys.modules.setdefault(name, types.ModuleType(name))
        if getattr(m, "__spec__", None) is None:
            m.__spec__ = importlib.machinery.ModuleSpec(name, None)
        for k, v in attrs.items():
            if not hasattr(m, k):
                setattr(m, k, v)
        return m

    stub("coqpit", Coqpit=object)
    lib = stub("librosa", magphase=None, pyin=None, stft=None, istft=None, resample=None,
               load=None, to_mono=None)
    lib.effects = stub("librosa.effects", trim=None)
    lib.filters = stub("librosa.filters", mel=None)
    lib.feature = stub("librosa.feature", melspectrogram=None)
    stub("soundfile", read=None, write=None)
    stub("anyascii", anyascii=lambda s: s)
    from ref_stubs import ensure_reference_importable

    ensure_reference_importable()
    # test_convert.py registers bare-module TTS/TTS.utils stubs; purge any
    # that don't come from the real reference tree so package imports work
    for key in list(sys.modules):
        if key == "TTS" or key.startswith("TTS."):
            if not str(getattr(sys.modules[key], "__file__", "")).startswith("/root/reference"):
                del sys.modules[key]
    from TTS.tts.layers.xtts.gpt import GPT

    torch.manual_seed(0)
    model = GPT(use_perceiver_resampler=True, **DIMS)
    model.eval()
    return model


@pytest.fixture(scope="module")
def converted(ref_gpt):
    from tts_tpu.utils.convert import convert_xtts_gpt

    sd = {k: v.detach().numpy() for k, v in ref_gpt.state_dict().items()}
    return convert_xtts_gpt(
        sd, layers=DIMS["layers"], heads=DIMS["heads"], prefix=""
    )


def test_gpt2_core_parity(ref_gpt, converted):
    from tts_tpu.models.xtts.gpt_core import GPT2Core, causal_mask

    B, T, D = 2, 11, DIMS["model_dim"]
    emb = np.random.RandomState(0).randn(B, T, D).astype(np.float32)
    with torch.no_grad():
        ref_out = ref_gpt.gpt(inputs_embeds=torch.from_numpy(emb)).last_hidden_state.numpy()

    core = GPT2Core(layers=DIMS["layers"], dim=D, heads=DIMS["heads"])
    ours, _ = core.apply(
        {"params": converted["params"]["gpt"]}, jnp.asarray(emb), causal_mask(T)
    )
    np.testing.assert_allclose(np.asarray(ours), ref_out, atol=2e-4)


def test_style_emb_parity(ref_gpt, converted):
    """ConditioningEncoder + PerceiverResampler (reference gpt.py:353)."""
    from tts_tpu.models.xtts.gpt import XttsGPT

    B, T = 2, 37
    mel = np.random.RandomState(1).randn(B, 80, T).astype(np.float32)
    with torch.no_grad():
        ref_lat = ref_gpt.get_style_emb(torch.from_numpy(mel)).numpy()  # [B, D, 32]

    module = XttsGPT(
        layers=DIMS["layers"], model_dim=DIMS["model_dim"], heads=DIMS["heads"],
        number_text_tokens=DIMS["number_text_tokens"],
        num_audio_tokens=DIMS["num_audio_tokens"],
        start_audio_token=DIMS["start_audio_token"],
        stop_audio_token=DIMS["stop_audio_token"],
        start_text_token=DIMS["start_text_token"],
        stop_text_token=DIMS["stop_text_token"],
        max_text_tokens=DIMS["max_text_tokens"],
        max_mel_tokens=DIMS["max_mel_tokens"],
        use_perceiver_resampler=True,
    )
    ours = module.apply(
        converted, jnp.asarray(mel.transpose(0, 2, 1)), method=XttsGPT.get_style_emb
    )
    np.testing.assert_allclose(
        np.asarray(ours), ref_lat.transpose(0, 2, 1), atol=2e-4
    )


def test_full_forward_with_converted(ref_gpt, converted):
    """Converted checkpoint drives our full teacher-forced forward."""
    from tts_tpu.models.xtts.gpt import XttsGPT

    module = XttsGPT(
        layers=DIMS["layers"], model_dim=DIMS["model_dim"], heads=DIMS["heads"],
        number_text_tokens=DIMS["number_text_tokens"],
        num_audio_tokens=DIMS["num_audio_tokens"],
        start_audio_token=DIMS["start_audio_token"],
        stop_audio_token=DIMS["stop_audio_token"],
        start_text_token=DIMS["start_text_token"],
        stop_text_token=DIMS["stop_text_token"],
        max_text_tokens=DIMS["max_text_tokens"],
        max_mel_tokens=DIMS["max_mel_tokens"],
        use_perceiver_resampler=True,
    )
    rs = np.random.RandomState(2)
    text = jnp.asarray(rs.randint(1, 40, (2, 9)))
    codes = jnp.asarray(rs.randint(0, 26, (2, 13)))
    mel = jnp.asarray(rs.randn(2, 37, 80).astype(np.float32))
    out = module.apply(
        converted, text, jnp.array([9, 7]), codes, jnp.array([13, 11]), cond_mels=mel
    )
    assert np.isfinite(np.asarray(out["mel_logits"])).all()
    assert np.isfinite(np.asarray(out["text_logits"])).all()


@pytest.fixture(scope="module")
def ref_hifi():
    """Reference XTTS HiFi decoder parts (needs a torchaudio stub)."""
    import types as _types
    import importlib.machinery as _mach

    def stub(name, **attrs):
        m = sys.modules.setdefault(name, _types.ModuleType(name))
        if getattr(m, "__spec__", None) is None:
            m.__spec__ = _mach.ModuleSpec(name, None)
        for k, v in attrs.items():
            if not hasattr(m, k):
                setattr(m, k, v)
        return m

    ta = stub("torchaudio")
    ta.transforms = stub("torchaudio.transforms", MelSpectrogram=object)
    stub("coqpit", Coqpit=object)
    lib = stub("librosa", magphase=None, pyin=None, stft=None, istft=None,
               resample=None, load=None, to_mono=None)
    lib.effects = stub("librosa.effects", trim=None)
    lib.filters = stub("librosa.filters", mel=None)
    lib.feature = stub("librosa.feature", melspectrogram=None)
    stub("soundfile", read=None, write=None)
    stub("anyascii", anyascii=lambda s: s)
    from ref_stubs import ensure_reference_importable

    ensure_reference_importable()
    for key in list(sys.modules):
        if key == "TTS" or key.startswith("TTS."):
            if not str(getattr(sys.modules[key], "__file__", "")).startswith("/root/reference"):
                del sys.modules[key]
    from TTS.tts.layers.xtts import hifigan_decoder

    return hifigan_decoder


def test_resnet_speaker_encoder_parity(ref_hifi):
    from tts_tpu.encoder.model import ResNetSpeakerEncoder
    from tts_tpu.utils.convert import convert_resnet_speaker_encoder

    torch.manual_seed(1)
    ref = ref_hifi.ResNetSpeakerEncoder(
        input_dim=64, proj_dim=512, log_input=True, use_torch_spec=False
    )
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_resnet_speaker_encoder(sd)

    mel = np.abs(np.random.RandomState(4).randn(2, 64, 80)).astype(np.float32) + 0.1
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(mel), l2_norm=True).numpy()

    module = ResNetSpeakerEncoder(
        input_dim=64, proj_dim=512, log_input=True, norm_type="folded"
    )
    ours = module.apply(
        {"params": params}, jnp.asarray(mel.transpose(0, 2, 1)), l2_norm=True
    )
    np.testing.assert_allclose(np.asarray(ours), ref_out, atol=2e-4)


def test_xtts_hifigan_parity(ref_hifi):
    """XTTS waveform decoder variant: conds-in-each-up-layer + no-bias post."""
    from tts_tpu.vocoder.models.hifigan_generator import HifiganGenerator
    from tts_tpu.utils.convert import convert_hifigan_generator

    torch.manual_seed(2)
    ref = ref_hifi.HifiganGenerator(
        64, 1, "1", [[1, 3, 5], [1, 3, 5], [1, 3, 5]], [3, 7, 11],
        [16, 16, 4, 4], 128, [8, 8, 2, 2], inference_padding=0,
        cond_channels=32, conv_pre_weight_norm=False,
        conv_post_weight_norm=False, conv_post_bias=False,
        cond_in_each_up_layer=True,
    )
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_hifigan_generator(sd)

    rs = np.random.RandomState(5)
    x = rs.randn(2, 64, 7).astype(np.float32)
    g = rs.randn(2, 32, 1).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x), g=torch.from_numpy(g)).numpy()

    module = HifiganGenerator(
        in_channels=64, out_channels=1, resblock_type="1",
        resblock_dilation_sizes=((1, 3, 5),) * 3, resblock_kernel_sizes=(3, 7, 11),
        upsample_kernel_sizes=(16, 16, 4, 4), upsample_initial_channel=128,
        upsample_factors=(8, 8, 2, 2), inference_padding=0, cond_channels=32,
        conv_post_bias=False, cond_in_each_up_layer=True,
    )
    ours = module.apply(
        params, jnp.asarray(x.transpose(0, 2, 1)), jnp.asarray(g[:, :, 0])[:, None, :]
    )
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 2, 1), ref_out, atol=2e-4
    )


def test_style_emb_parity_v1_layout(ref_gpt):
    """XTTS v1.x layout: no perceiver — every conditioning frame stays a
    prompt latent (reference gpt.py:362 returns (b, d, s))."""
    from TTS.tts.layers.xtts.gpt import GPT

    from tts_tpu.models.xtts.gpt import XttsGPT
    from tts_tpu.utils.convert import convert_xtts_gpt

    torch.manual_seed(1)
    ref_v1 = GPT(use_perceiver_resampler=False, **DIMS)
    ref_v1.eval()
    sd = {k: v.detach().numpy() for k, v in ref_v1.state_dict().items()}
    params = convert_xtts_gpt(
        sd, layers=DIMS["layers"], heads=DIMS["heads"], prefix="", use_perceiver=False
    )

    B, T = 2, 23
    mel = np.random.RandomState(2).randn(B, 80, T).astype(np.float32)
    with torch.no_grad():
        ref_lat = ref_v1.get_style_emb(torch.from_numpy(mel)).numpy()  # [B, D, s]

    module = XttsGPT(
        layers=DIMS["layers"], model_dim=DIMS["model_dim"], heads=DIMS["heads"],
        number_text_tokens=DIMS["number_text_tokens"],
        num_audio_tokens=DIMS["num_audio_tokens"],
        start_audio_token=DIMS["start_audio_token"],
        stop_audio_token=DIMS["stop_audio_token"],
        start_text_token=DIMS["start_text_token"],
        stop_text_token=DIMS["stop_text_token"],
        max_text_tokens=DIMS["max_text_tokens"],
        max_mel_tokens=DIMS["max_mel_tokens"],
        use_perceiver_resampler=False,
    )
    ours = module.apply(
        params, jnp.asarray(mel.transpose(0, 2, 1)), method=XttsGPT.get_style_emb
    )
    assert np.asarray(ours).shape == (B, ref_lat.shape[2], DIMS["model_dim"])
    np.testing.assert_allclose(np.asarray(ours), ref_lat.transpose(0, 2, 1), atol=2e-4)
