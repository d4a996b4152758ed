"""Zoo e2e for multi-file (directory-layout) model families: Tortoise and
Bark checkpoints in the reference zoo file layout, resolved through
``ModelManager._find_files`` dir dispatch → ``Synthesizer._load_tts_from_dir``
→ ``synthesize()`` (reference gate: ``tests/zoo_tests/test_models.py``
MODELS_WITH_SEP_TESTS).  XTTS-dir covers the remaining marker in
``test_zoo_e2e.py`` synthetic entries; FreeVC is covered via the vc path."""

import json
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ref_stubs import import_reference, install_reference_stubs  # noqa: E402
from helpers import fast_init_model

SR = 22050

TORTOISE_ARGS = dict(
    ar_layers=1, ar_model_dim=32, ar_heads=2,
    ar_number_text_tokens=255, ar_number_mel_codes=30,
    ar_start_mel_token=28, ar_stop_mel_token=29, ar_start_text_token=255,
    ar_max_text_tokens=402, ar_max_mel_tokens=64,
    diff_model_channels=32, diff_num_layers=3, diff_in_channels=100,
    diff_in_latent_channels=32, diff_num_heads=2,
    diffusion_iterations=2, num_autoregressive_samples=1,
    voc_channel_size=8,
)


def _build_tortoise_dir(d):
    """Reference tortoise-v2 zoo layout from reduced-dim reference modules."""
    install_reference_stubs()
    ar_mod = import_reference("TTS.tts.layers.tortoise.autoregressive")
    diff_mod = import_reference("TTS.tts.layers.tortoise.diffusion_decoder")
    voc_mod = import_reference("TTS.tts.layers.tortoise.vocoder")

    torch.manual_seed(0)
    uv = ar_mod.UnifiedVoice(
        layers=1, model_dim=32, heads=2, number_text_tokens=255,
        number_mel_codes=30, start_mel_token=28, stop_mel_token=29,
        max_text_tokens=402, max_mel_tokens=64, max_conditioning_inputs=1,
    )
    torch.save(uv.state_dict(), os.path.join(d, "autoregressive.pth"))

    dd = diff_mod.DiffusionTts(
        model_channels=32, num_layers=3, in_channels=100,
        in_latent_channels=32, in_tokens=40, out_channels=200, num_heads=2,
        dropout=0, layer_drop=0, unconditioned_percentage=0,
    )
    torch.save(dd.state_dict(), os.path.join(d, "diffusion_decoder.pth"))

    voc = voc_mod.UnivNetGenerator(
        noise_dim=64, channel_size=8, dilations=[1, 3, 9, 27],
        strides=[8, 8, 4], lReLU_slope=0.2, kpnet_conv_size=3,
        hop_length=256, n_mel_channels=100,
    )
    torch.save({"model_g": voc.state_dict()}, os.path.join(d, "vocoder.pth"))
    torch.save(torch.rand(80) + 0.5, os.path.join(d, "mel_norms.pth"))

    cfg = {
        "model": "tortoise",
        "model_args": TORTOISE_ARGS,
        "audio": {"sample_rate": 22050, "output_sample_rate": 24000},
    }
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(cfg, f)


BARK_GPT = dict(block_size=640, input_vocab_size=256, output_vocab_size=256,
                n_layer=1, n_head=2, n_embd=32)


def _build_bark_dir(d):
    install_reference_stubs()
    bark_model = import_reference("TTS.tts.layers.bark.model")
    bark_fine = import_reference("TTS.tts.layers.bark.model_fine")

    torch.manual_seed(1)
    for fname, cls, cfg_cls, extra in (
        ("text_2.pt", bark_model.GPT, bark_model.GPTConfig, {}),
        ("coarse_2.pt", bark_model.GPT, bark_model.GPTConfig, {}),
        ("fine_2.pt", bark_fine.FineGPT, bark_fine.FineGPTConfig,
         {"n_codes_total": 4, "n_codes_given": 2,
          "input_vocab_size": 32, "output_vocab_size": 32}),
    ):
        cfg = cfg_cls(**{**BARK_GPT, **extra})
        m = cls(cfg)
        torch.save({"model": m.state_dict()}, os.path.join(d, fname))

    from transformers.models.encodec.modeling_encodec import (
        EncodecConfig,
        EncodecModel,
    )

    enc_cfg = EncodecConfig(
        target_bandwidths=[16.0], sampling_rate=1600, audio_channels=1,
        num_filters=4, hidden_size=16, upsampling_ratios=[4, 2],
        codebook_size=32, codebook_dim=16, kernel_size=5, last_kernel_size=5,
        residual_kernel_size=3, num_lstm_layers=2, num_residual_layers=1,
    )
    torch.save(EncodecModel(enc_cfg).state_dict(),
               os.path.join(d, "encodec_24khz.pth"))

    cfg = {
        "model": "bark",
        "num_chars": 0,
        "SEMANTIC_VOCAB_SIZE": 100, "CODEBOOK_SIZE": 16,
        "TEXT_ENCODING_OFFSET": 104, "TEXT_PAD_TOKEN": 250,
        "SEMANTIC_PAD_TOKEN": 100, "SEMANTIC_INFER_TOKEN": 255,
        "COARSE_INFER_TOKEN": 140, "COARSE_SEMANTIC_PAD_TOKEN": 102,
        "N_FINE_CODEBOOKS": 4,
        "semantic_config": BARK_GPT,
        "coarse_config": BARK_GPT,
        "fine_config": {**BARK_GPT, "input_vocab_size": 32,
                        "output_vocab_size": 32, "n_codes_total": 4,
                        "n_codes_given": 2},
        "audio": {"sample_rate": 24000, "output_sample_rate": 24000},
    }
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(cfg, f)


@pytest.fixture(scope="module")
def zoo_home(tmp_path_factory):
    home = tmp_path_factory.mktemp("zoo_home_dirs")
    data_dir = home / "tts_tpu"
    entries = {
        "tortoise-v2": _build_tortoise_dir,
        "bark": _build_bark_dir,
    }
    models_json = {"tts_models": {"en": {"test4": {}}, "multilingual": {"multi-dataset": {}}}}
    for name, builder in entries.items():
        lang, ds = ("multilingual", "multi-dataset") if name == "bark" else ("en", "test4")
        d = data_dir / f"tts_models--{lang}--{ds}--{name}"
        d.mkdir(parents=True)
        builder(str(d))
        models_json["tts_models"][lang][ds][name] = {
            "github_rls_url": ["https://invalid.example/a.pth"],  # dir layout
            "default_vocoder": None,
        }
    models_file = home / "models.json"
    models_file.write_text(json.dumps(models_json))
    return {"home": str(home), "models_file": str(models_file)}


def _env(zoo_home, monkeypatch):
    monkeypatch.setenv("TTS_HOME", zoo_home["home"])
    monkeypatch.setenv("TTS_TPU_MODELS_FILE", zoo_home["models_file"])


def test_manager_dir_dispatch(zoo_home, monkeypatch):
    """_find_files returns the directory itself for marker-bearing dirs."""
    _env(zoo_home, monkeypatch)
    from tts_tpu.utils.manage import ModelManager

    m = ModelManager()
    path, config, _ = m.download_model("tts_models/en/test4/tortoise-v2")
    assert os.path.isdir(path)
    path2, _, _ = m.download_model("tts_models/multilingual/multi-dataset/bark")
    assert os.path.isdir(path2)


def test_tortoise_dir_through_synthesizer(zoo_home, monkeypatch, tmp_path):
    """tortoise-v2 zoo dir → convert-on-first-use → speech, through the
    full TTS() → Synthesizer → synthesize() dispatch."""
    _env(zoo_home, monkeypatch)
    import scipy.io.wavfile

    from tts_tpu.api import TTS

    ref = (0.1 * np.sin(2 * np.pi * 220 * np.arange(SR) / SR)).astype(np.float32)
    ref_path = str(tmp_path / "voice.wav")
    scipy.io.wavfile.write(ref_path, SR, (ref * 32767).astype(np.int16))

    tts = TTS(model_name="tts_models/en/test4/tortoise-v2")
    wav = np.asarray(tts.tts("Hi.", speaker_wav=ref_path, max_mel_tokens=6))
    assert wav.ndim == 1 and wav.size > 500
    assert np.isfinite(wav).all()
    assert tts.synthesizer.output_sample_rate == 24000
    # converted sub-checkpoints are cached beside the originals
    mdir = os.path.join(zoo_home["home"], "tts_tpu",
                        "tts_models--en--test4--tortoise-v2")
    assert os.path.isfile(os.path.join(mdir, "autoregressive_flax.msgpack"))
    assert os.path.isfile(os.path.join(mdir, "vocoder_flax.msgpack"))


def test_bark_dir_through_synthesizer(zoo_home, monkeypatch):
    """bark zoo dir (3 GPTs + EnCodec) → text→waveform through TTS()."""
    _env(zoo_home, monkeypatch)
    from tts_tpu.api import TTS

    tts = TTS(model_name="tts_models/multilingual/multi-dataset/bark")
    wav = np.asarray(tts.tts("hi", max_gen_duration_s=0.2))
    assert wav.ndim == 1 and wav.size > 50
    assert np.isfinite(wav).all()


def test_xtts_dir_through_manager(zoo_home, monkeypatch, tmp_path):
    """XTTS model dir (vocab.json marker) resolved via ModelManager →
    TTS(model_name=...) → cloning synthesis; completes the _DIR_MARKERS
    coverage (vocab.json / autoregressive.pth / text_2.pt)."""
    _env(zoo_home, monkeypatch)
    import jax

    from test_synthesizer_surfaces import _make_vocab, _tiny_xtts_config
    from tts_tpu.models.xtts.model import Xtts
    from tts_tpu.utils.io import save_checkpoint

    d = os.path.join(zoo_home["home"], "tts_tpu",
                     "tts_models--multilingual--multi-dataset--xtts_v2_test")
    os.makedirs(d, exist_ok=True)
    config = _tiny_xtts_config()
    model = Xtts(config)
    gpt_params, decoder_params = fast_init_model(model, jax.random.PRNGKey(0), attrs=("gpt_params", "decoder_params"))
    save_checkpoint(
        os.path.join(d, "model_flax.msgpack"),
        {"gpt": gpt_params, "decoder": decoder_params, "mel_stats": np.zeros((0,))},
        config=config,
    )
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(config.to_dict(), f, default=str)
    _make_vocab(os.path.join(d, "vocab.json"))
    # register the entry in the models file
    with open(zoo_home["models_file"]) as f:
        mj = json.load(f)
    mj["tts_models"]["multilingual"]["multi-dataset"]["xtts_v2_test"] = {
        "github_rls_url": ["https://invalid.example/a.pth"],
        "default_vocoder": None,
    }
    with open(zoo_home["models_file"], "w") as f:
        json.dump(mj, f)

    import scipy.io.wavfile

    ref = (0.1 * np.sin(2 * np.pi * 220 * np.arange(SR) / SR)).astype(np.float32)
    ref_path = str(tmp_path / "spk.wav")
    scipy.io.wavfile.write(ref_path, SR, (ref * 32767).astype(np.int16))

    from tts_tpu.api import TTS

    tts = TTS(model_name="tts_models/multilingual/multi-dataset/xtts_v2_test")
    wav = np.asarray(tts.tts("hi.", language="en", speaker_wav=ref_path,
                             split_sentences=False))
    assert wav.ndim == 1 and wav.size > 100 and np.isfinite(wav).all()


def test_freevc_through_manager(zoo_home, monkeypatch, tmp_path):
    """voice_conversion_models zoo entry: reference-layout freevc torch
    checkpoint → convert-on-first-use → TTS().voice_conversion, with a tiny
    WavLM standing in for the content extractor."""
    _env(zoo_home, monkeypatch)
    import jax
    import jax.numpy as jnp
    import scipy.io.wavfile

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_convert_freevc import GIN, HID, INTER, SPEC, SSL, _ref_model

    d = os.path.join(zoo_home["home"], "tts_tpu",
                     "voice_conversion_models--multilingual--vctk--freevc24")
    os.makedirs(d, exist_ok=True)
    ref = _ref_model()
    torch.save({"model": ref.state_dict()}, os.path.join(d, "model_file.pth"))
    cfg = {
        "model": "freevc",
        "model_args": {
            "ssl_dim": SSL, "inter_channels": INTER, "hidden_channels": HID,
            "gin_channels": GIN, "spec_channels": SPEC, "use_spk": False,
            "resblock": "1", "resblock_kernel_sizes": [3],
            "resblock_dilation_sizes": [[1, 3, 5]],
            "upsample_rates": [4, 4], "upsample_kernel_sizes": [8, 8],
            "upsample_initial_channel": 32,
        },
        "audio": {"input_sample_rate": 16000, "output_sample_rate": 24000},
    }
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(cfg, f)

    with open(zoo_home["models_file"]) as f:
        mj = json.load(f)
    mj["voice_conversion_models"] = {"multilingual": {"vctk": {"freevc24": {
        "github_rls_url": "https://invalid.example/never.zip",
        "default_vocoder": None,
    }}}}
    with open(zoo_home["models_file"], "w") as f:
        json.dump(mj, f)

    sr = 16000
    for name, seed in (("src.wav", 0), ("tgt.wav", 1)):
        rngw = np.random.RandomState(seed)
        t = np.arange(sr) / sr
        wav = 0.3 * np.sin(2 * np.pi * (200 + 40 * seed) * t) + 0.02 * rngw.randn(sr)
        scipy.io.wavfile.write(str(tmp_path / name), sr, (wav * 32767).astype(np.int16))

    from tts_tpu.api import TTS
    from tts_tpu.vc.modules.wavlm import WavLM, WavLMConfig

    tts = TTS(model_name="voice_conversion_models/multilingual/vctk/freevc24")
    # substitute a tiny random WavLM for the (absent) WavLM-Large download
    wl_cfg = WavLMConfig(
        encoder_layers=1, encoder_embed_dim=SSL, encoder_ffn_embed_dim=SSL,
        encoder_attention_heads=2,
        conv_feature_layers=((8, 10, 5), (8, 4, 4), (SSL, 4, 4), (SSL, 2, 2), (SSL, 2, 2)),
        conv_pos=8, conv_pos_groups=2,
    )
    wl = WavLM(wl_cfg)
    wl_params = wl.init(jax.random.PRNGKey(1), np.zeros((1, 1600), np.float32))
    tts.voice_converter.vc_model.content_extractor = jax.jit(
        lambda w: wl.apply(wl_params, w))

    out = np.asarray(tts.voice_conversion(
        source_wav=str(tmp_path / "src.wav"), target_wav=str(tmp_path / "tgt.wav")
    ))
    assert out.ndim == 1 and out.size > 500 and np.isfinite(out).all()
    assert os.path.isfile(os.path.join(d, "model_file_flax.msgpack"))
