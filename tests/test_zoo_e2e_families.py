"""Zoo pipeline across model families: reference-layout torch checkpoints
for GlowTTS (+ Multiband-MelGAN default vocoder — the flagship LJSpeech
pairing), FastPitch, Tacotron2 and Overflow, laid out as a downloaded zoo
cache and driven through ``TTS(model_name=...)`` (reference gate:
``tests/zoo_tests/test_models.py:23-44`` iterates every entry; with the
synthetic vits+hifigan entries in ``test_zoo_e2e.py`` this covers 8 zoo
entries across 7 architectures)."""

import json
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ref_stubs import install_reference_stubs  # noqa: E402

NUM_CHARS = 181  # VitsCharacters default vocab (shared characters config)
AUDIO = {
    "sample_rate": 22050,
    "fft_size": 128,
    "win_length": 128,
    "hop_length": 16,
    "num_mels": 20,
    "mel_fmin": 0.0,
    "mel_fmax": None,
    "do_trim_silence": False,
    "signal_norm": False,
}
CHARACTERS = {
    "characters_class": "TTS.tts.models.vits.VitsCharacters",
    "pad": "<PAD>", "eos": "<EOS>", "bos": "<BOS>", "blank": "<BLNK>",
    "characters": "", "punctuations": "!'(),-.:;? ", "phonemes": "",
    "is_unique": False, "is_sorted": True,
}
BASE_TEXT_CFG = {
    "audio": AUDIO,
    "use_phonemes": False,
    "text_cleaner": "basic_cleaners",
    "enable_eos_bos_chars": False,
    "characters": CHARACTERS,
}

GLOW_ENC_PARAMS = {"kernel_size": 3, "dropout_p": 0.0, "num_layers": 2,
                   "num_heads": 2, "hidden_channels_ffn": 64,
                   "rel_attn_window_size": 4}

OVERFLOW_DIMS = dict(
    num_chars=NUM_CHARS, out_channels=20, encoder_in_out_features=32,
    state_per_phone=2, prenet_dim=16, prenet_n_layers=2, memory_rnn_dim=48,
    outputnet_size=[32, 32], prenet_dropout=0.0,
    hidden_channels_dec=24, num_flow_blocks_dec=2, num_block_layers=2,
    dropout_p_dec=0.0,
)


def _state(prefix_mods):
    out = {}
    for prefix, mod in prefix_mods.items():
        for k, v in mod.state_dict().items():
            out[f"{prefix}{k}" if prefix else k] = v
    return out


def _build_glow_state():
    install_reference_stubs()
    from TTS.tts.layers.glow_tts.decoder import Decoder
    from TTS.tts.layers.glow_tts.encoder import Encoder

    torch.manual_seed(0)
    enc = Encoder(NUM_CHARS, out_channels=20, hidden_channels=32,
                  hidden_channels_dp=48, encoder_type="rel_pos_transformer",
                  encoder_params=GLOW_ENC_PARAMS, mean_only=True, use_prenet=True)
    dec = Decoder(20, 24, 5, 1, 2, 2, num_splits=4, num_squeeze=2)
    # lock data-dependent actnorm init so stored weights are used as-is
    for f in dec.flows:
        if hasattr(f, "initialized"):
            f.initialized = True
        if hasattr(f, "set_ddi"):
            f.set_ddi(False)
    return _state({"encoder.": enc, "decoder.": dec})


def _build_mb_melgan_state():
    install_reference_stubs()
    from TTS.vocoder.models.multiband_melgan_generator import MultibandMelganGenerator

    torch.manual_seed(1)
    g = MultibandMelganGenerator(in_channels=20, out_channels=4, proj_kernel=7,
                                 base_channels=32, upsample_factors=(2, 2),
                                 num_res_blocks=2)
    g.remove_weight_norm()
    return {f"model_g.{k}": v for k, v in g.state_dict().items()}


def _build_fastpitch_state():
    install_reference_stubs()
    from TTS.tts.models.forward_tts import ForwardTTS as RefForwardTTS
    from TTS.tts.models.forward_tts import ForwardTTSArgs as RefArgs

    torch.manual_seed(2)
    args = RefArgs(
        num_chars=NUM_CHARS, out_channels=20, hidden_channels=32,
        use_pitch=True, use_energy=False, use_aligner=True,
        duration_predictor_hidden_channels=48,
        pitch_predictor_hidden_channels=48,
        encoder_params={"hidden_channels_ffn": 64, "num_heads": 2,
                        "num_layers": 2, "dropout_p": 0.0},
        decoder_params={"hidden_channels_ffn": 64, "num_heads": 2,
                        "num_layers": 2, "dropout_p": 0.0},
    )
    m = RefForwardTTS(args)
    m.eval()
    return m.state_dict()


def _build_tacotron2_state():
    install_reference_stubs()
    from TTS.tts.layers.tacotron.tacotron2 import Decoder, Encoder, Postnet

    torch.manual_seed(3)

    class RefT2(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.embedding = torch.nn.Embedding(NUM_CHARS, 512)
            self.encoder = Encoder(512)
            self.decoder = Decoder(
                512, 20, 2, "original", False, "softmax", "original", True,
                forward_attn=False, trans_agent=False, forward_attn_mask=False,
                location_attn=True, attn_K=5, separate_stopnet=True,
                max_decoder_steps=200,
            )
            self.postnet = Postnet(20)

    m = RefT2()
    m.eval()
    return m.state_dict()


def _build_overflow_state():
    install_reference_stubs()
    from TTS.tts.configs.overflow_config import OverflowConfig as RefCfg
    from TTS.tts.models.overflow import Overflow as RefOverflow

    torch.manual_seed(4)
    m = RefOverflow(RefCfg(**OVERFLOW_DIMS))
    m.eval()
    m.update_mean_std({"mean": 0.0, "std": 1.0})
    for f in m.decoder.glow_decoder.flows:
        if hasattr(f, "initialized"):
            f.initialized = True
        if hasattr(f, "set_ddi"):
            f.set_ddi(False)
    return m.state_dict()


GLOW_CONFIG = {
    "model": "glow_tts", **BASE_TEXT_CFG,
    "num_chars": NUM_CHARS, "out_channels": 20,
    "hidden_channels_enc": 32, "hidden_channels_dec": 24, "hidden_channels_dp": 48,
    "encoder_type": "rel_pos_transformer", "encoder_params": GLOW_ENC_PARAMS,
    "use_encoder_prenet": True, "mean_only": True,
    "num_flow_blocks_dec": 2, "num_block_layers": 2, "kernel_size_dec": 5,
    "dilation_rate": 1, "num_splits": 4, "num_squeeze": 2,
}
MB_MELGAN_CONFIG = {
    "model": "multiband_melgan",
    "generator_model": "multiband_melgan_generator",
    "generator_model_params": {
        "upsample_factors": [2, 2], "num_res_blocks": 2,
        "base_channels": 32, "out_channels": 4, "proj_kernel": 7,
    },
    "audio": AUDIO,
}
FASTPITCH_CONFIG = {
    "model": "fast_pitch", **BASE_TEXT_CFG,
    "model_args": {
        "num_chars": NUM_CHARS, "out_channels": 20, "hidden_channels": 32,
        "use_pitch": True, "use_energy": False, "use_aligner": True,
        "duration_predictor_hidden_channels": 48,
        "pitch_predictor_hidden_channels": 48,
        "encoder_params": {"hidden_channels_ffn": 64, "num_heads": 2,
                           "num_layers": 2, "dropout_p": 0.0},
        "decoder_params": {"hidden_channels_ffn": 64, "num_heads": 2,
                           "num_layers": 2, "dropout_p": 0.0},
    },
}
TACOTRON2_CONFIG = {
    "model": "tacotron2", **BASE_TEXT_CFG,
    "num_chars": NUM_CHARS, "r": 2, "out_channels": 20,
    "encoder_in_features": 512, "decoder_in_features": 512,
    "max_decoder_steps": 200,
}
OVERFLOW_CONFIG = {
    "model": "overflow", **BASE_TEXT_CFG,
    **{k: v for k, v in OVERFLOW_DIMS.items()},
}

ENTRIES = {
    # (kind, name-path, config dict, state builder, default_vocoder)
    "glow-tts": ("tts_models", GLOW_CONFIG, _build_glow_state,
                 "vocoder_models/en/test2/multiband-melgan"),
    "fast_pitch": ("tts_models", FASTPITCH_CONFIG, _build_fastpitch_state,
                   "vocoder_models/en/test2/multiband-melgan"),
    "tacotron2-DDC": ("tts_models", TACOTRON2_CONFIG, _build_tacotron2_state,
                      "vocoder_models/en/test2/multiband-melgan"),
    "overflow": ("tts_models", OVERFLOW_CONFIG, _build_overflow_state,
                 "vocoder_models/en/test2/multiband-melgan"),
    "multiband-melgan": ("vocoder_models", MB_MELGAN_CONFIG,
                         _build_mb_melgan_state, None),
}


@pytest.fixture(scope="module")
def zoo_home(tmp_path_factory):
    from tts_tpu.text.characters import VitsCharacters

    CHARACTERS["characters"] = VitsCharacters()._characters

    home = tmp_path_factory.mktemp("zoo_home_families")
    data_dir = home / "tts_tpu"
    models_json = {"tts_models": {"en": {"test2": {}}},
                   "vocoder_models": {"en": {"test2": {}}}}
    for name, (kind, config, builder, default_voc) in ENTRIES.items():
        d = data_dir / f"{kind}--en--test2--{name}"
        d.mkdir(parents=True)
        torch.save({"model": builder()}, d / "model_file.pth")
        (d / "config.json").write_text(json.dumps(config))
        models_json[kind]["en"]["test2"][name] = {
            "github_rls_url": "https://invalid.example/never.zip",
            "default_vocoder": default_voc,
        }
    models_file = home / "models.json"
    models_file.write_text(json.dumps(models_json))
    return {"home": str(home), "models_file": str(models_file)}


def _speak(zoo_home, monkeypatch, entry):
    monkeypatch.setenv("TTS_HOME", zoo_home["home"])
    monkeypatch.setenv("TTS_TPU_MODELS_FILE", zoo_home["models_file"])
    from tts_tpu.api import TTS

    tts = TTS(model_name=f"tts_models/en/test2/{entry}")
    wav = np.asarray(tts.tts("Hello there."))
    assert wav.ndim == 1 and len(wav) > 500, wav.shape
    assert np.max(np.abs(wav)) > 1e-4  # non-silent
    assert np.all(np.isfinite(wav))
    return tts


def test_glow_tts_with_mb_melgan(zoo_home, monkeypatch):
    """The flagship zoo pairing: glow-tts acoustic + Multiband-MelGAN
    vocoder, both converted from torch on first use."""
    tts = _speak(zoo_home, monkeypatch, "glow-tts")
    assert tts.synthesizer.vocoder_config.generator_model == "multiband_melgan_generator"
    voc_dir = os.path.join(zoo_home["home"], "tts_tpu",
                           "vocoder_models--en--test2--multiband-melgan")
    assert os.path.isfile(os.path.join(voc_dir, "model_file_flax.msgpack"))


def test_fast_pitch(zoo_home, monkeypatch):
    _speak(zoo_home, monkeypatch, "fast_pitch")


def test_tacotron2(zoo_home, monkeypatch):
    _speak(zoo_home, monkeypatch, "tacotron2-DDC")


def test_overflow(zoo_home, monkeypatch):
    _speak(zoo_home, monkeypatch, "overflow")
