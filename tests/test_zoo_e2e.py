"""Zoo pipeline end-to-end: torch checkpoint → auto-convert → synthesize.

Builds REAL reference-layout torch checkpoints (tiny dims) for a VITS tts
model and a HiFiGAN vocoder, lays them out like a downloaded zoo cache, and
drives ``TTS(model_name=...)`` plus the ``tts`` CLI through the
download→convert→synthesize path (reference gate:
``/root/reference/tests/zoo_tests/test_models.py:23-44``).  Zero-egress: the
"download" step is satisfied by the pre-populated cache dirs.
"""

import json
import os
import subprocess
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _stub_ref_deps():
    # shared stubs (proper __spec__, real packages preferred) so this file
    # composes with the other reference-importing tests in one process
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from ref_stubs import install_reference_stubs

    install_reference_stubs()


# tiny-but-real dims shared between the torch modules and the configs
HIDDEN = 32
SPEC_CH = 65  # fft 128 → 65 bins
NUM_CHARS = 181  # VitsCharacters default vocab
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
VITS_ARGS = {
    "num_chars": NUM_CHARS,
    "out_channels": SPEC_CH,
    "hidden_channels": HIDDEN,
    "hidden_channels_ffn_text_encoder": 64,
    "num_heads_text_encoder": 2,
    "num_layers_text_encoder": 2,
    "kernel_size_text_encoder": 3,
    "num_layers_posterior_encoder": 2,
    "num_layers_flow": 2,
    "upsample_rates_decoder": [4, 4],
    "upsample_kernel_sizes_decoder": [8, 8],
    "upsample_initial_channel_decoder": 64,
    "resblock_kernel_sizes_decoder": [3],
    "resblock_dilation_sizes_decoder": [[1, 3, 5]],
    "use_sdp": True,
    "spec_segment_size": 8,
}


def _build_ref_vits_state():
    """Reference-layout full VITS state dict from the real reference modules."""
    _stub_ref_deps()
    from TTS.tts.layers.vits.networks import PosteriorEncoder, ResidualCouplingBlocks, TextEncoder
    from TTS.tts.layers.vits.stochastic_duration_predictor import StochasticDurationPredictor
    from TTS.vocoder.models.hifigan_generator import HifiganGenerator

    torch.manual_seed(0)
    a = VITS_ARGS
    mods = {
        "text_encoder": TextEncoder(
            a["num_chars"], HIDDEN, HIDDEN, a["hidden_channels_ffn_text_encoder"],
            a["num_heads_text_encoder"], a["num_layers_text_encoder"],
            a["kernel_size_text_encoder"], 0.0,
        ),
        "posterior_encoder": PosteriorEncoder(
            SPEC_CH, HIDDEN, HIDDEN, 5, 1, a["num_layers_posterior_encoder"]
        ),
        "flow": ResidualCouplingBlocks(HIDDEN, HIDDEN, 5, 1, a["num_layers_flow"]),
        "duration_predictor": StochasticDurationPredictor(HIDDEN, 192, 3, 0.5, 4),
        "waveform_decoder": HifiganGenerator(
            HIDDEN, 1, "1",
            a["resblock_dilation_sizes_decoder"], a["resblock_kernel_sizes_decoder"],
            a["upsample_kernel_sizes_decoder"], a["upsample_initial_channel_decoder"],
            a["upsample_rates_decoder"],
            inference_padding=0, conv_pre_weight_norm=False,
            conv_post_weight_norm=False, conv_post_bias=False,
        ),
    }
    state = {}
    for prefix, mod in mods.items():
        for k, v in mod.state_dict().items():
            state[f"{prefix}.{k}"] = v
    return state


def _build_ref_hifigan_state():
    _stub_ref_deps()
    from TTS.vocoder.models.hifigan_generator import HifiganGenerator

    torch.manual_seed(1)
    g = HifiganGenerator(
        AUDIO["num_mels"], 1, "1", [[1, 3, 5]], [3], [8, 8], 64, [4, 4],
    )
    return {f"model_g.{k}": v for k, v in g.state_dict().items()}


VITS_CONFIG = {
    "model": "vits",
    "run_name": "zoo-test",
    "audio": AUDIO,
    "model_args": VITS_ARGS,
    "use_phonemes": False,
    "text_cleaner": "basic_cleaners",
    "add_blank": True,
    "enable_eos_bos_chars": False,
    "characters": {
        "characters_class": "TTS.tts.models.vits.VitsCharacters",
        "pad": "<PAD>",
        "eos": "<EOS>",
        "bos": "<BOS>",
        "blank": "<BLNK>",
        "characters": "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz",
        "punctuations": "!'(),-.:;? ",
        "phonemes": "iyɨʉɯuɪʏʊeøɘəɵɤoɛœɜɞʌɔæɐaɶɑɒᴀɕʑɺɧʲɚ˞ɫ",
        "is_unique": False,
        "is_sorted": True,
    },
}

HIFIGAN_CONFIG = {
    "model": "hifigan",
    "generator_model": "hifigan_generator",
    "discriminator_model": "hifigan_discriminator",
    "generator_model_params": {
        "upsample_factors": [4, 4],
        "upsample_kernel_sizes": [8, 8],
        "upsample_initial_channel": 64,
        "resblock_kernel_sizes": [3],
        "resblock_dilation_sizes": [[1, 3, 5]],
        "resblock_type": "1",
    },
    "audio": AUDIO,
}


@pytest.fixture(scope="module")
def zoo_home(tmp_path_factory):
    """A fake ~/.local/share cache with pre-'downloaded' torch checkpoints."""
    home = tmp_path_factory.mktemp("zoo_home")
    data_dir = home / "tts_tpu"

    # the VitsCharacters default phoneme set is long; use the real one so
    # the converted embedding size (181) matches the tokenizer vocab
    from tts_tpu.text.characters import VitsCharacters

    vc = VitsCharacters()
    assert len(vc.vocab) == NUM_CHARS
    VITS_CONFIG["characters"]["characters"] = vc._characters
    VITS_CONFIG["characters"]["phonemes"] = ""

    vits_dir = data_dir / "tts_models--en--test--vits"
    vits_dir.mkdir(parents=True)
    torch.save({"model": _build_ref_vits_state()}, vits_dir / "model_file.pth")
    (vits_dir / "config.json").write_text(json.dumps(VITS_CONFIG))

    voc_dir = data_dir / "vocoder_models--en--test--hifigan"
    voc_dir.mkdir(parents=True)
    torch.save({"model": _build_ref_hifigan_state()}, voc_dir / "model_file.pth")
    (voc_dir / "config.json").write_text(json.dumps(HIFIGAN_CONFIG))

    models_json = {
        "tts_models": {
            "en": {
                "test": {
                    "vits": {
                        "github_rls_url": "https://invalid.example/never-fetched.zip",
                        "default_vocoder": "vocoder_models/en/test/hifigan",
                    }
                }
            }
        },
        "vocoder_models": {
            "en": {
                "test": {
                    "hifigan": {
                        "github_rls_url": "https://invalid.example/never-fetched.zip",
                        "default_vocoder": None,
                    }
                }
            }
        },
    }
    models_file = home / "models.json"
    models_file.write_text(json.dumps(models_json))
    return {"home": str(home), "models_file": str(models_file)}


def test_zoo_download_convert_synthesize_api(zoo_home, monkeypatch):
    """TTS(model_name=…): torch ckpt converted on first use, tts() speaks."""
    monkeypatch.setenv("TTS_HOME", zoo_home["home"])
    monkeypatch.setenv("TTS_TPU_MODELS_FILE", zoo_home["models_file"])
    from tts_tpu.api import TTS

    tts = TTS(model_name="tts_models/en/test/vits")
    wav = np.asarray(tts.tts("Hello world."))
    assert wav.ndim == 1 and len(wav) > 1000
    assert np.max(np.abs(wav)) > 1e-4  # non-silent
    assert np.all(np.isfinite(wav))
    # conversion cached beside the torch original
    vits_dir = os.path.join(zoo_home["home"], "tts_tpu", "tts_models--en--test--vits")
    assert os.path.isfile(os.path.join(vits_dir, "model_file_flax.msgpack"))


def test_zoo_vocoder_bridge_used(zoo_home, monkeypatch):
    """The default vocoder is loaded generically (not hardcoded HiFiGAN class
    name match) and the converted msgpack exists."""
    monkeypatch.setenv("TTS_HOME", zoo_home["home"])
    monkeypatch.setenv("TTS_TPU_MODELS_FILE", zoo_home["models_file"])
    from tts_tpu.api import TTS

    tts = TTS(model_name="tts_models/en/test/vits")
    # VITS is end-to-end so the vocoder isn't used for it, but it must load
    voc_dir = os.path.join(zoo_home["home"], "tts_tpu", "vocoder_models--en--test--hifigan")
    assert os.path.isfile(os.path.join(voc_dir, "model_file_flax.msgpack"))
    assert tts.synthesizer.vocoder_model is not None
    assert tts.synthesizer.vocoder_config.generator_model == "hifigan_generator"


def test_zoo_cli(zoo_home, tmp_path):
    """`tts --model_name … --text …` writes a non-silent wav (reference
    synthesize.py:144 most-used path)."""
    env = dict(os.environ)
    env.update(
        TTS_HOME=zoo_home["home"],
        TTS_TPU_MODELS_FILE=zoo_home["models_file"],
        JAX_PLATFORMS="cpu",
        PYTHONPATH=REPO,
    )
    out = tmp_path / "out.wav"
    proc = subprocess.run(
        [sys.executable, "-m", "tts_tpu.bin.synthesize",
         "--model_name", "tts_models/en/test/vits",
         "--text", "The quick brown fox.", "--out_path", str(out)],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert out.is_file() and out.stat().st_size > 4000
