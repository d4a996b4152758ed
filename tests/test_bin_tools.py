"""End-to-end smoke tests for the aux CLI tools in ``tts_tpu/bin`` that had
no dedicated coverage (reference exercises these only ad hoc:
``TTS/bin/compute_statistics.py``, ``find_unique_chars.py``,
``find_unique_phonemes.py``, ``collect_env_info.py``,
``remove_silence_using_vad.py``, ``compute_embeddings.py``,
``eval_encoder.py``, ``compute_attention_masks.py``,
``extract_tts_spectrograms.py``, ``tune_wavegrad.py``).

Each test drives the tool through its argv surface (monkeypatched
``sys.argv`` + ``main()``), on a generated 3-clip miniature dataset."""

import json
import sys
import warnings

import jax
import numpy as np
import pytest

from helpers import fast_params

SR = 22050


@pytest.fixture(scope="module")
def mini_dataset(tmp_path_factory):
    """LJSpeech-layout dataset: wavs/ + metadata.csv, 3 clips of 0.6 s with
    a tone burst between silent lead/tail (so VAD has something to find)."""
    from tts_tpu.audio.numpy_transforms import save_wav

    root = tmp_path_factory.mktemp("mini_ljspeech")
    (root / "wavs").mkdir()
    rows = []
    rng = np.random.RandomState(0)
    for i, text in enumerate(["hello world", "testing speech", "one two three"]):
        n = int(0.6 * SR)
        wav = np.zeros(n, np.float32)
        t = np.arange(int(0.3 * SR)) / SR
        tone = 0.3 * np.sin(2 * np.pi * (180 + 60 * i) * t)
        tone = tone * (1 + 0.3 * rng.randn(tone.size)).astype(np.float32)
        start = int(0.15 * SR)
        wav[start : start + tone.size] = tone
        name = f"clip{i}"
        save_wav(wav=wav, path=str(root / "wavs" / f"{name}.wav"), sample_rate=SR)
        rows.append(f"{name}|{text}|{text}")
    (root / "metadata.csv").write_text("\n".join(rows))
    return root


@pytest.fixture(scope="module")
def dataset_config(mini_dataset, tmp_path_factory):
    """A loadable training config pointing at the miniature dataset."""
    cfg = {
        "model": "glow_tts",
        "text_cleaner": "english_cleaners",
        "use_phonemes": False,
        "audio": {
            "fft_size": 256, "win_length": 256, "hop_length": 64,
            "num_mels": 20, "sample_rate": SR,
        },
        "datasets": [{
            "formatter": "ljspeech",
            "dataset_name": "mini",
            "path": str(mini_dataset),
            "meta_file_train": "metadata.csv",
            "meta_file_val": "",
            "language": "en",
        }],
    }
    path = tmp_path_factory.mktemp("cfg") / "config.json"
    path.write_text(json.dumps(cfg))
    return str(path)


def _run(main_fn, argv, monkeypatch):
    monkeypatch.setattr(sys, "argv", ["tool"] + argv)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        main_fn()


def test_collect_env_info(capsys):
    from tts_tpu.bin.collect_env_info import main

    main()
    info = json.loads(capsys.readouterr().out)
    assert info["tts_tpu"] and info["jax"] and info["devices"]


def test_find_unique_chars(dataset_config, monkeypatch, capsys):
    from tts_tpu.bin.find_unique_chars import main

    _run(main, ["--config_path", dataset_config], monkeypatch)
    out = capsys.readouterr().out
    assert "Number of unique characters:" in out
    assert "h" in out  # from "hello"


def test_find_unique_phonemes(dataset_config, monkeypatch, capsys):
    from tts_tpu.bin.find_unique_phonemes import main

    _run(main, ["--config_path", dataset_config], monkeypatch)
    out = capsys.readouterr().out
    assert "Number of unique phonemes:" in out


def test_compute_statistics(dataset_config, mini_dataset, tmp_path, monkeypatch):
    from tts_tpu.bin.compute_statistics import main

    out_path = tmp_path / "stats.npy"
    _run(main, ["--config_path", dataset_config, "--out_path", str(out_path),
                "--data_path", str(mini_dataset)], monkeypatch)
    stats = np.load(out_path, allow_pickle=True).item()
    for key in ("mel_mean", "mel_std", "linear_mean", "linear_std"):
        assert np.isfinite(stats[key]).all(), key
    assert stats["mel_mean"].shape == (20,)
    assert stats["linear_mean"].shape == (256 // 2 + 1,)
    assert (stats["mel_std"] >= 0).all()
    assert stats["audio_config"]["sample_rate"] == SR


def test_remove_silence_using_vad(mini_dataset, tmp_path, monkeypatch):
    from tts_tpu.audio.numpy_transforms import load_wav
    from tts_tpu.bin.remove_silence_using_vad import main

    out_dir = tmp_path / "trimmed"
    _run(main, ["--input_dir", str(mini_dataset / "wavs"),
                "--output_dir", str(out_dir), "--sample_rate", str(SR)], monkeypatch)
    for i in range(3):
        orig = load_wav(filename=str(mini_dataset / "wavs" / f"clip{i}.wav"), sample_rate=SR)
        trimmed = load_wav(filename=str(out_dir / f"clip{i}.wav"), sample_rate=SR)
        assert 0 < trimmed.size <= orig.size


@pytest.fixture(scope="module")
def tiny_encoder_ckpt(tmp_path_factory):
    """Fast-initialized LSTM speaker encoder checkpoint + config file."""
    from tts_tpu.encoder.configs import SpeakerEncoderConfig
    from tts_tpu.encoder.model import SpeakerEncoder
    from tts_tpu.utils.io import save_checkpoint

    cfg = SpeakerEncoderConfig()
    cfg.model_params = {"model_name": "lstm", "input_dim": 20, "proj_dim": 16,
                        "lstm_dim": 32, "num_lstm_layers": 1}
    cfg.audio.fft_size = 256
    cfg.audio.win_length = 256
    cfg.audio.hop_length = 64
    cfg.audio.num_mels = 20
    cfg.audio.sample_rate = SR
    enc = SpeakerEncoder(cfg)
    params = fast_params(enc.init_params, jax.random.PRNGKey(0))
    d = tmp_path_factory.mktemp("enc")
    ckpt = d / "encoder.msgpack"
    save_checkpoint(str(ckpt), params, config=cfg)
    cfg_path = d / "enc_config.json"
    cfg_path.write_text(json.dumps(cfg.to_dict(), default=str))
    return str(ckpt), str(cfg_path)


def test_compute_embeddings(tiny_encoder_ckpt, mini_dataset, tmp_path, monkeypatch):
    from tts_tpu.bin.compute_embeddings import main

    ckpt, cfg_path = tiny_encoder_ckpt
    out = tmp_path / "speakers.json"
    _run(main, ["--model_path", ckpt, "--config_path", cfg_path,
                "--output_path", str(out), "--formatter_name", "ljspeech",
                "--dataset_name", "mini", "--dataset_path", str(mini_dataset),
                "--meta_file_train", "metadata.csv"], monkeypatch)
    embeddings = json.loads(out.read_text())
    assert len(embeddings) == 3
    for item in embeddings.values():
        assert item["name"] == "ljspeech"
        vec = np.asarray(item["embedding"], np.float32)
        assert vec.shape == (16,) and np.isfinite(vec).all()


def test_eval_encoder(tiny_encoder_ckpt, dataset_config, monkeypatch, capsys):
    from tts_tpu.bin.eval_encoder import main

    ckpt, cfg_path = tiny_encoder_ckpt
    _run(main, ["--model_path", ckpt, "--config_path", cfg_path,
                "--config_dataset_path", dataset_config, "--no-eval"], monkeypatch)
    out = capsys.readouterr().out
    # single-speaker fixture → nearest-centroid accuracy is trivially 1.0
    assert "Average class accuracy: 1.000" in out


@pytest.fixture(scope="module")
def tiny_tacotron_ckpt(mini_dataset, tmp_path_factory):
    """Minimal trainable-shape Tacotron2 checkpoint + config for the
    teacher-forced extraction tools."""
    from tts_tpu.models.tacotron2 import Tacotron2, Tacotron2Config
    from tts_tpu.utils.io import save_checkpoint, save_config

    cfg = Tacotron2Config(
        r=2,
        out_channels=20,
        encoder_in_features=32,
        decoder_in_features=32,
        embedding_dim=32,
        query_dim=32,
        decoder_rnn_dim=32,
        prenet_dim=16,
        attn_dim=16,
        max_decoder_steps=20,
    )
    cfg.text_cleaner = "english_cleaners"
    cfg.use_phonemes = False
    cfg.audio.fft_size = 256
    cfg.audio.win_length = 256
    cfg.audio.hop_length = 64
    cfg.audio.num_mels = 20
    cfg.audio.sample_rate = SR
    cfg.datasets = [{
        "formatter": "ljspeech", "dataset_name": "mini", "path": str(mini_dataset),
        "meta_file_train": "metadata.csv", "meta_file_val": "", "language": "en",
    }]
    from tts_tpu.models import setup_model

    model = setup_model(cfg)
    params = fast_params(model.init_params, jax.random.PRNGKey(0))
    d = tmp_path_factory.mktemp("taco")
    ckpt = d / "model.msgpack"
    save_checkpoint(str(ckpt), {"model": params}, config=model.config)
    cfg_path = d / "config.json"
    save_config(model.config, str(cfg_path))
    return str(ckpt), str(cfg_path)


def test_compute_attention_masks(tiny_tacotron_ckpt, mini_dataset, tmp_path, monkeypatch, capsys):
    from tts_tpu.bin.compute_attention_masks import main

    ckpt, cfg_path = tiny_tacotron_ckpt
    out_dir = tmp_path / "attn"
    _run(main, ["--model_path", ckpt, "--config_path", cfg_path,
                "--dataset", "ljspeech", "--dataset_metafile", "metadata.csv",
                "--data_path", str(mini_dataset), "--output_path", str(out_dir),
                "--batch_size", "3"], monkeypatch)
    assert "Wrote 3 attention masks." in capsys.readouterr().out
    for i in range(3):
        align = np.load(out_dir / f"clip{i}.npy")
        t_de, t_en = align.shape
        assert t_de > 0 and t_en > 0
        assert np.isfinite(align).all()
        # attention rows are softmax distributions over encoder steps
        np.testing.assert_allclose(align.sum(-1), 1.0, atol=1e-3)


def test_extract_tts_spectrograms(tiny_tacotron_ckpt, tmp_path, monkeypatch, capsys):
    from tts_tpu.bin.extract_tts_spectrograms import main

    ckpt, cfg_path = tiny_tacotron_ckpt
    out_dir = tmp_path / "specs"
    _run(main, ["--config_path", cfg_path, "--checkpoint_path", ckpt,
                "--output_path", str(out_dir)], monkeypatch)
    assert "Extracted 3 spectrograms" in capsys.readouterr().out
    meta = (out_dir / "metadata.txt").read_text().strip().split("\n")
    assert len(meta) == 3
    for line in meta:
        _, mel_path = line.split("|")
        mel = np.load(mel_path)
        assert mel.ndim == 2 and mel.shape[1] == 20
        assert np.isfinite(mel).all()


def test_tune_wavegrad(mini_dataset, tmp_path, monkeypatch, capsys):
    from tts_tpu.utils.io import save_checkpoint
    from tts_tpu.vocoder.configs import WavegradConfig
    from tts_tpu.vocoder.models import setup_model as setup_vocoder

    cfg = WavegradConfig(
        data_path=str(mini_dataset / "wavs"),
        seq_len=256,
        eval_split_size=1,
        model_params={
            "in_channels": 20,
            "y_conv_channels": 8, "x_conv_channels": 16,
            "dblock_out_channels": (8, 8, 16, 16),
            "ublock_out_channels": (16, 16, 8, 8, 8),
            "upsample_factors": (2, 2, 2, 2, 2),
            "upsample_dilations": ((1, 2, 1, 2),) * 5,
            "use_weight_norm": True,
        },
        test_noise_schedule={"min_val": 1e-6, "max_val": 1e-2, "num_steps": 3},
    )
    cfg.audio.fft_size = 256
    cfg.audio.win_length = 256
    cfg.audio.hop_length = 32
    cfg.audio.num_mels = 20
    cfg.audio.sample_rate = SR
    model = setup_vocoder(cfg)
    params = fast_params(model.init_params, jax.random.PRNGKey(0))
    ckpt = tmp_path / "wavegrad.msgpack"
    save_checkpoint(str(ckpt), {"model": params}, config=cfg)
    cfg_path = tmp_path / "wavegrad_config.json"
    cfg_path.write_text(json.dumps(cfg.to_dict(), default=str))

    from tts_tpu.bin.tune_wavegrad import main

    _run(main, ["--config_path", str(cfg_path), "--checkpoint_path", str(ckpt),
                "--num_iter", "3", "--search_depth", "1"], monkeypatch)
    assert "Best schedule:" in capsys.readouterr().out
