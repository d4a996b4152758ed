"""Train-smoke tests across the trainable model families — the reference's
backbone pattern (``tests/tts_tests/test_vits_train.py:15-72`` et al.):
tiny config → train one epoch on a mini fixture → checkpoint exists →
resume from ``--continue_path``.  CLI synthesis is covered by
``test_train_smoke.py`` (GlowTTS); these cover the *training* paths:
VITS (fused GAN step), HiFiGAN vocoder, ForwardTTS, Tacotron2, the speaker
encoder loop, and XTTS GPT fine-tuning through the real XTTSDataset.

All marked ``slow`` (each ≈1-2 min on CPU); run with ``TTS_RUN_SLOW=1``.
"""

import json
import os
import shutil

import numpy as np
import pytest

FIXTURE = "/root/reference/tests/data/ljspeech"

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.path.isdir(FIXTURE), reason="fixture missing"),
]


def _mini_fixture(tmp_path, n=8):
    """Tiny dataset dir: first n metadata rows + the fixture's wavs."""
    root = tmp_path / "data"
    root.mkdir()
    rows = open(os.path.join(FIXTURE, "metadata.csv")).read().splitlines()[:n]
    (root / "metadata.csv").write_text("\n".join(rows) + "\n")
    os.symlink(os.path.join(FIXTURE, "wavs"), root / "wavs")
    return str(root)


def _dataset_cfg(path):
    return [
        {
            "formatter": "ljspeech",
            "dataset_name": "ljspeech",
            "path": path,
            "meta_file_train": "metadata.csv",
            "meta_file_val": "",
            "language": "en",
        }
    ]


def _run_tts_train(tmp_path, config: dict, n_samples=8):
    from tts_tpu.bin.train_tts import main as train_main

    config = dict(config)
    config.setdefault("batch_size", 2)
    config.setdefault("eval_batch_size", 2)
    config.setdefault("epochs", 1)
    config.setdefault("print_step", 1)
    config.setdefault("save_step", 2)
    config.setdefault("run_eval", True)
    config.setdefault("eval_split_size", 0.25)
    config.setdefault("text_cleaner", "english_cleaners")
    config.setdefault("use_phonemes", False)
    config["datasets"] = _dataset_cfg(_mini_fixture(tmp_path, n_samples))
    run_dir = str(tmp_path / "run")
    config["output_path"] = run_dir
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(json.dumps(config))

    train_main(["--config_path", str(cfg_path), "--output_path", run_dir])
    files = os.listdir(run_dir)
    assert "best_model.msgpack" in files, files
    assert any(f.startswith("checkpoint_") for f in files), files
    # resume one more epoch from the run dir (reference --continue_path)
    train_main(["--config_path", str(cfg_path), "--continue_path", run_dir])
    assert "best_model.msgpack" in os.listdir(run_dir)
    return run_dir


def test_vits_gan_train(tmp_path):
    """VITS end-to-end GAN training (fused one-backward step)."""
    _run_tts_train(
        tmp_path,
        {
            "model": "vits",
            "model_args": {
                "hidden_channels": 32,
                "hidden_channels_ffn_text_encoder": 64,
                "num_layers_text_encoder": 1,
                "num_layers_posterior_encoder": 2,
                "num_layers_flow": 2,
                "upsample_rates_decoder": [8, 8, 4],
                "upsample_kernel_sizes_decoder": [16, 16, 8],
                "upsample_initial_channel_decoder": 32,
                "resblock_kernel_sizes_decoder": [3],
                "resblock_dilation_sizes_decoder": [[1, 3]],
                "periods_multi_period_discriminator": [2, 3],
                "discriminator_width_mult": 0.125,
                "spec_segment_size": 8,
            },
            "max_audio_len": 3 * 22050,  # keep CPU step time bounded
        },
    )


def test_forward_tts_train(tmp_path):
    """ForwardTTS (fast_speech preset: aligner on, no pitch/energy)."""
    _run_tts_train(
        tmp_path,
        {
            "model": "fast_speech",
            "model_args": {
                "hidden_channels": 32,
                "encoder_params": {
                    "hidden_channels_ffn": 32, "num_heads": 2, "num_layers": 1,
                    "dropout_p": 0.1, "kernel_size_fft": 3,
                },
                "decoder_params": {
                    "hidden_channels_ffn": 32, "num_heads": 2, "num_layers": 1,
                    "dropout_p": 0.1, "kernel_size_fft": 3,
                },
                "use_pitch": False,
                "use_energy": False,
            },
            "max_audio_len": 3 * 22050,
        },
    )


def test_tacotron2_train(tmp_path):
    """Tacotron2 AR training (scan decoder, stopnet, attention)."""
    _run_tts_train(
        tmp_path,
        {
            "model": "tacotron2",
            "r": 4,
            "encoder_dim": 32,
            "decoder_dim": 32,
            "attention_dim": 32,
            "prenet_dim": 16,
            "postnet_dim": 32,
            "max_audio_len": 2 * 22050,
        },
    )


def test_hifigan_vocoder_train(tmp_path):
    """HiFiGAN GAN-vocoder training through bin/train_vocoder."""
    from tts_tpu.bin.train_vocoder import main as train_main

    config = {
        "model": "hifigan",
        "generator_model": "hifigan_generator",
        "discriminator_model": "hifigan_discriminator",
        "generator_model_params": {
            "upsample_factors": [8, 8, 4],
            "upsample_kernel_sizes": [16, 16, 8],
            "upsample_initial_channel": 32,
            "resblock_kernel_sizes": [3],
            "resblock_dilation_sizes": [[1, 3]],
        },
        "batch_size": 2,
        "eval_batch_size": 2,
        "epochs": 1,
        "print_step": 1,
        "save_step": 2,
        "run_eval": True,
        "seq_len": 2048,
        "eval_split_size": 2,
        "data_path": str(tmp_path / "wavs"),
        "output_path": str(tmp_path / "run"),
    }
    # 8 clips keep the GAN smoke inside a CPU budget (the full 128-wav
    # fixture made 63 steps/epoch x train+resume ~45 min on one core)
    (tmp_path / "wavs").mkdir()
    for name in sorted(os.listdir(os.path.join(FIXTURE, "wavs")))[:8]:
        os.symlink(os.path.join(FIXTURE, "wavs", name), tmp_path / "wavs" / name)
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(json.dumps(config))
    run_dir = str(tmp_path / "run")
    train_main(["--config_path", str(cfg_path), "--output_path", run_dir])
    files = os.listdir(run_dir)
    assert any(f.endswith(".msgpack") for f in files), files
    train_main(["--config_path", str(cfg_path), "--continue_path", run_dir])


def test_xtts_gpt_train_with_dataset(tmp_path):
    """XTTS GPT fine-tune through the real XTTSDataset on a corpus
    (replaces hand-built batches; reference xtts/trainer/dataset.py)."""
    from tts_tpu.data import load_tts_samples
    from tts_tpu.models.xtts import XttsArgs, XttsConfig
    from tts_tpu.models.xtts.trainer import GPTTrainer
    from tts_tpu.trainer.trainer import Trainer, TrainerArgs

    cfg = XttsConfig()
    cfg.model_args = XttsArgs(
        gpt_layers=1, gpt_n_model_channels=32, gpt_n_heads=2,
        gpt_number_text_tokens=40, gpt_num_audio_tokens=18,
        gpt_start_audio_token=16, gpt_stop_audio_token=17,
        gpt_start_text_token=38, gpt_stop_text_token=0,
        gpt_max_text_tokens=512, gpt_max_audio_tokens=1024,
        decoder_input_dim=32,
        min_conditioning_length=11025, max_conditioning_length=22050,
        max_wav_length=4 * 22050, max_text_length=400,
    )
    cfg.batch_size = 2
    cfg.eval_batch_size = 2
    cfg.epochs = 1
    cfg.print_step = 1
    cfg.save_step = 2
    cfg.run_eval = True
    cfg.eval_split_size = 0.25
    cfg.datasets = []

    samples, eval_samples = load_tts_samples(
        _dataset_cfg(_mini_fixture(tmp_path, 6)), eval_split=True, eval_split_size=0.34
    )
    trainer = Trainer(
        TrainerArgs(), cfg, str(tmp_path / "run"), GPTTrainer(cfg), samples, eval_samples
    )
    trainer.fit()
    files = os.listdir(str(tmp_path / "run"))
    assert "best_model.msgpack" in files, files


def _two_speaker_dataset_cfg(tmp_path):
    """Coqui-format split of the fixture into two pseudo-speakers (the
    class-balanced sampler needs >=2 classes; LJSpeech has one)."""
    root = tmp_path / "data2spk"
    root.mkdir()
    os.symlink(os.path.join(FIXTURE, "wavs"), root / "wavs")
    rows = open(os.path.join(FIXTURE, "metadata.csv")).read().splitlines()[:8]
    lines = ["audio_file|text|speaker_name"]
    for i, row in enumerate(rows):
        name, text = row.split("|")[0], row.split("|")[1]
        lines.append(f"wavs/{name}.wav|{text}|spk_{i % 2}")
    (root / "metadata.csv").write_text("\n".join(lines) + "\n")
    return [{
        "formatter": "coqui",
        "dataset_name": "twospk",
        "path": str(root),
        "meta_file_train": "metadata.csv",
        "meta_file_val": "",
        "language": "en",
    }]


def test_speaker_encoder_train(tmp_path):
    """Speaker-encoder bespoke loop (GE2E) on the fixture speakers."""
    from tts_tpu.bin.train_encoder import main as train_main

    config = {
        "model": "lstm",
        "run_name": "enc",
        "audio": {"sample_rate": 22050, "num_mels": 40},
        "model_params": {
            "input_dim": 40, "proj_dim": 16, "lstm_dim": 32,
            "num_lstm_layers": 1, "use_lstm_with_projection": True,
        },
        "num_classes_in_batch": 2,
        "num_utter_per_class": 2,
        "voice_len": 1.0,
        "loss": "ge2e",
        "lr": 1e-4,
        "datasets": _two_speaker_dataset_cfg(tmp_path),
    }
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(json.dumps(config))
    run_dir = str(tmp_path / "run_enc")
    train_main([
        "--config_path", str(cfg_path), "--output_path", run_dir, "--max_steps", "2",
    ])
    assert any(f.endswith(".msgpack") for f in os.listdir(run_dir))
