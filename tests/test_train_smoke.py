"""Train-smoke integration test — the reference's backbone test pattern
(tests/tts_tests/test_vits_train.py): tiny config → train 1 epoch on the
fixture → synthesize from the checkpoint via the CLI → resume training.
"""

import json
import os
import sys

import numpy as np
import pytest

FIXTURE = "/root/reference/tests/data/ljspeech"


def _write_config(tmp_path):
    config = {
        "model": "glow_tts",
        "batch_size": 4,
        "eval_batch_size": 4,
        "epochs": 1,
        "print_step": 1,
        "save_step": 2,
        "run_eval": True,
        "eval_split_size": 0.25,
        "num_flow_blocks_dec": 2,
        "num_block_layers": 1,
        "hidden_channels_enc": 32,
        "hidden_channels_dec": 32,
        "hidden_channels_dp": 16,
        "encoder_params": {
            "kernel_size": 3,
            "dropout_p": 0.1,
            "num_layers": 1,
            "num_heads": 2,
            "hidden_channels_ffn": 32,
        },
        "data_dep_init_steps": 0,
        # one padded shape for the whole fixture → the train step compiles once
        "max_audio_len": int(2.5 * 22050),
        "pad_to_multiple_text": 192,
        "pad_to_multiple_mel": 256,
        "text_cleaner": "english_cleaners",
        "use_phonemes": False,
        "output_path": str(tmp_path / "run"),
        "datasets": [
            {
                "formatter": "ljspeech",
                "dataset_name": "ljspeech",
                "path": FIXTURE,
                "meta_file_train": "metadata.csv",
                "meta_file_val": "",
                "language": "en",
            }
        ],
    }
    config_path = tmp_path / "config.json"
    config_path.write_text(json.dumps(config))
    return str(config_path)


@pytest.mark.skipif(not os.path.isdir(FIXTURE), reason="fixture missing")
def test_train_synthesize_resume(tmp_path):
    from tts_tpu.bin.train_tts import main as train_main

    config_path = _write_config(tmp_path)
    run_dir = str(tmp_path / "run")

    # 1. train one epoch
    train_main(["--config_path", config_path, "--output_path", run_dir])
    files = os.listdir(run_dir)
    assert "config.json" in files
    assert "best_model.msgpack" in files
    ckpts = [f for f in files if f.startswith("checkpoint_")]
    assert len(ckpts) >= 1

    # 2. synthesize from the produced checkpoint through the CLI
    out_wav = str(tmp_path / "out.wav")
    from tts_tpu.bin import synthesize

    argv_backup = sys.argv
    sys.argv = [
        "tts",
        "--text", "Hello there.",
        "--model_path", os.path.join(run_dir, "best_model.msgpack"),
        "--out_path", out_wav,
    ]
    try:
        synthesize.main()
    finally:
        sys.argv = argv_backup
    assert os.path.isfile(out_wav)
    import scipy.io.wavfile

    sr, wav = scipy.io.wavfile.read(out_wav)
    assert sr == 22050
    assert len(wav) > 1000
    assert np.abs(wav).max() > 0

    # 3. resume from --continue_path for one more epoch
    train_main(["--config_path", config_path, "--continue_path", run_dir])
    files2 = os.listdir(run_dir)
    assert "best_model.msgpack" in files2
