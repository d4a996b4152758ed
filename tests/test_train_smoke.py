"""Train-smoke integration test — the reference's backbone test pattern
(tests/tts_tests/test_vits_train.py): tiny config → train 1 epoch on the
fixture → synthesize from the checkpoint via the CLI → resume training.
"""

import json
import os
import sys

import numpy as np
import pytest

from helpers import GLOW_SMOKE_FIXTURE as FIXTURE  # noqa: E402
from helpers import write_glow_smoke_config as _write_config  # noqa: E402


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
