"""Trainer callback events, KeyboardInterrupt checkpointing, and
experiment-folder stamping (reference ``TTS/utils/callbacks.py``,
``trainer`` pkg graceful-stop + ``get_experiment_folder_path``)."""

import json
import os
import re

import pytest

FIXTURE = "/root/reference/tests/data/ljspeech"


def test_callback_dispatch_order_and_model_hooks():
    from tts_tpu.trainer.callbacks import TrainerCallback

    calls = []

    class FakeModel:
        def on_epoch_end(self, trainer):
            calls.append("model.on_epoch_end")

        def on_epoch_start(self, trainer):  # must NOT be fired by dispatch
            calls.append("model.on_epoch_start")

    class FakeTrainer:
        model = FakeModel()

    cb = TrainerCallback(
        {
            "on_epoch_end": [lambda t: calls.append("user1"), lambda t: calls.append("user2")],
            "on_epoch_start": lambda t: calls.append("user_start"),
        }
    )
    t = FakeTrainer()
    cb.on_epoch_end(t)
    assert calls == ["model.on_epoch_end", "user1", "user2"]
    calls.clear()
    # trainer drives the model's on_epoch_start itself (re-jit contract);
    # dispatch only runs user hooks for that event
    cb.on_epoch_start(t)
    assert calls == ["user_start"]
    # events with nothing registered are no-ops
    cb.on_train_step_start(t)


def test_callback_unknown_event_rejected():
    from tts_tpu.trainer.callbacks import TrainerCallback

    with pytest.raises(ValueError, match="Unknown trainer callback"):
        TrainerCallback({"on_banana": lambda t: None})


def test_experiment_folder_path_stamp(tmp_path):
    from tts_tpu.utils.generic import get_commit_hash, get_experiment_folder_path

    h = get_commit_hash()
    assert re.fullmatch(r"[0-9a-f]{7,}", h)
    p = get_experiment_folder_path(str(tmp_path), "myrun")
    assert os.path.dirname(p) == str(tmp_path)
    base = os.path.basename(p)
    assert base.startswith("myrun-") and base.endswith(f"-{h}")


@pytest.mark.slow
@pytest.mark.skipif(not os.path.isdir(FIXTURE), reason="fixture missing")
def test_keyboard_interrupt_saves_checkpoint(tmp_path):
    """Ctrl-C mid-epoch → full-state checkpoint lands on disk and fit()
    returns instead of propagating."""
    from helpers import write_glow_smoke_config as _write_config

    from tts_tpu.config import load_config
    from tts_tpu.data import load_tts_samples
    from tts_tpu.models import setup_model
    from tts_tpu.trainer.trainer import Trainer, TrainerArgs

    config_path = _write_config(tmp_path)
    config = load_config(config_path)
    train_samples, eval_samples = load_tts_samples(
        [d.to_dict() for d in config.datasets],
        eval_split=True,
        eval_split_size=config.eval_split_size,
    )
    model = setup_model(config)
    seen = []

    def boom(trainer):
        seen.append(trainer.global_step)
        if trainer.global_step >= 1:
            raise KeyboardInterrupt

    run_dir = str(tmp_path / "run")
    trainer = Trainer(
        TrainerArgs(), config, run_dir, model, train_samples, eval_samples,
        callbacks={"on_train_step_end": boom, "on_keyboard_interrupt": lambda t: seen.append("intr")},
    )
    state = trainer.fit()
    assert state is not None
    assert "intr" in seen
    ckpts = [f for f in os.listdir(run_dir) if f.endswith("_interrupted.msgpack")]
    assert ckpts, os.listdir(run_dir)
