"""Dashboard logger factory (reference trainer ``logger_factory``:
tensorboard | wandb | clearml | aim, console fallback)."""

import numpy as np


class _Cfg:
    def __init__(self, name):
        self.dashboard_logger = name
        self.project_name = "p"
        self.run_name = "r"


def test_tensorboard_logger_roundtrip(tmp_path):
    from tts_tpu.trainer.logging import TensorBoardLogger, logger_factory

    lg = logger_factory(_Cfg("tensorboard"), str(tmp_path))
    assert isinstance(lg, TensorBoardLogger)
    lg.add_scalars("train", {"loss": 1.5, "bad": "nope"}, 1)
    lg.add_audios("test", {"a": np.random.randn(400) * 2.0, "b": None}, 1, 16000)
    lg.flush()
    lg.close()
    import os

    assert os.listdir(tmp_path / "logs")  # event file written


def test_optional_dashboards_degrade_to_console(tmp_path, capsys):
    """wandb/clearml/aim are not installed here: each must warn + fall back,
    never raise (the gated-optional-dependency contract)."""
    from tts_tpu.trainer.logging import ConsoleLogger, logger_factory

    for name in ("wandb", "clearml", "aim"):
        lg = logger_factory(_Cfg(name), str(tmp_path))
        assert isinstance(lg, ConsoleLogger), name
        assert name in capsys.readouterr().out

    lg = logger_factory(_Cfg("mystery"), str(tmp_path))
    assert isinstance(lg, ConsoleLogger)
    lg = logger_factory(_Cfg("console"), str(tmp_path))
    assert isinstance(lg, ConsoleLogger)
