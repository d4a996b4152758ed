"""Dashboard + console loggers (replaces the reference trainer's
``logger_factory`` — ref ``encoder/utils/training.py:83`` — and the
``train_log``/``eval_log``/``test_log`` model hooks, ``vits.py:1350-1462``).

TensorBoard is the default dashboard (``config.dashboard_logger``); scalars,
matplotlib figures (alignments/spectrograms) and audio all land in the run
dir so curves and test sentences are visible live during training.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

__all__ = ["ConsoleLogger", "TensorBoardLogger", "logger_factory"]


class ConsoleLogger:
    """No-op dashboard: scalar prints are handled by the Trainer itself."""

    def add_scalars(self, scope: str, scalars: Dict[str, float], step: int):
        pass

    def add_figures(self, scope: str, figures: Dict, step: int):
        pass

    def add_audios(self, scope: str, audios: Dict[str, np.ndarray], step: int, sample_rate: int):
        pass

    def flush(self):
        pass

    def close(self):
        pass


class TensorBoardLogger(ConsoleLogger):
    """TensorBoard event writer (reference default dashboard)."""

    def __init__(self, log_dir: str):
        from torch.utils.tensorboard import SummaryWriter

        os.makedirs(log_dir, exist_ok=True)
        self.writer = SummaryWriter(log_dir=log_dir)

    def add_scalars(self, scope: str, scalars: Dict[str, float], step: int):
        for k, v in scalars.items():
            try:
                self.writer.add_scalar(f"{scope}/{k}", float(v), step)
            except (TypeError, ValueError):
                pass

    def add_figures(self, scope: str, figures: Dict, step: int):
        for k, fig in figures.items():
            if fig is None:
                continue
            self.writer.add_figure(f"{scope}/{k}", fig, step)
            import matplotlib.pyplot as plt

            plt.close(fig)

    def add_audios(self, scope: str, audios: Dict[str, np.ndarray], step: int, sample_rate: int):
        for k, wav in audios.items():
            if wav is None:
                continue
            wav = np.asarray(wav, np.float32).reshape(-1)
            peak = np.abs(wav).max()
            if peak > 1.0:
                wav = wav / peak
            self.writer.add_audio(f"{scope}/{k}", wav[None, :], step, sample_rate=sample_rate)

    def flush(self):
        self.writer.flush()

    def close(self):
        self.writer.close()


def logger_factory(config, output_path: str):
    """Build the dashboard logger named by ``config.dashboard_logger``."""
    name = (getattr(config, "dashboard_logger", "tensorboard") or "console").lower()
    if name == "tensorboard":
        try:
            return TensorBoardLogger(os.path.join(output_path, "logs"))
        except Exception as e:  # pragma: no cover - tensorboard missing
            print(f" [!] TensorBoard unavailable ({e}); falling back to console logging")
            return ConsoleLogger()
    if name in ("console", "", "none"):
        return ConsoleLogger()
    print(f" [!] Unknown dashboard_logger {name!r}; using console")
    return ConsoleLogger()
