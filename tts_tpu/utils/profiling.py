"""Profiling hooks (SURVEY §5: the reference has none beyond RTF prints;
this is a superset using ``jax.profiler``)."""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a TensorBoard-viewable device trace around a block.

    Example:
        with profiling.trace("/tmp/jax-trace"):
            state, _ = train_step(state, batch, rng)
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region inside a captured trace."""
    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer:
    """Wall-clock step timing with sync; robust to backends where
    ``block_until_ready`` is a no-op (forces a tiny host transfer)."""

    def __init__(self):
        self.times: Dict[str, list] = {}

    @contextlib.contextmanager
    def measure(self, name: str, sync_output=None):
        t0 = time.time()
        yield
        if sync_output is not None:
            import numpy as np

            leaf = jax.tree.leaves(sync_output)[0]
            _ = np.asarray(leaf.ravel()[0])
        self.times.setdefault(name, []).append(time.time() - t0)

    def summary(self) -> Dict[str, float]:
        return {k: sum(v) / len(v) for k, v in self.times.items() if v}


def memory_stats() -> Optional[Dict]:
    """Per-device memory stats where the backend exposes them."""
    try:
        dev = jax.devices()[0]
        return dev.memory_stats()
    except Exception:
        return None
