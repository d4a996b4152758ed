"""Backend-availability probing.

The sandboxed TPU tunnel (axon) can WEDGE device initialization — it hangs
rather than raising — so the only safe probe is a subprocess with a kill
timeout. Shared by ``bench.py`` and ``__graft_entry__.py``.
"""

from __future__ import annotations


def default_backend_alive(timeout_s: float = 180.0) -> bool:
    """True iff the default (possibly tunneled-TPU) backend initializes and
    answers ``jax.devices()`` within ``timeout_s``."""
    import subprocess
    import sys

    try:
        proc = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s,
            capture_output=True,
        )
        return proc.returncode == 0
    except subprocess.TimeoutExpired:
        return False
