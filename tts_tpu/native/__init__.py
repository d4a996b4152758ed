"""Native (C++) host kernels, loaded via ctypes.

``maximum_path_native``: OpenMP-parallel MAS Viterbi — same contract as the
reference's Cython ``maximum_path_c`` (``core.pyx:42``).  Built lazily with
``make`` on first use; falls back to the numpy implementation if no
compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libmas.so")
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _HERE], check=True, capture_output=True)
        except Exception:
            _build_failed = True
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        _build_failed = True
        return None
    lib.maximum_path_c.argtypes = [
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_float,
    ]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def maximum_path_native(value: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Host MAS via the C++ kernel; same contract as
    ``tts_tpu.ops.maximum_path_numpy``."""
    lib = _load()
    if lib is None:
        from tts_tpu.ops.mas import maximum_path_numpy

        return maximum_path_numpy(value, mask)
    value = np.ascontiguousarray(np.asarray(value, np.float32) * mask)
    mask = np.asarray(mask)
    B, T_x, T_y = value.shape
    paths = np.zeros((B, T_x, T_y), np.int32)
    t_xs = np.ascontiguousarray(mask[:, :, 0].sum(1).astype(np.int32))
    t_ys = np.ascontiguousarray(mask[:, 0, :].sum(1).astype(np.int32))
    lib.maximum_path_c(
        paths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        value.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        t_xs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        t_ys.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        B,
        T_x,
        T_y,
        np.float32(-1e9),
    )
    return paths.astype(np.float32) * mask
