"""ctypes loader for the native host-runtime kernels (C++).

Compiles ``native/select_frames.cpp`` with g++ on first use (cached next to
the source, rebuilt when the source is newer).  Callers catch any exception
and fall back to the pure-Python implementation, so a missing toolchain
degrades gracefully.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "native", "select_frames.cpp")
_SO = os.path.join(_HERE, "native", "_libprobav_host.so")
_lock = threading.Lock()
_lib = None


def _build() -> None:
    subprocess.run(
        ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO],
        check=True, capture_output=True)


def _load() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_SO)
        lib.probav_select_frames.restype = ctypes.c_int
        lib.probav_select_frames.argtypes = [
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_double,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64),
        ]
        _lib = lib
        return lib


def select_frames(occ_counts: np.ndarray, k: int, clarity_threshold: float,
                  hw: int):
    """Native stage-4 frame selection; see qc.select_frame_indices."""
    lib = _load()
    occ = np.ascontiguousarray(occ_counts, dtype=np.int64)
    s, p, t = occ.shape
    out = np.empty((s, p, k), dtype=np.int32)
    stats = np.zeros(2, dtype=np.int64)
    rc = lib.probav_select_frames(
        occ.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        s, p, t, k, (1.0 - clarity_threshold) * hw,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        stats.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    if rc != 0:
        raise RuntimeError(f"probav_select_frames failed with rc={rc}")
    return out, int(stats[0]), int(stats[1])
