"""ctypes binding for the native C++ 3-NN kernel (native/simple_knn.cpp).

The reference ships simple-knn as a CUDA/C++ extension (distCUDA2,
submodules/simple-knn/spatial.cu:15-26); here the host-side equivalent is a
Morton-sorted box-pruned C++ implementation compiled once per machine into
native/libsimple_knn.so. Falls back to None when no compiler is available —
callers then use the scipy path in gssr_tpu.ops.knn.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libsimple_knn.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO_PATH):
            try:
                subprocess.run(["make", "-C", _NATIVE_DIR],
                               check=True, capture_output=True, timeout=120)
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
            lib.mean_knn_dist2.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float)]
            lib.mean_knn_dist2.restype = None
            _lib = lib
        except OSError:
            _lib = None
        return _lib


def mean_knn_dist2_native(points: np.ndarray):
    """[N,3] -> [N] float32 mean squared 3-NN distance, or None if the
    native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, dtype=np.float32)
    n = pts.shape[0]
    out = np.empty(n, dtype=np.float32)
    lib.mean_knn_dist2(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(n),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out
