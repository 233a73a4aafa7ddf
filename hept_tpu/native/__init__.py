"""ctypes bindings for the native host-side kernels (lazy g++ build).

First import compiles `hept_native.cpp` into the package directory (cached by
source mtime); environments without a toolchain fall back to the pure-Python
implementations at the call sites (`native_available()` gates usage).
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)

_HERE = Path(__file__).parent
_SRC = _HERE / "hept_native.cpp"
_LIB = _HERE / "libhept_native.so"
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
             "-o", str(_LIB), str(_SRC)],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception as e:  # pragma: no cover
        logger.warning("native build failed (%s); using Python fallbacks", e)
        return False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
        if not _build():
            return None
    lib = ctypes.CDLL(str(_LIB))
    lib.radius_pairs.restype = ctypes.c_int64
    lib.radius_pairs.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64, ctypes.c_float, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
    ]
    lib.pack_dense.restype = None
    lib.pack_dense.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_bool),
    ]
    lib.knn_small.restype = None
    lib.knn_small.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int32, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32),
    ]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _i32ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def radius_pairs(eta: np.ndarray, phi: np.ndarray, radius: float, max_k: int):
    """(2, E) int32 neighbour pairs within `radius`, up to max_k per point."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    eta = np.ascontiguousarray(eta, np.float32)
    phi = np.ascontiguousarray(phi, np.float32)
    n = len(eta)
    cap = max(n * max_k, 1)
    for _ in range(3):
        src = np.empty(cap, np.int32)
        dst = np.empty(cap, np.int32)
        count = lib.radius_pairs(
            _fptr(eta), _fptr(phi), n, radius, max_k,
            _i32ptr(src), _i32ptr(dst), cap,
        )
        if count >= 0:
            return np.stack([src[:count], dst[:count]])
        cap *= 4
    raise RuntimeError("radius_pairs capacity exceeded")


def pack_dense(events_x: list[np.ndarray], n_max: int):
    """Pack ragged per-event feature arrays into (B, n_max, F) + valid mask."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    b = len(events_x)
    f = events_x[0].shape[1]
    xs = np.ascontiguousarray(np.concatenate(events_x, axis=0), np.float32)
    sizes = np.asarray([e.shape[0] for e in events_x], np.int64)
    out = np.zeros((b, n_max, f), np.float32)
    valid = np.zeros((b, n_max), bool)
    lib.pack_dense(
        _fptr(xs), sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        b, n_max, f, _fptr(out),
        valid.ctypes.data_as(ctypes.POINTER(ctypes.c_bool)),
    )
    return out, valid


def knn_small(x: np.ndarray, k: int):
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    x = np.ascontiguousarray(x, np.float32)
    n, d = x.shape
    out_d = np.empty((n, k), np.float32)
    out_i = np.empty((n, k), np.int32)
    lib.knn_small(_fptr(x), n, d, k, _fptr(out_d), _i32ptr(out_i))
    return out_d, out_i
