"""ctypes bridge to the native IVF builder (native/ivf.cpp).

Stable counting sort of embedding ids by centroid code — O(N) instead of
numpy's O(N log N) argsort on the host-side hot spot of builds and updater
IVF rebuilds. Compiled on first use like the native tokenizer; callers fall
back to the numpy path when the toolchain or library is unavailable, and
outputs are bit-identical either way (tested).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

logger = logging.getLogger(__name__)

__all__ = ["build_ivf_native"]

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "ivf.cpp")
_BUILD_DIR = os.path.join(_REPO_ROOT, "native", "build")
_SO = os.path.join(_BUILD_DIR, "libivf.so")

_lib = None
_lib_failed = False
_lib_lock = threading.Lock()


def _load() -> ctypes.CDLL | None:
    global _lib, _lib_failed
    with _lib_lock:
        if _lib is not None or _lib_failed:
            return _lib
        if not os.path.exists(_SRC):
            _lib_failed = True
            return None
        try:
            if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
                os.makedirs(_BUILD_DIR, exist_ok=True)
                # compile to a pid-unique temp and rename into place: a
                # concurrent rank can never dlopen a half-written library
                tmp = f"{_SO}.{os.getpid()}.tmp"
                subprocess.run(
                    ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
                     _SRC, "-o", tmp],
                    check=True, capture_output=True,
                )
                os.replace(tmp, _SO)
            lib = ctypes.CDLL(_SO)
            lib.build_ivf_counting.restype = ctypes.c_int
            lib.build_ivf_counting.argtypes = [
                ctypes.POINTER(ctypes.c_uint32), ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ]
            _lib = lib
        except (OSError, subprocess.CalledProcessError) as e:
            logger.info("native IVF builder unavailable (%s); using numpy", e)
            _lib_failed = True
        return _lib


def build_ivf_native(
    codes: np.ndarray, num_partitions: int
) -> tuple[np.ndarray, np.ndarray] | None:
    """(ivf int32, lengths int32) via the C++ counting sort, or None if the
    native library is unavailable (callers fall back to numpy argsort).
    Codes >= num_partitions (tombstone overflow cell) sort to the tail and
    are excluded from lengths — identical to the numpy semantics."""
    lib = _load()
    if lib is None or len(codes) > np.iinfo(np.int32).max:
        return None
    codes_u = np.ascontiguousarray(codes, dtype=np.uint32)
    n = codes_u.shape[0]
    ivf = np.empty(n, np.int32)
    lengths = np.zeros(num_partitions, np.int32)
    rc = lib.build_ivf_counting(
        codes_u.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        ctypes.c_int64(n), ctypes.c_int64(num_partitions),
        ivf.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc != 0:
        return None
    return ivf, lengths
