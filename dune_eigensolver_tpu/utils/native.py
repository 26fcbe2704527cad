"""ctypes bridge to the native C++ setup helpers (see native/ at repo root).

The reference implements its entire runtime in C++; here the device compute
path is JAX/XLA but the O(nnz) host-side setup loops (dependency-level
computation for the trisolve schedule, format conversion) have a C++ fast
path compiled into ``libdunetpu.so``. Pure-numpy fallbacks exist everywhere,
so the library is optional; ``available()`` reports whether it loaded.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _lib_path() -> str:
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(root, "native", "libdunetpu.so")


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _lib_path()
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.levels_from_csr.restype = None
        lib.levels_from_csr.argtypes = [
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def levels_from_csr(indptr: np.ndarray, indices: np.ndarray) -> np.ndarray:
    """Native dependency-level computation for a strict triangular CSR."""
    lib = _load()
    n = len(indptr) - 1
    lev = np.zeros(n, dtype=np.int32)
    lib.levels_from_csr(
        np.int64(n),
        np.ascontiguousarray(indptr, dtype=np.int64),
        np.ascontiguousarray(indices, dtype=np.int64),
        lev,
    )
    return lev
