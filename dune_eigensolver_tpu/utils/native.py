"""ctypes bridge to the native C++ setup helpers (see native/ at repo root).

The reference implements its entire runtime in C++; here the device compute
path is JAX/XLA but the O(nnz) host-side setup loops (dependency-level
computation and chunk packing for the trisolve schedule, CSR->ELL format
packing) have a C++ fast path compiled into ``libdunetpu.so``. Pure-numpy
fallbacks exist everywhere, so the library is optional; ``available()``
reports whether it loaded. Build with ``make -C native``.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB = None
_TRIED = False

_I64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_I32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_F32 = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_F64 = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
_c64 = ctypes.c_int64


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
        lib.levels_from_csr.argtypes = [_c64, _I64, _I64, _I32]
        lib.chunk_schedule.restype = _c64
        lib.chunk_schedule.argtypes = [_c64, _c64, _I64, _I64, _I32, _I32, _I64]
        for name, fp in (("pack_chunks_f32", _F32), ("pack_chunks_f64", _F64)):
            fn = getattr(lib, name)
            fn.restype = None
            fn.argtypes = [_c64, _c64, _c64, _c64, _I64, _I64, fp, _I32, _I64,
                           _I32, _I32, fp]
        for name, fp in (("csr_to_ell_f32", _F32), ("csr_to_ell_f64", _F64)):
            fn = getattr(lib, name)
            fn.restype = None
            fn.argtypes = [_c64, _c64, _c64, _I64, _I64, fp, _I32, fp]
        lib.lu_banded_f64.restype = _c64
        lib.lu_banded_f64.argtypes = [_c64, _c64, _F64]
        _LIB = lib
    except (OSError, AttributeError):
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def _as64(a) -> np.ndarray:
    return np.ascontiguousarray(a, dtype=np.int64)


def levels_from_csr(indptr: np.ndarray, indices: np.ndarray) -> np.ndarray:
    """Native dependency-level computation for a strict triangular CSR."""
    lib = _load()
    n = len(indptr) - 1
    lev = np.zeros(n, dtype=np.int32)
    lib.levels_from_csr(np.int64(n), _as64(indptr), _as64(indices), lev)
    return lev


def chunk_schedule(
    indptr: np.ndarray,
    indices: np.ndarray,
    data: np.ndarray,
    n: int,
    chunk: int,
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray, int, int]]:
    """Full native chunk schedule: (rows, cols, vals, kmax, nlev) or None if
    the library is unavailable or the dtype unsupported. Semantics match the
    pure-numpy _chunk_schedule in factorize/host_lu.py exactly."""
    lib = _load()
    if lib is None:
        return None
    if data.dtype == np.float32:
        pack = lib.pack_chunks_f32
    elif data.dtype == np.float64:
        pack = lib.pack_chunks_f64
    else:
        return None
    indptr64, indices64 = _as64(indptr), _as64(indices)
    data = np.ascontiguousarray(data)
    lev = np.zeros(n, dtype=np.int32)
    order = np.zeros(n, dtype=np.int32)
    boundaries = np.zeros(n + 1, dtype=np.int64)
    nchunk = int(
        lib.chunk_schedule(
            np.int64(n), np.int64(chunk), indptr64, indices64, lev, order, boundaries
        )
    )
    row_nnz = np.diff(indptr64)
    kmax = max(int(row_nnz.max()) if n else 0, 1)
    rows = np.full((nchunk, chunk), n, dtype=np.int32)
    cols = np.full((nchunk, chunk, kmax), n, dtype=np.int32)
    vals = np.zeros((nchunk, chunk, kmax), dtype=data.dtype)
    pack(
        np.int64(n), np.int64(chunk), np.int64(kmax), np.int64(nchunk),
        indptr64, indices64, data, order, boundaries, rows, cols, vals,
    )
    nlev = int(lev.max() + 1) if n else 0
    return rows, cols, vals, kmax, nlev


def lu_banded(work: np.ndarray, n: int, bw: int) -> Optional[int]:
    """Native in-place no-pivot banded LU on the column-band array
    work[bw + r, i] = A[i + r, i]. Returns first zero-pivot index or -1, or
    None if the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    assert work.dtype == np.float64 and work.flags["C_CONTIGUOUS"]
    return int(lib.lu_banded_f64(np.int64(n), np.int64(bw), work))


def csr_to_ell(
    indptr: np.ndarray,
    indices: np.ndarray,
    data: np.ndarray,
    kmax: int,
    pad_col: int,
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Native CSR->ELL packing: (cols (n,kmax), vals (n,kmax)) or None."""
    lib = _load()
    if lib is None:
        return None
    if data.dtype == np.float32:
        fn = lib.csr_to_ell_f32
    elif data.dtype == np.float64:
        fn = lib.csr_to_ell_f64
    else:
        return None
    n = len(indptr) - 1
    cols = np.empty((n, kmax), dtype=np.int32)
    vals = np.empty((n, kmax), dtype=data.dtype)
    fn(
        np.int64(n), np.int64(kmax), np.int64(pad_col),
        _as64(indptr), _as64(indices), np.ascontiguousarray(data), cols, vals,
    )
    return cols, vals
