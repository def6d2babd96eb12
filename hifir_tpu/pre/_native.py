"""ctypes bridge to the compiled native host kernels (``hifir_tpu/native``).

The reference keeps its serial graph/matching algorithms in optimized C++
(``pre/equilibrate.hpp``, ``pre/amd.hpp``, ``pre/rcm.hpp``); we do the same via
a small shared library.  Pure-Python anchors exist for every function so the
framework degrades gracefully when the library is not built.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_I64 = np.ctypeslib.ndpointer(dtype=np.int64, flags="C_CONTIGUOUS")
_I32 = np.ctypeslib.ndpointer(dtype=np.int32, flags="C_CONTIGUOUS")
_F64 = np.ctypeslib.ndpointer(dtype=np.float64, flags="C_CONTIGUOUS")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(here, "native", "libhifir_tpu.so")
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    try:
        lib.ht_mc64.restype = ctypes.c_int
        lib.ht_mc64.argtypes = [ctypes.c_int64, _I64, _I32, _F64, _I64, _F64,
                                _F64]
        lib.ht_amd.restype = ctypes.c_int
        lib.ht_amd.argtypes = [ctypes.c_int64, _I64, _I32, _I64]
        lib.ht_rcm.restype = ctypes.c_int
        lib.ht_rcm.argtypes = [ctypes.c_int64, _I64, _I32, _I64]
    except AttributeError:
        return None
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def mc64(B) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """Native MC64-equivalent matching; same contract as
    :func:`hifir_tpu.pre.matching.mc64_matching`."""
    lib = _load()
    n = B.nrows
    AT = B.tocsc()
    p = np.empty(n, dtype=np.int64)
    s = np.empty(n, dtype=np.float64)
    t = np.empty(n, dtype=np.float64)
    info = lib.ht_mc64(n, AT.indptr, AT.indices,
                       np.ascontiguousarray(AT.data, dtype=np.float64), p, s, t)
    if info < 0:
        raise RuntimeError(f"native mc64 failed with {info}")
    return p, s, t, info


def amd(n: int, indptr: np.ndarray, indices: np.ndarray) -> Optional[np.ndarray]:
    """Native AMD ordering on a symmetric pattern; returns permutation or None."""
    lib = _load()
    if lib is None:
        return None
    perm = np.empty(n, dtype=np.int64)
    st = lib.ht_amd(n, np.ascontiguousarray(indptr, dtype=np.int64),
                    np.ascontiguousarray(indices, dtype=np.int32), perm)
    if st != 0:
        return None
    return perm


def rcm(n: int, indptr: np.ndarray, indices: np.ndarray) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    perm = np.empty(n, dtype=np.int64)
    st = lib.ht_rcm(n, np.ascontiguousarray(indptr, dtype=np.int64),
                    np.ascontiguousarray(indices, dtype=np.int32), perm)
    if st != 0:
        return None
    return perm
