"""ctypes bindings for the native C++ runtime components (native/*.cpp).

Build with ``make native`` (or ``native/build.sh``); every consumer has a
pure-Python fallback so the package works without the shared library.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(os.path.dirname(__file__), "_native.so")
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.lap_jv.restype = ctypes.c_int
        lib.lap_jv.argtypes = [
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.parse_doubles.restype = ctypes.c_int64
        lib.parse_doubles.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.parse_longs.restype = ctypes.c_int64
        lib.parse_longs.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def lap_jv_native(cost: np.ndarray) -> Optional[np.ndarray]:
    """C++ JV solve; returns col_ind or None if the library is unavailable.
    Requires n_rows <= n_cols."""
    lib = get_lib()
    if lib is None:
        return None
    cost = np.ascontiguousarray(cost, dtype=np.float64)
    n_rows, n_cols = cost.shape
    out = np.empty(n_rows, dtype=np.int64)
    rc = lib.lap_jv(
        cost.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n_rows,
        n_cols,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if rc != 0:
        return None
    return out


def parse_doubles_native(data: bytes, max_out: int) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty(max_out, dtype=np.float64)
    consumed = ctypes.c_int64(0)
    n = lib.parse_doubles(
        data,
        len(data),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        max_out,
        ctypes.byref(consumed),
    )
    return out[:n]
