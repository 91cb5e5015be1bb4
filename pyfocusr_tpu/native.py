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
        # AttributeError covers a STALE _native.so missing newer symbols
        # (e.g. built before fast_topology.cpp existed): fall back to the
        # pure-Python paths instead of crashing every consumer.
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
        lib.topo_edges.restype = ctypes.c_int64
        lib.topo_edges.argtypes = [
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.topo_fill.restype = ctypes.c_int64
        lib.topo_fill.argtypes = [
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
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
    except (OSError, AttributeError):
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


def topology_native(tris: np.ndarray, n_points: int, max_deg: int):
    """C++ topology build (native/fast_topology.cpp): returns
    (edges i32 [E,2], edge_faces i32 [E,2], true_max_degree, neighbors
    i32 [N, max_deg], mask f32 [N, max_deg], overflow i32 [O,2], labels
    i32 [N], n_components) or None when the library is unavailable.

    Two-call protocol: pass max_deg=None for the first call (edge list +
    true degree only).  The caller decides the ELL width (cap/pad) and
    calls again with max_deg set — the wrapper below does both.
    """
    lib = get_lib()
    if lib is None or not hasattr(lib, "topo_edges"):
        return None
    tris64 = np.ascontiguousarray(tris, dtype=np.int64)
    n_faces = tris64.shape[0]
    cap = max(3 * n_faces, 1)
    edges = np.empty((cap, 2), np.int32)
    edge_faces = np.empty((cap, 2), np.int32)
    true_max = np.zeros(1, np.int64)
    n_edges = lib.topo_edges(
        tris64.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n_faces,
        n_points,
        edges.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        edge_faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        true_max.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if n_edges < 0:
        return None  # out-of-range indices: let the numpy path raise
    edges = np.ascontiguousarray(edges[:n_edges])
    edge_faces = edge_faces[:n_edges].copy()
    if max_deg is None:
        return edges, edge_faces, int(true_max[0]), None, None, None, None, 0
    fill = topology_fill_native(edges, n_points, max_deg)
    if fill is None:
        return None
    neighbors, mask, overflow, labels, n_comp = fill
    return (edges, edge_faces, int(true_max[0]), neighbors, mask, overflow,
            labels, n_comp)


def topology_fill_native(edges: np.ndarray, n_points: int, max_deg: int):
    """Pass-2 only: ELL fill + overflow + components from a precomputed
    pass-1 edge list (avoids re-running the topo_edges sort — review
    finding: build_topology was paying it twice)."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "topo_fill"):
        return None
    edges = np.ascontiguousarray(edges, dtype=np.int32)
    n_edges = edges.shape[0]
    neighbors = np.tile(
        np.arange(n_points, dtype=np.int32)[:, None], (1, max_deg)
    )
    mask = np.zeros((n_points, max_deg), np.float32)
    overflow = np.empty((max(2 * n_edges, 1), 2), np.int32)
    labels = np.empty(n_points, np.int32)
    n_comp = np.zeros(1, np.int64)
    n_ov = lib.topo_fill(
        edges.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n_edges,
        n_points,
        max_deg,
        neighbors.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        overflow.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n_comp.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return neighbors, mask, overflow[:n_ov].copy(), labels, int(n_comp[0])
