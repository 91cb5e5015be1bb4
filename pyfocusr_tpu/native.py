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


def _try_autobuild(path: str) -> None:
    """Build _native.so on first use when absent (fresh checkouts never have
    it — it is a gitignored build artifact, and without this the native
    fast paths silently fell back to numpy: measured 4-12 s instead of
    0.4 s for a 240k-vertex topology build).  Atomic: compile to a unique
    temp file and rename, so concurrent importers (pytest workers) cannot
    observe a half-written library.  Failures are silent by design — every
    consumer has a pure-Python fallback.  Disable with
    PYFOCUSR_TPU_NO_AUTOBUILD=1."""
    if os.environ.get("PYFOCUSR_TPU_NO_AUTOBUILD") == "1":
        return
    import shutil
    import subprocess
    import tempfile

    cxx = shutil.which("g++") or shutil.which("c++")
    if cxx is None:
        return
    src_dir = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")
    sources = [
        os.path.join(src_dir, f)
        for f in ("lap_jv.cpp", "fast_parse.cpp", "fast_topology.cpp")
    ]
    if not all(os.path.exists(s) for s in sources):
        return
    tmp = None
    try:
        # mkstemp inside the try: an unwritable install dir (read-only
        # site-packages) must fall back silently, like every other path.
        fd, tmp = tempfile.mkstemp(
            suffix=".so", prefix="_native_", dir=os.path.dirname(path)
        )
        os.close(fd)
        proc = subprocess.run(
            [cxx, "-O3", "-march=native", "-shared", "-fPIC", "-o", tmp]
            + sources,
            capture_output=True,
            timeout=120,
        )
        if proc.returncode == 0:
            os.replace(tmp, path)
    except Exception:
        pass
    finally:
        if tmp is not None and os.path.exists(tmp):
            try:
                os.remove(tmp)
            except OSError:
                pass


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(os.path.dirname(__file__), "_native.so")
    if not os.path.exists(path):
        _try_autobuild(path)
    else:
        # Source-newer-than-binary staleness: the missing-symbol probe
        # below only catches ADDED functions; a behavior fix inside an
        # existing one (e.g. the lap_jv non-finite guard) needs an mtime
        # check, or every existing checkout keeps the old behavior.
        src_dir = os.path.join(
            os.path.dirname(os.path.dirname(__file__)), "native"
        )
        try:
            so_mtime = os.path.getmtime(path)
            srcs = ("lap_jv.cpp", "fast_parse.cpp", "fast_topology.cpp")
            if any(
                os.path.getmtime(os.path.join(src_dir, f)) > so_mtime
                for f in srcs
                if os.path.exists(os.path.join(src_dir, f))
            ):
                _try_autobuild(path)  # atomic os.replace; pre-first-dlopen
        except OSError:
            pass
    if not os.path.exists(path):
        return None
    _LIB = _load(path)
    if _LIB is None and os.path.exists(path):
        # A STALE _native.so missing newer symbols (built before e.g.
        # mis_greedy existed) must not permanently disable every native
        # path: rebuild and retry.  The retry must load through a UNIQUE
        # path — glibc dlopen dedupes by pathname and ctypes never
        # dlcloses, so after the AttributeError the stale handle stays
        # cached under the original path and reloading it would return
        # the same old library (verified empirically).  The temp copy is
        # unlinked right after dlopen (the mapping survives on POSIX).
        _try_autobuild(path)
        _LIB = _load_via_unique_copy(path)
    return _LIB


def _load_via_unique_copy(path: str) -> Optional[ctypes.CDLL]:
    import shutil
    import tempfile

    try:
        fd, tmp = tempfile.mkstemp(suffix=".so", prefix="_native_run_")
        os.close(fd)
        shutil.copy(path, tmp)
    except Exception:
        return _load(path)
    lib = _load(tmp)
    # On POSIX the mapping survives the unlink (dlopen holds the inode), so
    # the temp copy need not outlive this call — without the unlink every
    # process hitting the stale-library path would leak one .so into /tmp.
    try:
        os.unlink(tmp)
    except OSError:
        pass
    return lib


def _load(path: str) -> Optional[ctypes.CDLL]:
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
        lib.mis_greedy.restype = ctypes.c_int64
        lib.mis_greedy.argtypes = [
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int8),
        ]
        return lib
    except (OSError, AttributeError):
        return None


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
    # .copy(), not ascontiguousarray: a leading slice of a C-contiguous
    # array is already contiguous, so ascontiguousarray returns a VIEW that
    # pins the whole 3F-row scratch buffer for the topology's lifetime.
    edges = edges[:n_edges].copy()
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


def mis_greedy_native(
    u: np.ndarray, v: np.ndarray, n_points: int, prio: np.ndarray
) -> Optional[np.ndarray]:
    """Greedy maximal independent set in ascending-priority order (the
    lexicographically-first MIS — identical to the Luby rounds the
    multiresolution decimator runs with the same static priorities; gated
    byte-for-byte by tests/test_native_topology.py).  Returns int8 state
    (1 seed, -1 blocked) or None when the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    u = np.ascontiguousarray(u, dtype=np.int64)
    v = np.ascontiguousarray(v, dtype=np.int64)
    prio = np.ascontiguousarray(prio, dtype=np.int64)
    # Scatter-inverse only covers every slot when prio is an exact
    # permutation; validate rather than leave np.empty garbage that the
    # C++ bounds check could accept as a silently wrong visiting order.
    order = np.full(n_points, -1, np.int64)
    order[prio] = np.arange(n_points, dtype=np.int64)
    if (order < 0).any():
        raise ValueError(
            "prio must be a permutation of 0..n_points-1 "
            "(ascending-priority vertex order)"
        )
    state = np.empty(n_points, np.int8)
    rc = lib.mis_greedy(
        u.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(u),
        n_points,
        order.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        state.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
    )
    if rc != 0:
        return None
    return state
