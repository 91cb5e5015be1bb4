"""Systematic public-API parity vs the reference source.

Two contracts (SURVEY §5.6: the ~40 ``Focusr`` kwargs and 13 ``Graph``
kwargs are the public API, mirrored 1:1 by name and default):

1. Signature parity — parsed straight out of the reference source with
   ``ast`` (``/root/reference/pyfocusr/{focusr,graph}.py``), so any upstream
   kwarg we silently dropped or re-defaulted fails here rather than in a
   user's migration.  Skipped on runners without the reference checkout.

2. Input-type parity — the reference's mesh inputs are live ``vtkPolyData``
   objects (``focusr.py:23``, ``graph.py:19``).  ``as_trimesh`` coerces
   duck-typed vtkPolyData (no vtk import needed) so those call sites migrate
   unchanged; verified against a fake implementing the VTK C++ API surface.
"""

import ast
import inspect
import os

import numpy as np
import pytest

REF = "/root/reference/pyfocusr"

# Deliberate additions to the reference surface (documented in PARITY.md):
# reproducibility (seed), instrumentation (timer), the CPD outlier weight,
# eigensolver selection, and precomputed-topology reuse.  ``mesh`` is the
# reference's ``vtk_mesh`` under its TriMesh-first name (alias tested below).
ALLOWED_EXTRA = {
    "Focusr": {"non_rigid_outlier_w", "seed", "timer"},
    "Graph": {"mesh", "seed", "eig_method", "eig_cg_iters",
              "eig_lanczos_iters", "topology"},
}
# Reference params intentionally renamed/aliased rather than duplicated.
ALIASED = {"Graph": {"vtk_mesh"}}


def _reference_init_params(path, cls):
    tree = ast.parse(open(path).read())
    for node in ast.walk(tree):
        if isinstance(node, ast.ClassDef) and node.name == cls:
            for f in node.body:
                if isinstance(f, ast.FunctionDef) and f.name == "__init__":
                    a = f.args
                    names = [x.arg for x in a.args[1:]] + [
                        x.arg for x in a.kwonlyargs
                    ]
                    defaults = {}
                    pos = a.args[1:]
                    for arg, d in zip(pos[len(pos) - len(a.defaults):], a.defaults):
                        defaults[arg.arg] = d
                    for arg, d in zip(a.kwonlyargs, a.kw_defaults):
                        if d is not None:
                            defaults[arg.arg] = d
                    return names, defaults
    raise AssertionError(f"{cls}.__init__ not found in {path}")


def _default_equal(ref_node, ours):
    """Compare a reference AST default against our runtime default, treating
    list/tuple as interchangeable (we use immutable defaults)."""
    try:
        ref_val = ast.literal_eval(ref_node)
    except (ValueError, SyntaxError):
        return True  # non-literal default (e.g. a name): not comparable
    if isinstance(ref_val, (list, tuple)) and isinstance(ours, (list, tuple)):
        return list(ref_val) == list(ours)
    if ref_val is None or ours is None:
        return ref_val is ours
    return ref_val == ours


@pytest.mark.parametrize(
    "cls_name,ref_file",
    [("Focusr", "focusr.py"), ("Graph", "graph.py")],
)
def test_init_signature_matches_reference(cls_name, ref_file):
    path = os.path.join(REF, ref_file)
    if not os.path.isfile(path):
        pytest.skip("reference checkout not available")
    import pyfocusr_tpu

    ref_names, ref_defaults = _reference_init_params(path, cls_name)
    sig = inspect.signature(getattr(pyfocusr_tpu, cls_name).__init__)
    our_params = {p: v for p, v in sig.parameters.items() if p != "self"}

    missing = [
        n for n in ref_names
        if n not in our_params and n not in ALIASED.get(cls_name, set())
    ]
    assert not missing, f"{cls_name} kwargs missing vs reference: {missing}"

    undeclared_extra = [
        n for n in our_params
        if n not in ref_names and n not in ALLOWED_EXTRA.get(cls_name, set())
    ]
    assert not undeclared_extra, (
        f"{cls_name} grew kwargs not in the reference nor ALLOWED_EXTRA "
        f"(document them): {undeclared_extra}"
    )

    for n, ref_node in ref_defaults.items():
        if n not in our_params:
            continue
        ours = our_params[n].default
        if ours is inspect.Parameter.empty:
            continue
        assert _default_equal(ref_node, ours), (
            f"{cls_name}.{n} default differs: "
            f"ref={ast.unparse(ref_node)!r} ours={ours!r}"
        )


# PipelineConfig deliberately defaults six fields to the reference EXAMPLE
# NOTEBOOK's tuned values instead of Focusr's raw defaults (documented in the
# PipelineConfig docstring; Focusr forwards its own values explicitly, so the
# class path keeps raw reference defaults).  Everything else must agree.
PIPELINE_DEFAULT_DEVIATIONS = {
    "n_coords_spectral_registration",
    "get_weighted_spectral_coords",
    "rigid_before_non_rigid_reg",
    "non_rigid_max_iterations",
    "non_rigid_alpha",
    "non_rigid_beta",
}


def test_pipeline_config_defaults_track_focusr():
    import dataclasses

    from pyfocusr_tpu import Focusr
    from pyfocusr_tpu.pipeline import PipelineConfig

    fsig = inspect.signature(Focusr.__init__)
    fdef = {
        p: v.default
        for p, v in fsig.parameters.items()
        if v.default is not inspect.Parameter.empty
    }
    drift = []
    for f in dataclasses.fields(PipelineConfig):
        if f.name not in fdef or f.name in PIPELINE_DEFAULT_DEVIATIONS:
            continue
        d = f.default
        fv = fdef[f.name]
        if isinstance(d, tuple) and isinstance(fv, (list, tuple)):
            d, fv = list(d), list(fv)
        if d != fv:
            drift.append((f.name, fv, d))
    assert not drift, (
        "PipelineConfig defaults drifted from Focusr's (add to "
        f"PIPELINE_DEFAULT_DEVIATIONS only if deliberate+documented): {drift}"
    )


@pytest.mark.parametrize(
    "cls_name,ref_file",
    [("Focusr", "focusr.py"), ("Graph", "graph.py"), ("eigsort", "eigsort.py")],
)
def test_method_surface_matches_reference(cls_name, ref_file):
    """Every public method/property the reference class defines must exist
    here (SURVEY §2.1 — users read results off these)."""
    path = os.path.join(REF, ref_file)
    if not os.path.isfile(path):
        pytest.skip("reference checkout not available")
    import pyfocusr_tpu

    tree = ast.parse(open(path).read())
    members = []
    for node in ast.walk(tree):
        if isinstance(node, ast.ClassDef) and node.name == cls_name:
            members = [
                f.name for f in node.body
                if isinstance(f, ast.FunctionDef) and not f.name.startswith("_")
            ]
    assert members, f"{cls_name} not found in reference"
    ours = getattr(pyfocusr_tpu, cls_name)
    missing = [m for m in members if not hasattr(ours, m)]
    assert not missing, f"{cls_name} methods missing vs reference: {missing}"


def test_get_laplacian_matrix_matches_matvec():
    """Graph.get_laplacian_matrix materializes the same operator the
    matrix-free path applies (reference ``graph.py:221-226``)."""
    from test_curvature_icp import make_sphere

    from pyfocusr_tpu import Graph
    from pyfocusr_tpu.mesh import TriMesh

    pts, tris = make_sphere(n_theta=8, n_phi=16)
    g = Graph(TriMesh(np.asarray(pts, np.float32), np.asarray(tris, np.int32)), seed=0)
    g.get_weighted_adjacency_matrix()
    L = g.get_laplacian_matrix()
    assert L is g.laplacian_matrix and L.shape == (g.n_points,) * 2
    rng = np.random.default_rng(0)
    x = rng.standard_normal(g.n_points).astype(np.float32)
    np.testing.assert_allclose(
        L @ x, np.asarray(g.laplacian_matvec(x)), rtol=2e-4, atol=2e-4
    )


# ---------------------------------------------------------------------------
# Duck-typed vtkPolyData coercion
# ---------------------------------------------------------------------------


class _FakeIdList:
    def __init__(self, ids):
        self._ids = list(ids)

    def GetNumberOfIds(self):
        return len(self._ids)

    def GetId(self, i):
        return self._ids[i]


class _FakeCell:
    def __init__(self, ids):
        self._ids = _FakeIdList(ids)

    def GetPointIds(self):
        return self._ids


class _FakeArray:
    def __init__(self, values):
        self._v = np.atleast_2d(np.asarray(values, np.float64).T).T

    def GetNumberOfTuples(self):
        return self._v.shape[0]

    def GetNumberOfComponents(self):
        return self._v.shape[1]

    def GetComponent(self, t, c):
        return float(self._v[t, c])


class _FakePointData:
    def __init__(self, arrays):
        self._arrays = list(arrays.items())

    def GetNumberOfArrays(self):
        return len(self._arrays)

    def GetArrayName(self, i):
        return self._arrays[i][0]

    def GetArray(self, i):
        return _FakeArray(self._arrays[i][1])


class _FakePolyData:
    """Implements exactly the vtkPolyData member functions ``as_trimesh``
    duck-types; holding it in tests proves no real vtk import is needed."""

    def __init__(self, points, cells, point_data=None):
        self._points = np.asarray(points, np.float64)
        self._cells = [list(c) for c in cells]
        self._pd = _FakePointData(point_data or {})

    def GetNumberOfPoints(self):
        return self._points.shape[0]

    def GetPoint(self, i):
        return tuple(self._points[i])

    def GetNumberOfCells(self):
        return len(self._cells)

    def GetCell(self, i):
        return _FakeCell(self._cells[i])

    def GetPointData(self):
        return self._pd


def _fake_sphere_polydata():
    from test_curvature_icp import make_sphere

    pts, tris = make_sphere(n_theta=8, n_phi=16)
    thickness = np.linspace(0.0, 1.0, pts.shape[0])
    return (
        _FakePolyData(pts, tris, {"thickness": thickness}),
        np.asarray(pts, np.float32),
        np.asarray(tris, np.int32),
        thickness.astype(np.float32),
    )


def test_as_trimesh_accepts_vtkpolydata_ducktype():
    from pyfocusr_tpu.mesh import TriMesh, as_trimesh

    poly, pts, tris, thickness = _fake_sphere_polydata()
    m = as_trimesh(poly)
    assert isinstance(m, TriMesh)
    np.testing.assert_allclose(np.asarray(m.points), pts, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(m.triangles), tris)
    np.testing.assert_allclose(
        np.asarray(m.point_data["thickness"]), thickness, rtol=1e-6
    )
    # idempotent on TriMesh
    assert as_trimesh(m) is m


def test_as_trimesh_fan_triangulates_quads():
    from pyfocusr_tpu.mesh import as_trimesh

    pts = [(0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0)]
    poly = _FakePolyData(pts, [[0, 1, 2, 3]])
    m = as_trimesh(poly)
    np.testing.assert_array_equal(
        np.asarray(m.triangles), [[0, 1, 2], [0, 2, 3]]
    )


def test_as_trimesh_rejects_non_mesh():
    from pyfocusr_tpu.mesh import as_trimesh

    with pytest.raises(TypeError, match="cannot interpret"):
        as_trimesh(42)


def test_graph_accepts_vtk_mesh_keyword_and_polydata():
    from pyfocusr_tpu import Graph

    poly, pts, _, _ = _fake_sphere_polydata()
    g = Graph(vtk_mesh=poly, n_spectral_features=2, seed=0)
    np.testing.assert_allclose(np.asarray(g.points), pts, rtol=1e-6)
    with pytest.raises(TypeError, match="requires a mesh"):
        Graph()


def test_focusr_accepts_polydata_inputs():
    from pyfocusr_tpu import Focusr

    poly_t, _, _, _ = _fake_sphere_polydata()
    poly_s, _, _, _ = _fake_sphere_polydata()
    reg = Focusr(
        vtk_mesh_target=poly_t,
        vtk_mesh_source=poly_s,
        icp_register_first=False,
        n_spectral_features=2,
        n_extra_spectral=1,
        list_features_to_calc=[],
        rigid_before_non_rigid_reg=False,
        non_rigid_max_iterations=5,
        graph_smoothing_iterations=5,
        projection_smooth_iterations=2,
        smooth_correspondences=True,
        verbose=False,
    )
    reg.align_maps()
    n = reg.graph_source.n_points
    corr = np.asarray(reg.corresponding_target_idx_for_each_source_pt)
    assert corr.shape == (n,)
    assert corr.min() >= 0 and corr.max() < reg.graph_target.n_points


def test_vtk_functions_accept_polydata():
    from pyfocusr_tpu.vtk_functions import (
        apply_transform,
        get_min_max_curvature_values,
        icp_transform,
        vtk_deep_copy,
    )

    poly, pts, _, _ = _fake_sphere_polydata()
    m = vtk_deep_copy(poly)
    np.testing.assert_allclose(np.asarray(m.points), pts, rtol=1e-6)
    kmin, kmax = get_min_max_curvature_values(poly)
    assert kmin.shape == (pts.shape[0],) and kmax.shape == (pts.shape[0],)
    tf = icp_transform(poly, poly, transform_mode="rigid")
    moved = apply_transform(poly, tf)
    # identical clouds: ICP transform is ~identity
    np.testing.assert_allclose(np.asarray(moved.points), pts, atol=1e-3)
