"""Randomized robustness: random triangulations through topology + spectrum
vs scipy, and degenerate-geometry guards."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp
from scipy.sparse.linalg import eigs
from scipy.spatial import Delaunay

from pyfocusr_tpu.mesh import build_topology
from pyfocusr_tpu.ops import graph_ops as G
from pyfocusr_tpu.ops.eigen import chebyshev_eigpairs


def _random_surface_mesh(seed, n=400):
    """Random open surface: Delaunay triangulation of a bumpy height field."""
    rng = np.random.default_rng(seed)
    xy = rng.uniform(0, 1, size=(n, 2))
    tri = Delaunay(xy)
    z = 0.2 * np.sin(4 * xy[:, 0]) * np.cos(3 * xy[:, 1]) + 0.02 * rng.normal(
        size=n
    )
    pts = np.column_stack([xy, z]).astype(np.float32)
    return pts, tri.simplices.astype(np.int32)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_random_mesh_spectrum_matches_scipy(seed):
    pts, tris = _random_surface_mesh(seed)
    n = len(pts)
    topo = build_topology(tris, n)
    ptsj = jnp.asarray(pts)
    nbrs = jnp.asarray(topo.neighbors)
    mask = jnp.asarray(topo.nbr_mask)
    ov = jnp.asarray(topo.overflow_edges)
    w = G.edge_weights(ptsj, nbrs, mask)
    ov_w = G.overflow_weights(ptsj, ov)
    d = G.degree_vector(w, ov, ov_w)
    g = (d + 1e-8) ** -1
    s = jnp.sqrt(g)

    def matvec(x):
        return G.sym_laplacian_matvec(nbrs, w, g, x, ov, ov_w)

    ind = np.zeros((n, max(topo.n_components, 1)), np.float32)
    ind[np.arange(n), topo.component_labels] = 1.0
    null = jnp.asarray(ind) * (1.0 / s)[:, None]
    ws = G.spmv(nbrs, w, s, ov, ov_w)
    bound = float(jnp.max(s * (s * d + ws)))
    lams, vecs, resid = chebyshev_eigpairs(
        matvec, null, jax.random.PRNGKey(seed), 4, lam_max_bound=bound,
        block_extra=16,
    )

    # scipy oracle on the same graph (incl. overflow edges)
    e = topo.edges
    dist = np.linalg.norm(pts[e[:, 0]] - pts[e[:, 1]], axis=1)
    wij = 1.0 / np.maximum(dist, 1e-20)
    W = sp.coo_matrix(
        (np.r_[wij, wij], (np.r_[e[:, 0], e[:, 1]], np.r_[e[:, 1], e[:, 0]])),
        shape=(n, n),
    ).tocsc()
    dn = np.asarray(W.sum(1)).ravel()
    L = sp.diags((dn + 1e-8) ** -1) @ (sp.diags(dn) - W)
    ev, _ = eigs(L, k=6, sigma=1e-10, which="LM", ncv=24)
    keep = np.sort(ev.real[ev.real > 1e-10])[:4]
    np.testing.assert_allclose(np.asarray(lams), keep, rtol=5e-3)


def test_degenerate_triangle_curvature_finite():
    """Zero-area (collinear) triangles must not NaN the curvature operators."""
    from pyfocusr_tpu.ops.curvature import principal_curvatures

    pts = np.array(
        [[0, 0, 0], [1, 0, 0], [2, 0, 0], [1, 1, 0], [1, -1, 0.2]], np.float32
    )
    tris = np.array([[0, 1, 2], [0, 1, 3], [1, 2, 3], [0, 1, 4], [1, 2, 4]], np.int32)
    topo = build_topology(tris, len(pts))
    kmin, kmax = principal_curvatures(
        jnp.asarray(pts), jnp.asarray(tris), jnp.asarray(topo.edges),
        jnp.asarray(topo.edge_faces),
    )
    assert np.all(np.isfinite(np.asarray(kmin)))
    assert np.all(np.isfinite(np.asarray(kmax)))


def test_viz_guards():
    """Without itkwidgets, viewers raise the reference's ImportError shape;
    default_colors works regardless."""
    from pyfocusr_tpu.utils import viz

    colors = viz.default_colors(5)
    assert len(colors) == 5 and all(len(c) == 3 for c in colors)
    if viz.Viewer is None:
        with pytest.raises(ImportError, match="cant view"):
            viz.require_viewer()


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_mesh_wide_solver_matches_scipy(seed):
    """The WIDE-block solver (round-2 default for >= 2048 vertices,
    ops/eigen.chebyshev_eigpairs_wide) on random irregular triangulations
    at production size vs the ARPACK oracle."""
    from pyfocusr_tpu.ops.eigen import chebyshev_eigpairs_wide

    pts, tris = _random_surface_mesh(seed, n=2600)
    n = len(pts)
    topo = build_topology(tris, n)
    ptsj = jnp.asarray(pts)
    nbrs = jnp.asarray(topo.neighbors)
    mask = jnp.asarray(topo.nbr_mask)
    ov = jnp.asarray(topo.overflow_edges)
    w = G.edge_weights(ptsj, nbrs, mask)
    ov_w = G.overflow_weights(ptsj, ov)
    d = G.degree_vector(w, ov, ov_w)
    g = (d + 1e-8) ** -1
    s = jnp.sqrt(g)

    def matvec(x):
        return G.sym_laplacian_matvec(nbrs, w, g, x, ov, ov_w)

    ind = np.zeros((n, max(topo.n_components, 1)), np.float32)
    ind[np.arange(n), topo.component_labels] = 1.0
    null = jnp.asarray(ind) * (1.0 / s)[:, None]
    ws = G.spmv(nbrs, w, s, ov, ov_w)
    bound = float(jnp.max(s * (s * d + ws)))
    lams, vecs, resid = chebyshev_eigpairs_wide(
        matvec, null, jax.random.PRNGKey(seed), 6, lam_max_bound=bound
    )

    e = topo.edges
    dist = np.linalg.norm(pts[e[:, 0]] - pts[e[:, 1]], axis=1)
    wij = 1.0 / np.maximum(dist, 1e-20)
    W = sp.coo_matrix(
        (np.r_[wij, wij], (np.r_[e[:, 0], e[:, 1]], np.r_[e[:, 1], e[:, 0]])),
        shape=(n, n),
    ).tocsc()
    dn = np.asarray(W.sum(1)).ravel()
    L = sp.diags((dn + 1e-8) ** -1) @ (sp.diags(dn) - W)
    ev, evec = eigs(L, k=9, sigma=1e-10, which="LM", ncv=36)
    order = np.argsort(ev.real)
    keep = [i for i in order if ev.real[i] > 1e-10][:6]
    np.testing.assert_allclose(
        np.asarray(lams, np.float64), ev.real[keep], rtol=5e-3
    )
    # Eigenvector parity mod sign (back-transform: u = s * v).
    ours = np.asarray(vecs, np.float64) * np.asarray(s, np.float64)[:, None]
    ref = evec.real[:, keep]
    cos = np.abs(
        (ours * ref).sum(0)
        / (np.linalg.norm(ours, axis=0) * np.linalg.norm(ref, axis=0))
    )
    assert cos.min() > 0.99, cos


@pytest.mark.parametrize("seed", [0, 1])
def test_random_pair_end_to_end_registration(seed):
    """Full register_pair on random irregular surface pairs: finite outputs,
    valid correspondences, transformed points near the target surface."""
    from pyfocusr_tpu.mesh import TriMesh
    from pyfocusr_tpu.ops.knn import nn_query
    from pyfocusr_tpu.pipeline import (
        PipelineConfig,
        mesh_to_graph_arrays,
        register_pair,
    )

    pts, tris = _random_surface_mesh(seed, n=700)
    rng = np.random.default_rng(seed + 100)
    warp = pts * (1.0 + 0.03 * np.sin(4.0 * pts[:, [0]]))
    warp = warp + 0.002 * rng.normal(size=warp.shape)
    t_mesh = TriMesh(jnp.asarray(pts, jnp.float32), jnp.asarray(tris))
    s_mesh = TriMesh(jnp.asarray(warp, jnp.float32), jnp.asarray(tris))
    cfg = PipelineConfig(
        icp_iterations=10,
        n_coords_spectral_ordering=400,
        n_coords_spectral_registration=200,
        non_rigid_max_iterations=15,
        non_rigid_n_eigens=40,
        graph_smoothing_iterations=10,
        projection_smooth_iterations=2,
    )
    res = register_pair(
        mesh_to_graph_arrays(t_mesh), mesh_to_graph_arrays(s_mesh),
        cfg, jax.random.PRNGKey(seed),
    )
    corr = np.asarray(res["correspondences"])
    assert np.all((corr >= 0) & (corr < t_mesh.n_points))
    w = np.asarray(res["weighted_points"])
    assert np.isfinite(w).all()
    d, _ = nn_query(t_mesh.points, jnp.asarray(w))
    extent = float(np.ptp(pts))
    assert float(jnp.mean(d)) < 0.05 * extent
