"""Graph layer parity vs scipy.sparse reconstructions of the reference's
matrices (adjacency ``graph.py:148-178``, degree ``:216-219``, Laplacian
``:221-226``, mean filter ``:320-354``)."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from pyfocusr_tpu.ops import graph_ops as G


@pytest.fixture(scope="module")
def graph_arrays(mesh_5k_source, topo_5k_source):
    pts = jnp.asarray(mesh_5k_source.points)
    nbrs = jnp.asarray(topo_5k_source.neighbors)
    mask = jnp.asarray(topo_5k_source.nbr_mask)
    w = G.edge_weights(pts, nbrs, mask)
    return pts, nbrs, mask, w


@pytest.fixture(scope="module")
def scipy_W(mesh_5k_source, topo_5k_source):
    pts = np.asarray(mesh_5k_source.points)
    e = topo_5k_source.edges
    d = np.linalg.norm(pts[e[:, 0]] - pts[e[:, 1]], axis=1)
    w = 1.0 / d
    n = pts.shape[0]
    return sp.coo_matrix(
        (np.r_[w, w], (np.r_[e[:, 0], e[:, 1]], np.r_[e[:, 1], e[:, 0]])),
        shape=(n, n),
    ).tocsr()


def test_degree_matches_scipy(graph_arrays, scipy_W):
    _, _, _, w = graph_arrays
    d = np.asarray(G.degree_vector(w))
    d_ref = np.asarray(scipy_W.sum(axis=1)).ravel()
    np.testing.assert_allclose(d, d_ref, rtol=2e-5)


def test_spmv_matches_scipy(graph_arrays, scipy_W):
    _, nbrs, _, w = graph_arrays
    rng = np.random.default_rng(0)
    x = rng.normal(size=(scipy_W.shape[0], 3)).astype(np.float32)
    y = np.asarray(G.spmv(nbrs, w, jnp.asarray(x)))
    y_ref = scipy_W @ x
    np.testing.assert_allclose(y, y_ref, rtol=2e-4, atol=1e-4)


def test_laplacian_matvec(graph_arrays, scipy_W):
    _, nbrs, _, w = graph_arrays
    d = np.asarray(scipy_W.sum(axis=1)).ravel()
    g = (d + 1e-8) ** -1
    L = sp.diags(g) @ (sp.diags(d) - scipy_W)
    rng = np.random.default_rng(1)
    x = rng.normal(size=scipy_W.shape[0]).astype(np.float32)
    y = np.asarray(G.laplacian_matvec(nbrs, w, jnp.asarray(g, jnp.float32), jnp.asarray(x)))
    np.testing.assert_allclose(y, L @ x, rtol=1e-3, atol=1e-5)


def test_mean_filter_matches_scipy(graph_arrays, scipy_W):
    _, nbrs, _, w = graph_arrays
    n = scipy_W.shape[0]
    D_inv = sp.diags(1.0 / (1.0 + np.asarray(scipy_W.sum(axis=1)).ravel()))
    A = D_inv @ (scipy_W + sp.eye(n))
    rng = np.random.default_rng(2)
    x = rng.normal(size=(n, 3)).astype(np.float32)
    out_ref = x.copy()
    for _ in range(25):
        out_ref = A @ out_ref
    out = np.asarray(G.mean_filter(nbrs, w, jnp.asarray(x), 25))
    np.testing.assert_allclose(out, out_ref, rtol=5e-3, atol=1e-4)


def test_sym_laplacian_similarity(graph_arrays):
    """A = diag(s) (D-W) diag(s) must be similar to L = diag(g)(D-W):
    L (s*x) == s * A(x)."""
    _, nbrs, _, w = graph_arrays
    d = G.degree_vector(w)
    g = (d + 1e-8) ** -1
    s = jnp.sqrt(g)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=d.shape[0]), jnp.float32)
    lhs = np.asarray(G.laplacian_matvec(nbrs, w, g, s * x))
    rhs = np.asarray(s * G.sym_laplacian_matvec(nbrs, w, g, x))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-3, atol=1e-5)


def test_g_vector_feature_variants(graph_arrays):
    _, _, _, w = graph_arrays
    d = G.degree_vector(w)
    n = d.shape[0]
    rng = np.random.default_rng(4)
    feats = jnp.asarray(rng.uniform(0, 1, size=(2, n)), jnp.float32)
    fw = jnp.asarray(np.diag([0.5, 2.0]), jnp.float32)
    for p in ["exp", "log", "square", "linear"]:
        g = G.g_vector(feats, d, fw, p_function=p, include_features=True)
        assert np.all(np.isfinite(np.asarray(g)))
    # Default path equals (d + eps)^-1
    g0 = np.asarray(G.g_vector(None, d, fw, include_features=False))
    np.testing.assert_allclose(g0, (np.asarray(d) + 1e-8) ** -1, rtol=1e-6)


def test_mean_filter_chebyshev_matches_exact(graph_arrays):
    """Chebyshev-accelerated smoothing == exact q-step iteration to ~1e-5
    relative (the polynomial-truncation level, ops/graph_ops.py)."""
    import jax.numpy as jnp

    from pyfocusr_tpu.ops.graph_ops import mean_filter, mean_filter_chebyshev

    pts, nbrs, _, w = graph_arrays
    for q in [40, 300]:
        exact = mean_filter(nbrs, w, pts, q)
        fast = mean_filter_chebyshev(nbrs, w, pts, q)
        err = float(jnp.max(jnp.abs(exact - fast)))
        scale = float(jnp.max(jnp.abs(exact)))
        assert err / scale < 1e-4, (q, err / scale)


def test_mean_filter_chebyshev_small_q_falls_back(graph_arrays):
    """q <= polynomial degree: returns the exact iteration."""
    import numpy as np

    from pyfocusr_tpu.ops.graph_ops import mean_filter, mean_filter_chebyshev

    pts, nbrs, _, w = graph_arrays
    exact = mean_filter(nbrs, w, pts, 5)
    fast = mean_filter_chebyshev(nbrs, w, pts, 5)
    np.testing.assert_allclose(np.asarray(exact), np.asarray(fast), rtol=1e-6)


def test_coincident_vertices_no_inf():
    """Coincident connected vertices must not produce inf/NaN weights
    (the reference divides by zero there; we clamp)."""
    import jax.numpy as jnp

    from pyfocusr_tpu.mesh import build_topology

    pts = np.array([[0, 0, 0], [0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    tris = np.array([[0, 1, 2], [1, 2, 3]], np.int32)
    topo = build_topology(tris, 4)
    w = G.edge_weights(
        jnp.asarray(pts), jnp.asarray(topo.neighbors), jnp.asarray(topo.nbr_mask)
    )
    assert np.all(np.isfinite(np.asarray(w)))
    d = G.degree_vector(w)
    assert np.all(np.isfinite(np.asarray(d)))


def test_g_vector_all_p_functions_match_transcription():
    """Every G_matrix_p_function corner ('exp'/'log'/'square'/'shift') of the
    feature G matrix matches the f64 transcription (reference
    graph.py:180-214) — the golden config-space gate covers 'exp' end to
    end; this pins the other three transforms at formula level."""
    import numpy as np

    from pyfocusr_tpu.ops import graph_ops
    from tools.reference_pipeline import reference_g_vector

    rng = np.random.default_rng(0)
    n, k = 500, 2
    feats = rng.uniform(0.0, 1.0, size=(k, n))  # normalized-feature range
    d = rng.uniform(5.0, 50.0, size=n)
    fw = np.diag([0.1, 0.7])
    for p in ("exp", "log", "square", "shift"):
        ours = np.asarray(
            graph_ops.g_vector(
                jnp.asarray(feats, jnp.float32),
                jnp.asarray(d, jnp.float32),
                jnp.asarray(fw, jnp.float32),
                p_function=p,
                include_features=True,
            ),
            np.float64,
        )
        ref = reference_g_vector(feats.T, d, fw, p)
        np.testing.assert_allclose(ours, ref, rtol=2e-5, err_msg=p)


def test_g_vector_constant_feature_zero_weighted():
    """A constant feature column (ptp 0 after transform) must contribute
    zero weight, not inf/NaN (round-3 review: use_features_in_graph with a
    uniform feature silently NaN'd the whole spectrum)."""
    import jax.numpy as jnp

    from pyfocusr_tpu.ops.graph_ops import g_vector

    rng = np.random.default_rng(0)
    n = 50
    degrees = jnp.asarray(rng.uniform(1.0, 5.0, n).astype(np.float32))
    feats = jnp.stack(
        [
            jnp.full((n,), 0.7, jnp.float32),  # constant
            jnp.asarray(rng.uniform(0, 1, n).astype(np.float32)),
        ]
    )
    fw = jnp.eye(2, dtype=jnp.float32)
    for p in ("exp", "log", "square", "shift"):
        g = g_vector(feats, degrees, fw, p_function=p, include_features=True)
        assert np.all(np.isfinite(np.asarray(g))), p
    # And the varying feature still contributes (g differs from pure d_inv).
    g = g_vector(feats, degrees, fw, p_function="exp", include_features=True)
    d_inv = np.asarray((degrees + 1e-8) ** -1)
    assert not np.allclose(np.asarray(g), d_inv)
