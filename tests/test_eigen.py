"""Eigensolver parity vs scipy ARPACK shift-invert — the contract of
reference ``recursive_eig`` (``graph.py:357-389``): k smallest nonzero
eigenpairs of the random-walk Laplacian, eigvecs up to sign."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp
from scipy.sparse.linalg import eigs

from pyfocusr_tpu.ops import graph_ops as G
from pyfocusr_tpu.ops.eigen import smallest_nonzero_eigpairs


@pytest.fixture(scope="module")
def lap_setup(mesh_5k_source, topo_5k_source):
    pts = jnp.asarray(mesh_5k_source.points)
    nbrs = jnp.asarray(topo_5k_source.neighbors)
    mask = jnp.asarray(topo_5k_source.nbr_mask)
    w = G.edge_weights(pts, nbrs, mask)
    d = G.degree_vector(w)
    g = (d + 1e-8) ** -1

    e = topo_5k_source.edges
    pts_np = np.asarray(pts)
    dist = np.linalg.norm(pts_np[e[:, 0]] - pts_np[e[:, 1]], axis=1)
    wij = 1.0 / dist
    n = pts_np.shape[0]
    W = sp.coo_matrix(
        (np.r_[wij, wij], (np.r_[e[:, 0], e[:, 1]], np.r_[e[:, 1], e[:, 0]])),
        shape=(n, n),
    ).tocsc()
    dnp = np.asarray(W.sum(axis=1)).ravel()
    L = sp.diags((dnp + 1e-8) ** -1) @ (sp.diags(dnp) - W)
    return nbrs, w, g, L


def test_eigpairs_match_arpack(lap_setup):
    nbrs, w, g, L = lap_setup
    k = 6
    ev, evec = eigs(L, k=k + 1, sigma=1e-10, which="LM", ncv=4 * (k + 1))
    keep = np.where(ev.real > 1e-10)[0]
    order = np.argsort(ev.real[keep])
    ev_ref = ev.real[keep][order][:k]
    evec_ref = evec.real[:, keep][:, order][:, :k]

    s = jnp.sqrt(g)

    def matvec(x):
        return G.sym_laplacian_matvec(nbrs, w, g, x)

    lams, vecs, resid = smallest_nonzero_eigpairs(
        matvec, s, 1.0 / s, k=k, key=jax.random.PRNGKey(0)
    )
    lams = np.asarray(lams)
    vecs = np.asarray(vecs)
    np.testing.assert_allclose(lams, ev_ref, rtol=1e-2)
    for c in range(k):
        ref = evec_ref[:, c] / np.linalg.norm(evec_ref[:, c])
        cos = abs(float(ref @ vecs[:, c]))
        assert cos > 0.999, f"eigvec {c}: |cos|={cos}"
    assert np.all(np.asarray(resid) < 1e-2)


def test_eigvals_ascending_and_positive(lap_setup):
    nbrs, w, g, _ = lap_setup
    s = jnp.sqrt(g)

    def matvec(x):
        return G.sym_laplacian_matvec(nbrs, w, g, x)

    lams, _, _ = smallest_nonzero_eigpairs(
        matvec, s, 1.0 / s, k=4, key=jax.random.PRNGKey(7)
    )
    lams = np.asarray(lams)
    assert np.all(lams > 1e-10)
    assert np.all(np.diff(lams) >= -1e-9)


def test_wide_matches_narrow_on_hub_mesh():
    """Wide-block solver (round 2 default for >= 2048 vertices) on a mesh
    with HUB vertices (UV-sphere poles touch a full ring, so with the
    default degree cap their extra edges ride the overflow scatter path —
    exercised here through the fused filter-operator factory)."""
    import sys

    from functools import partial

    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from test_curvature_icp import make_sphere

    import jax

    from pyfocusr_tpu.mesh import TriMesh
    from pyfocusr_tpu.pipeline import (
        PipelineConfig,
        _spectrum,
        mesh_to_graph_arrays,
    )

    pts, tris = make_sphere(n_theta=34, n_phi=80)  # ~2700 verts, poles deg 80
    mesh = TriMesh(jnp.asarray(pts, jnp.float32), jnp.asarray(tris))
    g = mesh_to_graph_arrays(mesh)
    assert g.n_points >= 2048  # wide path active
    assert g.overflow.shape[0] > 0  # hub overflow present

    @partial(jax.jit, static_argnames=("k", "cfg"))
    def eig(gph, k, key, cfg):
        lams, vecs, _ = _spectrum(gph, k, key, cfg)
        return lams, vecs

    lw, vw = eig(g, 6, jax.random.PRNGKey(0), PipelineConfig())
    ln, vn = eig(
        g, 6, jax.random.PRNGKey(0),
        PipelineConfig(eig_method="chebyshev-narrow"),
    )
    lw, ln = np.asarray(lw, np.float64), np.asarray(ln, np.float64)
    np.testing.assert_allclose(lw, ln, rtol=2e-3)
    vw, vn = np.asarray(vw, np.float64), np.asarray(vn, np.float64)
    cos = np.abs(
        (vw * vn).sum(0)
        / (np.linalg.norm(vw, axis=0) * np.linalg.norm(vn, axis=0))
    )
    # The sphere's eigvalues come in degenerate multiplets (rotational
    # symmetry), so per-vector cos can rotate within a multiplet; compare
    # subspace overlap instead.
    M = vw.T @ vn
    sv = np.linalg.svd(M / np.linalg.norm(vw, axis=0)[:, None] / np.linalg.norm(vn, axis=0)[None, :], compute_uv=False)
    assert sv.min() > 0.99, (sv, cos)


def test_spectrum_warm_start_block(mesh_5k_source):
    """``_spectrum``'s warm-start hooks: ``return_block=True`` returns the
    final filtered block without changing the eigenpairs, and re-seeding a
    solve with that block (``x0=``) converges in a single chunk to the same
    spectrum — the basis of the cross-mesh warm start."""
    from functools import partial

    from pyfocusr_tpu.pipeline import (
        PipelineConfig,
        _spectrum,
        mesh_to_graph_arrays,
    )

    g = mesh_to_graph_arrays(mesh_5k_source)
    cfg = PipelineConfig()
    key = jax.random.PRNGKey(0)

    @partial(jax.jit, static_argnames=("k", "cfg"))
    def eig_blk(gph, k, key, cfg):
        lams, vecs, _, blk = _spectrum(gph, k, key, cfg, return_block=True)
        return lams, vecs, blk

    @partial(jax.jit, static_argnames=("k", "cfg", "chunks"))
    def eig_warm(gph, k, key, cfg, x0, chunks):
        lams, vecs, _ = _spectrum(gph, k, key, cfg, x0=x0, chunks=chunks)
        return lams, vecs

    lams_c, vecs_c, blk = eig_blk(g, 6, key, cfg)
    assert blk.shape == (g.n_points, cfg.eig_wide_block)

    # return_block must not perturb the solve itself
    @partial(jax.jit, static_argnames=("k", "cfg"))
    def eig_plain(gph, k, key, cfg):
        lams, vecs, _ = _spectrum(gph, k, key, cfg)
        return lams, vecs
    lams_p, vecs_p = eig_plain(g, 6, key, cfg)
    np.testing.assert_array_equal(np.asarray(lams_c), np.asarray(lams_p))
    np.testing.assert_array_equal(np.asarray(vecs_c), np.asarray(vecs_p))

    # Self warm start: one chunk from the converged block reproduces the
    # spectrum (different key stream from the cold run, so compare loosely).
    lams_w, vecs_w = eig_warm(g, 6, jax.random.PRNGKey(1), cfg, blk, 1)
    np.testing.assert_allclose(
        np.asarray(lams_w), np.asarray(lams_c), rtol=1e-3
    )
    vc = np.asarray(vecs_c, np.float64)
    vw = np.asarray(vecs_w, np.float64)
    cos = np.abs(
        (vc * vw).sum(0)
        / (np.linalg.norm(vc, axis=0) * np.linalg.norm(vw, axis=0))
    )
    assert cos.min() > 0.999, cos


def test_warm_start_residual_safeguard(lap_setup):
    """ADVICE r3 (medium): a truncated warm schedule fed a USELESS seed must
    not silently return under-converged eigenvectors.  The wide solver's
    residual-gated top-up (``extra_chunks``) detects the high residual
    (~4.5e-3 * lam_max after 2 cold chunks vs 2.4e-5 for a good warm seed —
    see PipelineConfig.eig_warm_resid_tol calibration) and runs extra filter
    chunks until it passes the tolerance."""
    from pyfocusr_tpu.ops.eigen import chebyshev_eigpairs_wide

    nbrs, w, g, _ = lap_setup
    s = jnp.sqrt(g)
    n = int(s.shape[0])

    def matvec(x):
        return G.sym_laplacian_matvec(nbrs, w, g, x)

    k = 6
    key = jax.random.PRNGKey(0)

    # Reference: full cold schedule.
    l_full, v_full, r_full = chebyshev_eigpairs_wide(
        matvec, 1.0 / s, key, k, chunks=5
    )
    # Garbage warm seed (no shared subspace), truncated schedule, NO top-up:
    # under-converged.
    x0_bad = jax.random.normal(jax.random.PRNGKey(9), (n, 128))
    l_bad, v_bad, r_bad = chebyshev_eigpairs_wide(
        matvec, 1.0 / s, jax.random.PRNGKey(1), k, chunks=2, x0=x0_bad
    )

    # Same garbage seed WITH the top-up: self-heals to full-schedule quality.
    l_fix, v_fix, r_fix = chebyshev_eigpairs_wide(
        matvec, 1.0 / s, jax.random.PRNGKey(1), k, chunks=2, x0=x0_bad,
        extra_chunks=3,
    )

    assert float(jnp.max(r_fix)) < 0.2 * float(jnp.max(r_bad)), (
        np.asarray(r_bad), np.asarray(r_fix)
    )
    np.testing.assert_allclose(
        np.asarray(l_fix), np.asarray(l_full), rtol=1e-3
    )
    vf = np.asarray(v_full, np.float64)
    vx = np.asarray(v_fix, np.float64)
    vf /= np.linalg.norm(vf, axis=0)
    vx /= np.linalg.norm(vx, axis=0)
    sv = np.linalg.svd(vf.T @ vx, compute_uv=False)
    assert sv.min() > 0.999, sv

    # A GOOD warm seed (the converged eigvecs themselves padded to block
    # width) must PASS the residual gate immediately — the top-up loop's
    # condition is already false at entry, so results match the no-top-up
    # call bit-for-bit (the while_loop body never executes).
    x0_good = jnp.concatenate(
        [v_full, jax.random.normal(jax.random.PRNGKey(3), (n, 128 - k))],
        axis=1,
    )
    l_w0, v_w0, _ = chebyshev_eigpairs_wide(
        matvec, 1.0 / s, jax.random.PRNGKey(1), k, chunks=2, x0=x0_good
    )
    l_w1, v_w1, _ = chebyshev_eigpairs_wide(
        matvec, 1.0 / s, jax.random.PRNGKey(1), k, chunks=2, x0=x0_good,
        extra_chunks=3,
    )
    np.testing.assert_array_equal(np.asarray(l_w0), np.asarray(l_w1))
    np.testing.assert_array_equal(np.asarray(v_w0), np.asarray(v_w1))
