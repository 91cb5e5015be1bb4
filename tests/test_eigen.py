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
