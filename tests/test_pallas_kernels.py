"""Pallas kernels (interpret mode on CPU) vs the dense reference E-step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyfocusr_tpu.ops.cpd import _estep, gaussian_kernel
from pyfocusr_tpu.ops.pallas_kernels import (
    cpd_estep_pallas,
    cpd_estep_tiled,
    gaussian_matvec_tiled,
)


@pytest.fixture(scope="module")
def clouds():
    rng = np.random.default_rng(0)
    M, N, D = 700, 900, 3
    X = jnp.asarray(rng.uniform(-1, 1, (N, D)), jnp.float32)
    TY = jnp.asarray(rng.uniform(-1, 1, (M, D)), jnp.float32)
    return X, TY


class TestEstep:
    def test_tiled_matches_dense(self, clouds):
        X, TY = clouds
        ref = _estep(X, TY, 0.05, 0.0)
        out = cpd_estep_tiled(X, TY, 0.05, 0.0, tile_m=256)
        for a, b in zip(ref, out):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)

    def test_pallas_interpret_matches_dense(self, clouds):
        X, TY = clouds
        ref = _estep(X, TY, 0.05, 0.0)
        out = cpd_estep_pallas(X, TY, 0.05, 0.0, tile_m=256, tile_n=256, interpret=True)
        for a, b in zip(ref, out):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)

    def test_with_outlier_term(self, clouds):
        X, TY = clouds
        s2 = 0.05
        w = 0.1
        M, (N, D) = TY.shape[0], X.shape
        c = (2 * np.pi * s2) ** (D / 2) * (w / (1 - w)) * (M / N)
        ref = _estep(X, TY, s2, w)
        out = cpd_estep_tiled(X, TY, s2, c, tile_m=256)
        for a, b in zip(ref, out):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)

    def test_nonsquare_padding(self):
        rng = np.random.default_rng(1)
        X = jnp.asarray(rng.uniform(-1, 1, (513, 3)), jnp.float32)
        TY = jnp.asarray(rng.uniform(-1, 1, (258, 3)), jnp.float32)
        ref = _estep(X, TY, 0.1, 0.0)
        out = cpd_estep_pallas(X, TY, 0.1, 0.0, tile_m=128, tile_n=128, interpret=True)
        for a, b in zip(ref, out):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_gaussian_matvec_tiled(clouds):
    _, TY = clouds
    rng = np.random.default_rng(2)
    V = jnp.asarray(rng.normal(size=(TY.shape[0], 5)), jnp.float32)
    ref = gaussian_kernel(TY, TY, 1.3) @ V
    out = gaussian_matvec_tiled(TY, 1.3, V, tile=256)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)


@pytest.mark.slow
def test_fullres_cpd_matches_dense_small():
    """estep_impl='tiled' inside the EM loop == dense EM loop."""
    from pyfocusr_tpu.ops.cpd import _deformable_cpd_run, low_rank_gaussian

    rng = np.random.default_rng(0)
    M = 500
    Y = jnp.asarray(rng.uniform(-1, 1, (M, 3)), jnp.float32)
    X = Y + 0.1 * jnp.sin(2 * Y[:, [1, 2, 0]])
    Q, lam = low_rank_gaussian(Y, 1.5, 60, jax.random.PRNGKey(0))
    # Short trajectory: f32 reduction-order differences between the dense
    # and tiled E-step compound through the EM map as sigma^2 shrinks, so
    # long-horizon bitwise comparison is ill-posed (same caveat as the CPD
    # oracle tests).
    TY_dense, _, s2_dense, _ = _deformable_cpd_run(
        X, Y, Q, lam, 2.0, 8, 0.0, estep_impl="dense"
    )
    TY_tiled, _, s2_tiled, _ = _deformable_cpd_run(
        X, Y, Q, lam, 2.0, 8, 0.0, estep_impl="tiled"
    )
    np.testing.assert_allclose(
        np.asarray(TY_dense), np.asarray(TY_tiled), atol=1e-3
    )
    assert abs(float(s2_dense) - float(s2_tiled)) < 1e-5


def test_sinkhorn_duals_streamed_matches_xla():
    """The Pallas row-streamed Sinkhorn dual updates (interpret mode on CPU)
    match the XLA log-domain implementation."""
    from pyfocusr_tpu.ops.assignment import _sinkhorn_duals
    from pyfocusr_tpu.ops.pallas_kernels import sinkhorn_duals_streamed

    rng = np.random.default_rng(0)
    a = rng.normal(size=(300, 3))
    b = a + 0.02 * rng.normal(size=a.shape)
    from scipy.spatial.distance import cdist

    C = jnp.asarray(cdist(a, b), jnp.float32)
    spread = float(jnp.max(C) - jnp.min(C))
    f1, g1 = _sinkhorn_duals(C, spread / 4.0, 1.0 / 3.0, 6, 5)
    f2, g2 = sinkhorn_duals_streamed(
        C, jnp.float32(spread / 4.0), 1.0 / 3.0, 6, 5, tile_r=128,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), atol=2e-4)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=2e-4)

    # The bf16 cost stream (the production TPU warm-start path,
    # assignment.sinkhorn_jv_lap) quantizes the cost to ~0.4% of its
    # range; duals must stay within a few quantization steps of the f32
    # ones — warm-start quality, not exactness, is all that's at stake.
    f3, g3 = sinkhorn_duals_streamed(
        C, jnp.float32(spread / 4.0), 1.0 / 3.0, 6, 5, tile_r=128,
        interpret=True, cost_dtype=jnp.bfloat16,
    )
    q = spread / 256.0  # one bf16 mantissa step at the cost's scale
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f3), atol=4 * q)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g3), atol=4 * q)

    # init= resumes a partially-annealed schedule: running the 6-level
    # schedule as 4 levels + a 2-level resume reproduces the single-run
    # duals to f32 roundoff (the resumed phase recomputes its starting
    # temperature as T0*factor^4, rounded differently than the single
    # run's factor**arange — same schedule, ~1-ulp temperature skew) —
    # the invariant the mixed-precision production split relies on.
    fa, ga = sinkhorn_duals_streamed(
        C, jnp.float32(spread / 4.0), 1.0 / 3.0, 4, 5, tile_r=128,
        interpret=True,
    )
    fb, gb = sinkhorn_duals_streamed(
        C, jnp.float32(spread / 4.0 / 3.0**4), 1.0 / 3.0, 2, 5,
        tile_r=128, interpret=True, init=(fa, ga),
    )
    np.testing.assert_allclose(np.asarray(f2), np.asarray(fb), atol=1e-6)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(gb), atol=1e-6)

    # f32_tail_levels performs that same split internally (the production
    # mixed-precision recipe): bf16 head + f32 tail == manual phases.
    fh, gh = sinkhorn_duals_streamed(
        C, jnp.float32(spread / 4.0), 1.0 / 3.0, 6, 5, tile_r=128,
        interpret=True, cost_dtype=jnp.bfloat16, f32_tail_levels=2,
    )
    fm, gm = sinkhorn_duals_streamed(
        C, jnp.float32(spread / 4.0), 1.0 / 3.0, 4, 5, tile_r=128,
        interpret=True, cost_dtype=jnp.bfloat16,
    )
    fm, gm = sinkhorn_duals_streamed(
        C, jnp.float32(spread / 4.0 / 3.0**4), 1.0 / 3.0, 2, 5,
        tile_r=128, interpret=True, init=(fm, gm),
    )
    np.testing.assert_allclose(np.asarray(fh), np.asarray(fm), atol=1e-6)
    np.testing.assert_allclose(np.asarray(gh), np.asarray(gm), atol=1e-6)

    # levels=0 returns well-formed zero duals for ANY tail setting — the
    # public sinkhorn_jv_lap(levels=0) path crashed on this before the
    # split moved inside the wrapper (g stayed None).
    f0, g0 = sinkhorn_duals_streamed(
        C, jnp.float32(spread / 4.0), 1.0 / 3.0, 0, 5, tile_r=128,
        interpret=True, cost_dtype=jnp.bfloat16, f32_tail_levels=3,
    )
    assert f0.shape == (C.shape[0],) and not np.any(np.asarray(g0))


def test_jv_device_pallas_interpret_matches_scipy():
    """The VMEM-resident Dijkstra kernel (interpret mode on CPU) is EXACT:
    same objective and indices as scipy's JV on a random cost."""
    from scipy.optimize import linear_sum_assignment

    from pyfocusr_tpu.ops.assignment import _bulk_match
    from pyfocusr_tpu.ops.pallas_kernels import jv_device_pallas

    rng = np.random.default_rng(0)
    n = 96
    cost = jnp.asarray(rng.random((n, n)), jnp.float32)
    v0 = jnp.zeros((n,), jnp.float32)
    u0, r4c0, c4r0 = _bulk_match(cost, v0)
    col, steps = jv_device_pallas(
        cost, u0, v0, r4c0, c4r0, 60 * n, n, interpret=True
    )
    col = np.asarray(col)
    assert sorted(col) == list(range(n))
    ri, ci = linear_sum_assignment(np.asarray(cost))
    obj = np.asarray(cost)[np.arange(n), col].sum()
    obj_ref = np.asarray(cost)[ri, ci].sum()
    assert abs(obj - obj_ref) < 1e-5 * max(obj_ref, 1.0), (obj, obj_ref)


def test_jv_device_pallas_interpret_warm_started():
    """With Sinkhorn-style warm duals (arbitrary feasible v0) the kernel
    still returns the exact optimum."""
    from scipy.optimize import linear_sum_assignment

    from pyfocusr_tpu.ops.assignment import _bulk_match
    from pyfocusr_tpu.ops.pallas_kernels import jv_device_pallas

    rng = np.random.default_rng(3)
    n = 64
    A = rng.normal(size=(n, 3))
    B = A[rng.permutation(n)] + rng.normal(size=(n, 3)) * 0.01
    cost = jnp.asarray(
        np.linalg.norm(A[:, None, :] - B[None, :, :], axis=-1), jnp.float32
    )
    v0 = jnp.asarray(rng.normal(size=n) * 0.01, jnp.float32)
    u0, r4c0, c4r0 = _bulk_match(cost, v0)
    col, _ = jv_device_pallas(cost, u0, v0, r4c0, c4r0, 60 * n, n, interpret=True)
    ri, ci = linear_sum_assignment(np.asarray(cost))
    obj = np.asarray(cost)[np.arange(n), np.asarray(col)].sum()
    obj_ref = np.asarray(cost)[ri, ci].sum()
    assert abs(obj - obj_ref) < 1e-5 * max(obj_ref, 1.0), (obj, obj_ref)


class TestKnnPallas:
    """Direct coordinate-difference KNN kernel vs scipy cKDTree."""

    def _check(self, nq, nr, d, k, seed=0, **kw):
        from scipy.spatial import cKDTree

        from pyfocusr_tpu.ops.pallas_kernels import knn_pallas

        rng = np.random.default_rng(seed)
        q = rng.normal(size=(nq, d)).astype(np.float32)
        r = rng.normal(size=(nr, d)).astype(np.float32)
        dist, idx = knn_pallas(
            jnp.asarray(r), jnp.asarray(q), k, interpret=True, **kw
        )
        sd, si = cKDTree(r).query(q, k=k)
        if k == 1:
            sd, si = sd[:, None], si[:, None]
        np.testing.assert_allclose(np.asarray(dist), sd, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(idx), si)

    def test_nn_small_d3(self):
        self._check(300, 500, 3, 1, block_q=64, block_r=256)

    def test_knn3_small_d3(self):
        self._check(300, 500, 3, 3, block_q=64, block_r=256)

    def test_unaligned_sizes_d12(self):
        # nq/nr not multiples of the blocks; D padded 12 -> 16.
        self._check(77, 2049, 12, 3, block_q=64, block_r=256)

    def test_tiny_ref(self):
        self._check(8, 9, 2, 3, block_q=8, block_r=256)

    def test_tie_break_lower_index_first(self):
        from pyfocusr_tpu.ops.pallas_kernels import knn_pallas

        rng = np.random.default_rng(1)
        r = np.repeat(rng.normal(size=(50, 3)), 2, axis=0).astype(np.float32)
        q = r[::2].copy()
        _, i = knn_pallas(
            jnp.asarray(r), jnp.asarray(q), 2, block_q=8, block_r=256,
            interpret=True,
        )
        i = np.asarray(i)
        np.testing.assert_array_equal(i[:, 0], np.arange(0, 100, 2))
        np.testing.assert_array_equal(i[:, 1], np.arange(1, 100, 2))

    def test_vmap_batches(self):
        from functools import partial

        from scipy.spatial import cKDTree

        from pyfocusr_tpu.ops.pallas_kernels import knn_pallas

        rng = np.random.default_rng(2)
        qb = rng.normal(size=(3, 60, 3)).astype(np.float32)
        rb = rng.normal(size=(3, 90, 3)).astype(np.float32)
        f = jax.vmap(
            partial(knn_pallas, k=3, block_q=32, block_r=256, interpret=True)
        )
        db, ib = f(jnp.asarray(rb), jnp.asarray(qb))
        for b in range(3):
            sd, si = cKDTree(rb[b]).query(qb[b], k=3)
            np.testing.assert_allclose(np.asarray(db[b]), sd, atol=1e-5)
            np.testing.assert_array_equal(np.asarray(ib[b]), si)

    def test_guards(self):
        from pyfocusr_tpu.ops.pallas_kernels import knn_pallas

        r = jnp.zeros((10, 17), jnp.float32)
        with pytest.raises(ValueError, match="D<=16"):
            knn_pallas(r, r, 1)
        r3 = jnp.zeros((2, 3), jnp.float32)
        with pytest.raises(ValueError, match="reference points"):
            knn_pallas(r3, r3, 3)


def test_pallas_chunked_query_plumbing(monkeypatch):
    """_pallas_chunked splits the query axis (unrolled, NOT lax.map — a
    pallas_call under lax.map faults the remote worker at multi-million
    scale) and reassembles exact results; forced small grid bound +
    interpret-mode kernel so it runs on CPU."""
    import pyfocusr_tpu.ops.knn as knn
    import pyfocusr_tpu.ops.pallas_kernels as pk

    orig = pk.knn_pallas
    monkeypatch.setattr(
        pk, "knn_pallas", lambda r, q, k: orig(r, q, k, interpret=True)
    )
    monkeypatch.setattr(knn, "_PALLAS_MAX_GRID_CELLS", 8)
    rng = np.random.default_rng(0)
    ref = jnp.asarray(rng.normal(size=(3000, 3)).astype(np.float32))
    q = jnp.asarray(rng.normal(size=(2900, 3)).astype(np.float32))
    d, i = knn._pallas_chunked(ref, q, 3)
    assert d.shape == (2900, 3) and i.shape == (2900, 3)
    d2, i2 = knn._knn_query_impl(ref, q, 3)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i2))
    # direct-difference vs matmul-identity distance rounding
    np.testing.assert_allclose(np.asarray(d), np.asarray(d2), atol=1e-4)


class TestKnnPallasContract:
    """Round-3 review: XLA-path contract parity on the Pallas kernel
    (interpret mode) — NaN reference rows must never poison a tile, and
    missing neighbors report cKDTree's (index == nr, inf) sentinel."""

    def test_nan_ref_row_does_not_poison_tile(self):
        import jax.numpy as jnp

        from pyfocusr_tpu.ops.pallas_kernels import knn_pallas

        rng = np.random.default_rng(0)
        ref = rng.normal(size=(40, 3)).astype(np.float32)
        ref[7] = np.nan  # one bad row
        query = ref[[3, 20, 33]] + 1e-4
        d, i = knn_pallas(jnp.asarray(ref), jnp.asarray(query), k=1,
                          interpret=True)
        np.testing.assert_array_equal(np.asarray(i)[:, 0], [3, 20, 33])
        assert np.all(np.asarray(d) < 1e-3)

    def test_missing_neighbor_sentinel(self):
        import jax.numpy as jnp

        from pyfocusr_tpu.ops.knn import SENTINEL
        from pyfocusr_tpu.ops.pallas_kernels import knn_pallas

        # Only 2 selectable rows but k=3: the third slot must be
        # (index == nr, distance == inf), exactly like the XLA path.
        ref = np.asarray(
            [[0, 0, 0], [1, 0, 0], [SENTINEL] * 3, [SENTINEL] * 3],
            np.float32,
        )
        query = np.zeros((1, 3), np.float32)
        d, i = knn_pallas(jnp.asarray(ref), jnp.asarray(query), k=3,
                          interpret=True)
        d, i = np.asarray(d), np.asarray(i)
        np.testing.assert_array_equal(i[0, :2], [0, 1])
        assert i[0, 2] == ref.shape[0]
        assert np.isinf(d[0, 2])
