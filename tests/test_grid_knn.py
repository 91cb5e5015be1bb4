"""Voxel-grid exact KNN (ops/grid_knn.py) vs the brute kernels and scipy
cKDTree.  The grid path is a pure perf rerouting of ``knn_query`` for
large untraced 3-D queries — every contract detail (tie rule, masked
rows, missing neighbors, out-of-bbox queries) must match the brute path
it replaces (SURVEY §2.3 cKDTree row)."""

import json
import os

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.spatial import KDTree

from pyfocusr_tpu.ops.knn import SENTINEL, _brute_knn, knn_query, nn_query
from pyfocusr_tpu.ops.grid_knn import knn_grid


def _surface_cloud(n, seed, scale=10.0, noise=0.05):
    rng = np.random.default_rng(seed)
    u = rng.normal(size=(n, 3))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    return (u * scale + rng.normal(scale=noise, size=(n, 3))).astype(
        np.float32
    )


class TestGridKNN:
    def _mk(self, n=30000, nq=20000, seed=0):
        rng = np.random.default_rng(seed)
        r = _surface_cloud(n, seed)
        r[100:150] = r[0:50]  # exact duplicates -> distance ties
        mask = np.ones(n, np.float32)
        mask[-500:] = 0.0
        r_q = np.where(mask[:, None] > 0, r, SENTINEL).astype(np.float32)
        q = (
            r[rng.integers(0, n, nq)]
            + rng.normal(scale=0.02, size=(nq, 3))
        ).astype(np.float32)
        q[:50] = r[200:250]  # exact hits
        q[50:60] = 100.0  # far outside the reference bbox
        return r, r_q, mask, q

    @pytest.mark.parametrize("k", [1, 3])
    def test_matches_brute_and_kdtree(self, k):
        r, r_q, mask, q = self._mk()
        dg, ig = knn_grid(jnp.asarray(r_q), jnp.asarray(q), k)
        db, ib = _brute_knn(jnp.asarray(r_q), jnp.asarray(q), k)
        ig_, ib_ = np.asarray(ig), np.asarray(ib)
        # f32-identical computations everywhere except genuinely ulp-tied
        # neighbors (the brute matmul identity rounds differently).
        assert (ig_ == ib_).mean() > 0.999
        # Grid distances are direct f32 differences — accurate vs the f64
        # KDTree ground truth (the CPU brute path's matmul identity is the
        # noisy one near zero).
        tree = KDTree(r[mask > 0].astype(np.float64))
        remap = np.nonzero(mask > 0)[0]
        dk, ik = tree.query(q.astype(np.float64), k=k)
        dk = dk.reshape(len(q), k)
        err = np.abs(np.asarray(dg) - dk)
        # Grid-exact rows are direct f32 differences: tight vs f64.  The
        # rare brute-fallback rows and f32 near-tie swaps are bounded by
        # the brute kernel's own cancellation noise.
        assert np.quantile(err, 0.999) < 2e-4
        np.testing.assert_allclose(np.asarray(dg), dk, atol=5e-3)
        assert (ig_ == remap[ik.reshape(len(q), k)]).mean() > 0.995

    def test_tie_rule_lowest_index(self):
        # 4 identical reference points; the grid must return ascending
        # original indices (the cKDTree/brute tie rule).
        r = np.zeros((16, 3), np.float32)
        r[4:] = np.arange(12)[:, None] + 5.0
        q = np.zeros((4, 3), np.float32)
        d, i = knn_grid(jnp.asarray(r), jnp.asarray(q), 3)
        np.testing.assert_array_equal(
            np.asarray(i), np.tile([0, 1, 2], (4, 1))
        )
        np.testing.assert_allclose(np.asarray(d), 0.0)

    def test_tiny_and_degenerate_refs_fall_back(self):
        q = np.random.default_rng(1).random((64, 3)).astype(np.float32)
        # fewer valid refs than the brute-fallback floor
        r = np.full((10, 3), SENTINEL, np.float32)
        r[0] = (0.5, 0.5, 0.5)
        d, i = knn_grid(jnp.asarray(r), jnp.asarray(q), 3)
        db, ib = _brute_knn(jnp.asarray(r), jnp.asarray(q), 3)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ib))
        # all reference points identical -> zero spacing -> brute fallback
        r2 = np.ones((5000, 3), np.float32)
        d2, i2 = knn_grid(jnp.asarray(r2), jnp.asarray(q), 1)
        db2, ib2 = _brute_knn(jnp.asarray(r2), jnp.asarray(q), 1)
        np.testing.assert_array_equal(np.asarray(i2), np.asarray(ib2))

    def test_nonuniform_density_exercises_fallback(self):
        # A dense cluster (forces candidate-cap overflow) plus a sparse
        # shell (forces d_k > slab margin) — both certified-fallback paths.
        rng = np.random.default_rng(3)
        dense = rng.normal(scale=0.001, size=(5000, 3)).astype(np.float32)
        sparse = _surface_cloud(2000, 4, scale=50.0, noise=5.0)
        r = np.concatenate([dense, sparse])
        q = np.concatenate(
            [
                rng.normal(scale=0.001, size=(500, 3)).astype(np.float32),
                _surface_cloud(500, 5, scale=50.0, noise=5.0),
            ]
        )
        dg, ig = knn_grid(jnp.asarray(r), jnp.asarray(q), 3)
        db, ib = _brute_knn(jnp.asarray(r), jnp.asarray(q), 3)
        assert (np.asarray(ig) == np.asarray(ib)).mean() > 0.999
        tree = KDTree(r.astype(np.float64))
        dk, _ = tree.query(q.astype(np.float64), k=3)
        # Overflowed/sparse rows resolve through the brute fallback, whose
        # matmul-identity distances carry ~|coord|^2*eps cancellation noise.
        np.testing.assert_allclose(np.asarray(dg), dk, rtol=2e-3, atol=5e-4)

    def test_routing_env_override(self, monkeypatch):
        # Small sizes never route by default; PYFOCUSR_TPU_KNN_GRID=on
        # forces the grid, =off forbids it even above the pair threshold.
        r, r_q, _, q = self._mk(n=4000, nq=1000, seed=7)
        monkeypatch.setenv("PYFOCUSR_TPU_KNN_GRID", "on")
        d_on, i_on = knn_query(jnp.asarray(r_q), jnp.asarray(q), 3)
        dn_on, in_on = nn_query(jnp.asarray(r_q), jnp.asarray(q))
        monkeypatch.setenv("PYFOCUSR_TPU_KNN_GRID", "off")
        d_off, i_off = knn_query(jnp.asarray(r_q), jnp.asarray(q), 3)
        assert (np.asarray(i_on) == np.asarray(i_off)).mean() > 0.999
        assert (np.asarray(in_on) == np.asarray(i_off)[:, 0]).mean() > 0.999
        assert np.asarray(dn_on).ndim == 1

    def test_exact_256_column_certified_to_fallback(self):
        # A (x, y) column of EXACTLY _MAX_COL = 256 reference rows: the
        # 8-step unrolled z-search cannot converge on a span of 256 (it
        # distinguishes only 256 of the 257 possible answers), so before
        # the >= fix the row was certified exact with the true nearest
        # neighbor silently dropped — knn_grid returned a decoy from the
        # neighboring column at 40x the true distance.
        lat = np.stack(
            np.meshgrid(
                np.arange(40.0), np.arange(40.0), np.arange(40.0),
                indexing="ij",
            ),
            axis=-1,
        ).reshape(-1, 3)
        col = np.zeros((256, 3))
        col[:, 0] = col[:, 1] = 20.3
        col[0, 2] = 20.02  # the true NN of the query
        col[1:, 2] = 22.6  # 255 rows two z-cells up, same column
        ref = np.concatenate([lat, col]).astype(np.float32)
        q = np.array([[20.3, 20.3, 20.01]], np.float32)
        d, i = knn_grid(jnp.asarray(ref), jnp.asarray(q), 1)
        # The row must be certified to the fallback and return the true
        # neighbor (the fallback's matmul-identity distance carries
        # ~|coord|^2*eps cancellation noise, so only the index is tight).
        assert int(np.asarray(i)[0, 0]) == lat.shape[0]  # col[0]
        assert float(np.asarray(d)[0, 0]) < 0.05

    def test_zsearch_span_convergence_bound(self):
        # The certificate's column budget must match what the unrolled
        # search can actually converge: every span <= 255 resolves every
        # target; a span of 256 provably cannot (pigeonhole), which is
        # why col_too_long flags >= _MAX_COL.
        from pyfocusr_tpu.ops.grid_knn import _MAX_COL, _lower_bound_z

        span = _MAX_COL - 1
        cz = jnp.arange(span, dtype=jnp.int32)
        tgt = jnp.arange(span + 1, dtype=jnp.int32)[:, None]
        lo = jnp.zeros_like(tgt)
        hi = jnp.full_like(tgt, span)
        got = _lower_bound_z(cz, lo, hi, tgt)
        np.testing.assert_array_equal(
            np.asarray(got)[:, 0], np.arange(span + 1)
        )

    def test_empty_query(self):
        r = _surface_cloud(1000, 11)
        d, i = knn_grid(jnp.asarray(r), jnp.zeros((0, 3), np.float32), 3)
        assert d.shape == (0, 3) and i.shape == (0, 3)

    def test_early_returns_refresh_last_stats(self):
        # last_stats documents "the most recent call" — the early-return
        # paths (empty query, too-few-finite-rows brute route) must not
        # leave the previous call's diagnostics behind.
        from pyfocusr_tpu.ops.grid_knn import last_stats

        r = _surface_cloud(4000, 12)
        q = _surface_cloud(2000, 13)
        knn_grid(jnp.asarray(r), jnp.asarray(q), 1)
        assert last_stats["n_query"] == 2000
        knn_grid(jnp.asarray(r), jnp.zeros((0, 3), np.float32), 3)
        assert last_stats["n_query"] == 0
        assert last_stats["fallback_rows"] == 0
        tiny = jnp.asarray(_surface_cloud(4, 14))
        knn_grid(tiny, jnp.asarray(q), 3)
        assert last_stats["n_ref"] == 4
        assert last_stats["fallback_fraction"] == 1.0

    def test_under_jit_never_routes_to_grid(self, monkeypatch):
        # Tracers cannot take the host-orchestrated path even when forced.
        import jax

        monkeypatch.setenv("PYFOCUSR_TPU_KNN_GRID", "on")
        r = _surface_cloud(2000, 8)
        q = _surface_cloud(300, 9)

        @jax.jit
        def f(r, q):
            return knn_query(r, q, 3)

        d, i = f(jnp.asarray(r), jnp.asarray(q))
        db, ib = _brute_knn(jnp.asarray(r), jnp.asarray(q), 3)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ib))


class TestMeasuredRouting:
    """Race-once-per-bucket planner (ops/knn_routing.py, VERDICT r3 #5):
    inside the ambiguous pair-count band both paths run once, get timed,
    and the winner is persisted per device kind."""

    def _mk(self, n, nq, seed):
        rng = np.random.default_rng(seed)
        r = _surface_cloud(n, seed)
        q = _surface_cloud(nq, seed + 1)
        return jnp.asarray(r), jnp.asarray(q)

    def test_race_records_winner_and_reuses_it(self, tmp_path, monkeypatch):
        import pyfocusr_tpu.ops.knn_routing as kr
        from pyfocusr_tpu.ops.knn import knn_query

        monkeypatch.setenv("PYFOCUSR_TPU_CAL_DIR", str(tmp_path))
        # Shrink the band so a small query lands inside it: 4000*1000 =
        # 4e6 pairs; band = [1e6, 1e12).
        monkeypatch.setenv("PYFOCUSR_TPU_KNN_GRID_MIN_PAIRS", "1e6")
        monkeypatch.setenv("PYFOCUSR_TPU_KNN_GRID_SURE_PAIRS", "1e12")
        kr._MEM.clear()

        r, q = self._mk(4000, 1000, 3)
        d1, i1 = knn_query(r, q, 3)
        path = kr.cache_file()
        assert os.path.dirname(path) == str(tmp_path)
        with open(path) as f:
            cache = json.load(f)
        bucket = kr.bucket_key(1000, 4000, 3)
        assert cache[bucket]["winner"] in ("grid", "brute")
        assert set(cache[bucket]["times_s"]) == {"grid", "brute"}

        # Second call must NOT re-race: only the recorded winner runs.
        calls = []
        orig = kr.routed

        def spy(bucket_, runners):
            calls.append(sorted(runners))
            return orig(bucket_, runners)

        monkeypatch.setattr(kr, "routed", spy)
        d2, i2 = knn_query(r, q, 3)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        assert calls == [["brute", "grid"]]  # routed() consulted the cache

        # The cached decision survives a fresh in-memory state (process
        # restart simulation).
        kr._MEM.clear()
        d3, i3 = knn_query(r, q, 3)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i3))
        with open(path) as f:
            assert json.load(f) == cache  # no re-race, no rewrite churn

    def test_static_bounds_bypass_race(self, tmp_path, monkeypatch):
        import pyfocusr_tpu.ops.knn_routing as kr
        from pyfocusr_tpu.ops.knn import _grid_decision

        monkeypatch.setenv("PYFOCUSR_TPU_CAL_DIR", str(tmp_path))
        r, q = self._mk(2000, 500, 11)
        # Below min: brute, no race, no cache file.
        monkeypatch.setenv("PYFOCUSR_TPU_KNN_GRID_MIN_PAIRS", "1e9")
        monkeypatch.setenv("PYFOCUSR_TPU_KNN_GRID_SURE_PAIRS", "1e10")
        assert _grid_decision(r, q, 1) == "brute"
        # Above sure: grid directly.
        monkeypatch.setenv("PYFOCUSR_TPU_KNN_GRID_MIN_PAIRS", "1e3")
        monkeypatch.setenv("PYFOCUSR_TPU_KNN_GRID_SURE_PAIRS", "1e4")
        assert _grid_decision(r, q, 1) == "grid"
        # Between: race.
        monkeypatch.setenv("PYFOCUSR_TPU_KNN_GRID_MIN_PAIRS", "1e3")
        monkeypatch.setenv("PYFOCUSR_TPU_KNN_GRID_SURE_PAIRS", "1e12")
        assert _grid_decision(r, q, 1) == "race"
        # MIN == SURE recovers a pure static threshold (no race band).
        monkeypatch.setenv("PYFOCUSR_TPU_KNN_GRID_MIN_PAIRS", "1e6")
        monkeypatch.setenv("PYFOCUSR_TPU_KNN_GRID_SURE_PAIRS", "1e6")
        assert _grid_decision(r, q, 1) == "grid"
        assert not os.path.exists(kr.cache_file())

    def test_bucket_key_separates_k_classes(self):
        """Brute cost grows ~linearly with k while grid cost is flat, so a
        winner raced at k=2 must not be reused at k=8 (advisor finding
        r4): log2 k-classes keep them apart."""
        import pyfocusr_tpu.ops.knn_routing as kr

        assert kr.bucket_key(1000, 4000, 2) != kr.bucket_key(1000, 4000, 8)
        assert kr.bucket_key(1000, 4000, 2) == kr.bucket_key(1000, 4000, 3)
        assert kr.bucket_key(1000, 4000, 4) == kr.bucket_key(1000, 4000, 7)
        assert kr.bucket_key(1000, 4000, 1) != kr.bucket_key(1000, 4000, 2)

    def test_store_merges_concurrent_writers(self, tmp_path, monkeypatch):
        """Two processes racing DIFFERENT buckets each write their own
        snapshot; _store must merge with the on-disk state so the last
        writer does not drop the other's entry (advisor finding r4)."""
        import pyfocusr_tpu.ops.knn_routing as kr

        monkeypatch.setenv("PYFOCUSR_TPU_CAL_DIR", str(tmp_path))
        kr._MEM.clear()
        path = kr.cache_file()

        # Process A wrote bucket "a" while our in-memory view was empty.
        kr._store(path, {"a": {"winner": "grid"}})
        # Simulate our process having loaded BEFORE A's write (stale
        # in-memory view), then storing its own bucket "b".
        kr._MEM.clear()
        kr._store(path, {"b": {"winner": "brute"}})
        with open(path) as f:
            merged = json.load(f)
        assert merged == {"a": {"winner": "grid"},
                          "b": {"winner": "brute"}}

    def test_unwritable_cache_dir_still_works(self, tmp_path, monkeypatch):
        import pyfocusr_tpu.ops.knn_routing as kr

        # A cache dir nested under a regular FILE cannot be created.
        blocker = tmp_path / "blocker"
        blocker.write_text("x")
        monkeypatch.setenv(
            "PYFOCUSR_TPU_CAL_DIR", str(blocker / "sub")
        )
        kr._MEM.clear()
        out = kr.routed("bkt", {"a": lambda: jnp.ones(3),
                                "b": lambda: jnp.zeros(3)})
        assert out.shape == (3,)
        # In-memory cache prevents a second race even without the file.
        seen = []
        out2 = kr.routed("bkt", {"a": lambda: (seen.append("a"), jnp.ones(3))[1],
                                 "b": lambda: (seen.append("b"), jnp.zeros(3))[1]})
        assert len(seen) == 1  # only the winner ran
