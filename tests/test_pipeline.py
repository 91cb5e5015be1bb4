"""Single-program jit pipeline (pipeline.register_pair): correctness,
padding-mask invariance, determinism."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyfocusr_tpu import load_mesh
from pyfocusr_tpu.pipeline import (
    PipelineConfig,
    mesh_to_graph_arrays,
    register_pair,
)

DATA = "/root/reference/data"

FAST = dict(
    icp_iterations=30,
    non_rigid_max_iterations=40,
    graph_smoothing_iterations=50,
    projection_smooth_iterations=1,
    n_coords_spectral_registration=500,
    eig_cg_iters=150,
)


@pytest.fixture(scope="module")
def pair_5k():
    target = load_mesh(f"{DATA}/target_mesh.vtk")
    source = load_mesh(f"{DATA}/source_mesh.vtk")
    return mesh_to_graph_arrays(target), mesh_to_graph_arrays(source)


@pytest.mark.slow
def test_register_pair_end_to_end(pair_5k):
    tg, sg = pair_5k
    cfg = PipelineConfig(**FAST)
    res = register_pair(tg, sg, cfg, jax.random.PRNGKey(0))
    corr = np.asarray(res["correspondences"])
    assert corr.shape == (5000,)
    assert len(np.unique(corr)) > 0.6 * 5000
    # nearest points are actual target vertices
    np.testing.assert_allclose(
        np.asarray(res["nearest_points"]),
        np.asarray(tg.points)[corr],
        atol=1e-6,
    )
    assert np.all(np.isfinite(np.asarray(res["weighted_points"])))


def test_outlier_w_validation():
    with pytest.raises(ValueError, match="non_rigid_outlier_w"):
        PipelineConfig(non_rigid_outlier_w=1.0)
    with pytest.raises(ValueError, match="non_rigid_outlier_w"):
        PipelineConfig(non_rigid_outlier_w=-0.1)


def test_register_pair_with_outlier_w(pair_5k):
    """w > 0 (uniform outlier component in the CPD E-step) must leave
    clean-data registration quality intact."""
    tg, sg = pair_5k
    cfg = PipelineConfig(non_rigid_outlier_w=0.1, **FAST)
    res = register_pair(tg, sg, cfg, jax.random.PRNGKey(0))
    corr = np.asarray(res["correspondences"])
    assert len(np.unique(corr)) > 0.5 * 5000
    assert np.all(np.isfinite(np.asarray(res["weighted_points"])))


@pytest.mark.slow
def test_register_pair_deterministic(pair_5k):
    tg, sg = pair_5k
    cfg = PipelineConfig(**FAST)
    r1 = register_pair(tg, sg, cfg, jax.random.PRNGKey(7))
    r2 = register_pair(tg, sg, cfg, jax.random.PRNGKey(7))
    np.testing.assert_array_equal(
        np.asarray(r1["correspondences"]), np.asarray(r2["correspondences"])
    )


@pytest.mark.slow
def test_padding_is_inert(pair_5k):
    """Padding with dead vertices must not degrade the registration.

    Exact index equality is NOT expected: the subsample draws (eigsort/CPD)
    depend on the padded array size, so the CPD warp differs stochastically.
    What must hold: (a) the padded spectrum is exact (test below), (b) padding
    rows never leak into results, (c) quality metrics match the unpadded run.
    """
    tg, sg = pair_5k
    target = load_mesh(f"{DATA}/target_mesh.vtk")
    source = load_mesh(f"{DATA}/source_mesh.vtk")
    tg_pad = mesh_to_graph_arrays(target, pad_n_points=5120)
    sg_pad = mesh_to_graph_arrays(source, pad_n_points=5120)
    cfg = PipelineConfig(**FAST)
    res = register_pair(tg, sg, cfg, jax.random.PRNGKey(3))
    res_pad = register_pair(tg_pad, sg_pad, cfg, jax.random.PRNGKey(3))
    c1 = np.asarray(res["correspondences"])
    c2 = np.asarray(res_pad["correspondences"])[:5000]
    # No correspondence ever points at a padding row.
    assert c2.max() < 5000
    # Padding rows are zeroed in every output.
    assert np.all(np.asarray(res_pad["weighted_points"])[5000:] == 0)
    # Quality parity: unique-correspondence density and geometric agreement.
    u1 = len(np.unique(c1)) / 5000
    u2 = len(np.unique(c2)) / 5000
    # Both healthy; the unique fraction itself is noisy (0.6-0.87 observed
    # across equivalent configs), so gate each run rather than their delta.
    assert u1 > 0.5 and u2 > 0.5, (u1, u2)
    tgt_pts = np.asarray(tg.points)
    d = np.linalg.norm(tgt_pts[c1] - tgt_pts[c2], axis=1)
    extent = np.linalg.norm(np.ptp(tgt_pts, axis=0))
    assert np.median(d) < 0.12 * extent, (np.median(d), extent)


def test_padded_spectrum_exact(pair_5k):
    """The padded eigensolve must match the unpadded one to f32 accuracy
    (Krylov iteration confined to the masked subspace)."""
    from pyfocusr_tpu.pipeline import _spectrum

    target = load_mesh(f"{DATA}/target_mesh.vtk")
    tg = mesh_to_graph_arrays(target)
    tg_pad = mesh_to_graph_arrays(target, pad_n_points=5120)
    cfg = PipelineConfig()
    lams, vecs, _ = _spectrum(tg, 6, jax.random.PRNGKey(0), cfg)
    lams_p, vecs_p, _ = _spectrum(tg_pad, 6, jax.random.PRNGKey(0), cfg)
    np.testing.assert_allclose(np.asarray(lams), np.asarray(lams_p), rtol=1e-3)
    for c in range(6):
        a = np.asarray(vecs[:, c])
        b = np.asarray(vecs_p[:5000, c])
        a = a - a.mean()
        b = b - b.mean()
        cos = abs(a @ b) / (np.linalg.norm(a) * np.linalg.norm(b))
        assert cos > 0.9999, f"col {c}: {cos}"
    assert np.all(np.asarray(vecs_p)[5000:] == 0)


def test_eigenvalues_match_graph_class(pair_5k):
    """Pipeline spectrum equals the class-path spectrum (same operators)."""
    from pyfocusr_tpu.pipeline import _spectrum
    from pyfocusr_tpu.spectral.graph import Graph

    tg, _ = pair_5k
    cfg = PipelineConfig()
    lams, vecs, _ = _spectrum(tg, 6, jax.random.PRNGKey(0), cfg)
    target = load_mesh(f"{DATA}/target_mesh.vtk")
    graph = Graph(target, n_spectral_features=6, seed=0)
    graph.get_graph_spectrum()
    np.testing.assert_allclose(
        np.asarray(lams), np.asarray(graph.eig_vals), rtol=5e-3
    )


def test_union_spectra_matches_separate(pair_5k):
    """Disjoint-union eigensolve == per-mesh eigensolves (block-diagonal
    Laplacian + per-partition Rayleigh-Ritz, ops/eigen.py partition mode)."""
    import jax

    from pyfocusr_tpu.experiments import spectrum_union
    from pyfocusr_tpu.pipeline import _spectrum

    tg, sg = pair_5k
    cfg = PipelineConfig()
    lt, vt, _ = _spectrum(tg, 6, jax.random.PRNGKey(0), cfg)
    ls, vs, _ = _spectrum(sg, 6, jax.random.PRNGKey(1), cfg)
    lams2, vt2, vs2 = spectrum_union(tg, sg, 6, jax.random.PRNGKey(0), cfg)
    np.testing.assert_allclose(np.asarray(lams2[0]), np.asarray(lt), rtol=1e-3)
    np.testing.assert_allclose(np.asarray(lams2[1]), np.asarray(ls), rtol=1e-3)
    for a, b in [(vt, vt2), (vs, vs2)]:
        for c in range(6):
            x = np.asarray(a[:, c]) - np.asarray(a[:, c]).mean()
            y = np.asarray(b[:, c]) - np.asarray(b[:, c]).mean()
            cos = abs(x @ y) / (np.linalg.norm(x) * np.linalg.norm(y))
            assert cos > 0.999, (c, cos)


@pytest.mark.slow
def test_mutual_consistency_mask(pair_5k):
    """compute_mutual_consistency returns a 0/1 mask of cycle-consistent
    initial correspondences — a quality signal the reference lacks."""
    import jax

    tg, sg = pair_5k
    cfg = PipelineConfig(compute_mutual_consistency=True, **FAST)
    res = register_pair(tg, sg, cfg, jax.random.PRNGKey(0))
    m = np.asarray(res["mutual_consistency"])
    assert m.shape == (5000,)
    assert set(np.unique(m)).issubset({0.0, 1.0})
    # For a well-registered similar pair, a large fraction is mutual.
    assert m.mean() > 0.3, m.mean()


@pytest.mark.slow
def test_register_pair_15k_real_data():
    """The bundled 15k pair end-to-end: exercises the REAL disconnected mesh
    (source_mesh_15k has two isolated vertices) and pins the eigenvalues to
    the ARPACK goldens (computed once with scipy shift-invert)."""
    import jax

    tg = mesh_to_graph_arrays(load_mesh(f"{DATA}/target_mesh_15k.vtk"))
    sg = mesh_to_graph_arrays(load_mesh(f"{DATA}/source_mesh_15k.vtk"))
    cfg = PipelineConfig(
        non_rigid_max_iterations=100,
        graph_smoothing_iterations=300,
        projection_smooth_iterations=1,
        n_coords_spectral_registration=1000,
    )
    res = register_pair(tg, sg, cfg, jax.random.PRNGKey(0))
    # ARPACK golden eigenvalues (scipy eigs, sigma=1e-10 shift-invert).
    golden_t = [0.0002803, 0.00053345, 0.0007212, 0.00103689, 0.00126139, 0.00135421]
    golden_s = [0.00027989, 0.00054738, 0.00070142, 0.00102764, 0.00129613, 0.00130917]
    np.testing.assert_allclose(
        np.asarray(res["eig_vals_target"]), golden_t, rtol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(res["eig_vals_source"]), golden_s, rtol=2e-3
    )
    corr = np.asarray(res["correspondences"])
    assert corr.shape == (14996,)
    assert len(np.unique(corr)) > 0.6 * 14996
    assert np.all(np.isfinite(np.asarray(res["weighted_points"])))


def test_unequal_eigsort_samples_in_pipeline():
    """Unequal eigsort sample counts inside the jit pipeline (round-2,
    VERDICT r1 task 5): when n_coords_spectral_ordering exceeds one mesh's
    vertex count, each mesh keeps its own sample size (reference
    ``graph.py:274-290``) and c_hist takes the merged-CDF Wasserstein path."""
    import sys

    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from test_curvature_icp import make_sphere

    from pyfocusr_tpu.mesh import TriMesh

    p1, t1 = make_sphere(n_theta=12, n_phi=24)   # 266 pts
    p2, t2 = make_sphere(n_theta=14, n_phi=26)   # 314 pts
    rng = np.random.default_rng(0)
    m1 = TriMesh(jnp.asarray(p1, jnp.float32), jnp.asarray(t1))
    m2 = TriMesh(
        jnp.asarray(p2 * (1.0 + 0.03 * np.sin(3 * p2[:, [1]])), jnp.float32),
        jnp.asarray(t2),
    )
    tg = mesh_to_graph_arrays(m1)
    sg = mesh_to_graph_arrays(m2)
    cfg = PipelineConfig(
        n_coords_spectral_ordering=100000,  # > both counts -> unequal (266 vs 314)
        n_coords_spectral_registration=200,
        non_rigid_max_iterations=20,
        graph_smoothing_iterations=10,
        projection_smooth_iterations=2,
        icp_iterations=10,
    )
    res = register_pair(tg, sg, cfg, jax.random.PRNGKey(0))
    corr = np.asarray(res["correspondences"])
    assert corr.shape == (sg.n_points,)
    assert np.all((corr >= 0) & (corr < tg.n_points))
    assert np.all(np.isfinite(np.asarray(res["weighted_points"])))
    assert len(np.unique(corr)) > 0.3 * sg.n_points


def test_landmark_pairs_guide_registration():
    """landmark_pairs (round-2, beyond-reference): known source<->target
    vertex correspondences pull the registration toward them (MAP CPD
    priors on the forced-in control points)."""
    import sys

    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from test_curvature_icp import make_sphere

    from pyfocusr_tpu.mesh import TriMesh

    pts, tris = make_sphere(n_theta=14, n_phi=28)
    rng = np.random.default_rng(0)
    warp = pts * (
        1.0
        + 0.22 * np.sin(2.1 * pts[:, [0]] + 0.7)
        + 0.12 * np.cos(3.3 * pts[:, [1]])
    )
    t_mesh = TriMesh(jnp.asarray(warp, jnp.float32), jnp.asarray(tris))
    s_mesh = TriMesh(
        jnp.asarray(warp * (1.0 + 0.04 * np.sin(3 * warp[:, [2]])), jnp.float32),
        jnp.asarray(tris),
    )
    tg = mesh_to_graph_arrays(t_mesh)
    sg = mesh_to_graph_arrays(s_mesh)
    cfg = PipelineConfig(
        icp_iterations=15,
        n_coords_spectral_ordering=500,
        n_coords_spectral_registration=250,
        non_rigid_max_iterations=30,
        non_rigid_n_eigens=60,
        graph_smoothing_iterations=15,
        projection_smooth_iterations=2,
    )
    # Ground truth is the identity map (same topology, mild warp).
    lm_src = np.asarray([10, 120, 250, 330], np.int32)
    lm = jnp.asarray(np.stack([lm_src, lm_src], axis=1))

    res0 = register_pair(tg, sg, cfg, jax.random.PRNGKey(0))
    res1 = register_pair(tg, sg, cfg, jax.random.PRNGKey(0), landmark_pairs=lm)
    t_pts = np.asarray(t_mesh.points, np.float64)

    def lm_err(res):
        corr = np.asarray(res["correspondences"])
        return np.linalg.norm(t_pts[corr[lm_src]] - t_pts[lm_src], axis=1)

    e0, e1 = lm_err(res0), lm_err(res1)
    # Landmarked vertices match at least as well as without, and the total
    # landmark error drops (ground truth = identity, so errors -> 0).
    assert e1.mean() <= e0.mean() + 1e-6, (e0, e1)
    assert e1.mean() < 0.2, (e0, e1)  # unit-sphere scale
    # Quality elsewhere does not degrade.
    corr0 = np.asarray(res0["correspondences"])
    corr1 = np.asarray(res1["correspondences"])
    u0, u1 = len(np.unique(corr0)), len(np.unique(corr1))
    assert u1 > 0.8 * u0, (u0, u1)


def test_hungarian_rejects_padded_graphs(pair_5k):
    """'hungarian' is one-to-one over ALL rows, so padded graphs (whose
    padding rows sit at the origin) must be rejected up front rather than
    silently stealing target vertices from real source vertices."""
    target = load_mesh(f"{DATA}/target_mesh.vtk")
    source = load_mesh(f"{DATA}/source_mesh.vtk")
    tg_pad = mesh_to_graph_arrays(target, pad_n_points=5120)
    sg_pad = mesh_to_graph_arrays(source, pad_n_points=5120)
    cfg = PipelineConfig(**{**FAST, "initial_correspondence_type": "hungarian"})
    with pytest.raises(ValueError, match="unpadded"):
        register_pair(tg_pad, sg_pad, cfg, jax.random.PRNGKey(0))


def test_oversized_subsample_rejected_on_padded_graphs():
    """Subsample knobs above the REAL vertex count would draw padding rows
    (_rand_idxs static-size caveat); register_pair now rejects them for
    hand-padded graphs, matching the cohort path's check_cohort_config."""
    target = load_mesh(f"{DATA}/target_mesh.vtk")
    source = load_mesh(f"{DATA}/source_mesh.vtk")
    tg_pad = mesh_to_graph_arrays(target, pad_n_points=5120)
    sg_pad = mesh_to_graph_arrays(source, pad_n_points=5120)
    cfg = PipelineConfig(**{**FAST, "n_coords_spectral_ordering": 5100})
    with pytest.raises(ValueError, match="n_coords_spectral_ordering"):
        register_pair(tg_pad, sg_pad, cfg, jax.random.PRNGKey(0))


def test_auction_alias_rejects_unknown_kwargs():
    """sinkhorn_auction_lap forwards JV kwargs and raises on retired
    auction-era knobs instead of silently swallowing them."""
    from pyfocusr_tpu.ops.assignment import sinkhorn_auction_lap

    cost = jnp.asarray(np.random.default_rng(0).random((16, 16)), jnp.float32)
    with pytest.raises(TypeError, match="eps_scaling_steps"):
        sinkhorn_auction_lap(cost, eps_scaling_steps=4)
    col = np.asarray(sinkhorn_auction_lap(cost, levels=8, iters_per_level=10))
    assert sorted(col) == list(range(16))


def test_multires_rejects_hungarian_initial():
    from pyfocusr_tpu.multires import register_pair_multires

    cfg = PipelineConfig(**{**FAST, "initial_correspondence_type": "hungarian"})
    with pytest.raises(ValueError, match="decimated"):
        register_pair_multires(None, None, cfg, None)


def test_pipeline_feature_mismatch_raises():
    """The fused pipeline raises the reference's feature-count-mismatch
    exception (focusr.py:220-226) instead of silently dropping features."""
    from pyfocusr_tpu.focusr import Focusr

    class _G:
        pass

    reg = object.__new__(Focusr)
    reg.use_features_as_coords = True
    reg.graph_target = _G()
    reg.graph_source = _G()
    reg.graph_target.n_extra_features = 2
    reg.graph_source.n_extra_features = 0
    with pytest.raises(Exception, match="dont match"):
        reg._pipeline_features_flag()


def test_landmark_pairs_from_positions():
    """Positions snap to nearest vertices; distances are reported so
    off-surface landmarks are detectable."""
    from pyfocusr_tpu.pipeline import landmark_pairs_from_positions

    target = load_mesh(f"{DATA}/target_mesh.vtk")
    source = load_mesh(f"{DATA}/source_mesh.vtk")
    src_idx = np.array([10, 500, 4000])
    tgt_idx = np.array([20, 600, 4500])
    sp = np.asarray(source.points)[src_idx] + 0.01  # slightly off-surface
    tp = np.asarray(target.points)[tgt_idx] + 0.01
    pairs, dists = landmark_pairs_from_positions(source, target, sp, tp)
    np.testing.assert_array_equal(np.asarray(pairs)[:, 0], src_idx)
    np.testing.assert_array_equal(np.asarray(pairs)[:, 1], tgt_idx)
    # f32 pairwise-distance noise floor at ~50 mm coordinates is ~0.06 mm;
    # gate well below the ~1.5 mm edge length instead.
    assert float(np.max(np.asarray(dists))) < 0.3
    with pytest.raises(ValueError, match="L, 3"):
        landmark_pairs_from_positions(source, target, sp, tp[:2])


@pytest.mark.slow
def test_prepared_target_matches_register_pair(pair_5k):
    """prepare_target + register_pair_prepared must reproduce register_pair
    bit-for-bit when fed the same key split (the prepared state replaces
    exactly the values the fused program computes)."""
    from pyfocusr_tpu.pipeline import prepare_target, register_pair_prepared

    tg, sg = pair_5k
    cfg = PipelineConfig(**FAST)
    key = jax.random.PRNGKey(11)
    ref = register_pair(tg, sg, cfg, key)
    prep = prepare_target(tg, cfg, jax.random.split(key, 8)[0])
    out = register_pair_prepared(prep, tg, sg, cfg, key)
    for k in ("correspondences", "weighted_points", "eig_vals_target"):
        np.testing.assert_array_equal(np.asarray(ref[k]), np.asarray(out[k]))


def test_prepare_target_rejects_moving_target():
    from pyfocusr_tpu.pipeline import prepare_target

    cfg = PipelineConfig(icp_register_first=True, icp_reg_target_to_source=True)
    with pytest.raises(ValueError, match="fixed target"):
        prepare_target(None, cfg, jax.random.PRNGKey(0))


def test_prepared_target_checkpoint_roundtrip(tmp_path):
    """save/load_prepared_target restores the exact pytree structure."""
    import jax.numpy as jnp

    from pyfocusr_tpu.pipeline import (
        load_prepared_target,
        save_prepared_target,
    )

    prep = {
        "lams": jnp.arange(7, dtype=jnp.float32),
        "vecs": jnp.ones((12, 7), jnp.float32),
        "w": (
            jnp.ones((12, 8), jnp.float32),
            jnp.zeros((3, 2), jnp.int32),
            jnp.ones((3,), jnp.float32),
        ),
        "smoothed_points": jnp.full((12, 3), 2.0, jnp.float32),
    }
    p = str(tmp_path / "prep.npz")
    save_prepared_target(p, prep)
    back = load_prepared_target(p)
    assert set(back) == set(prep)
    assert isinstance(back["w"], tuple) and len(back["w"]) == 3
    for a, b in zip(
        jax.tree_util.tree_leaves(prep), jax.tree_util.tree_leaves(back)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_prepared_target_config_fingerprint(tmp_path):
    import jax.numpy as jnp

    from pyfocusr_tpu.pipeline import (
        load_prepared_target,
        save_prepared_target,
    )

    prep = {
        "lams": jnp.zeros(3), "vecs": jnp.zeros((4, 3)),
        "w": (jnp.zeros((4, 8)),),
        "smoothed_points": jnp.zeros((4, 3)),
    }
    cfg_a = PipelineConfig(graph_smoothing_iterations=300)
    cfg_b = PipelineConfig(graph_smoothing_iterations=600)
    p = str(tmp_path / "prep.npz")
    save_prepared_target(p, prep, cfg_a)
    load_prepared_target(p, cfg_a)  # same config: ok
    load_prepared_target(p)  # no check requested: ok
    with pytest.raises(ValueError, match="different\\s+PipelineConfig"):
        load_prepared_target(p, cfg_b)


@pytest.mark.slow
def test_prepared_source_matches_register_pair(pair_5k):
    """prepare_source + register_pair_prepared_source (the cohort/SSM
    direction: template-as-source) must reproduce register_pair bit-for-bit
    when ICP is off, the same key split is used, and the cross-mesh warm
    start is disabled (with eig_warm_start=True — the default — the fused
    program warm-starts the SOURCE solve from the target block while the
    prepared one ran cold, so agreement is tolerance-level: asserted
    separately below)."""
    from pyfocusr_tpu.pipeline import (
        prepare_source,
        register_pair_prepared_source,
    )

    tg, sg = pair_5k
    cfg = PipelineConfig(
        icp_register_first=False, eig_warm_start=False, **FAST
    )
    key = jax.random.PRNGKey(13)
    ref = register_pair(tg, sg, cfg, key)
    prep = prepare_source(sg, cfg, jax.random.split(key, 8)[1])
    out = register_pair_prepared_source(prep, tg, sg, cfg, key)
    for k in ("correspondences", "weighted_points", "eig_vals_source"):
        np.testing.assert_array_equal(np.asarray(ref[k]), np.asarray(out[k]))

    # Default config (warm start on): the two paths agree to solver
    # tolerance — different eigensolve inits, same basis.
    cfg_w = PipelineConfig(icp_register_first=False, **FAST)
    ref_w = register_pair(tg, sg, cfg_w, key)
    prep_w = prepare_source(sg, cfg_w, jax.random.split(key, 8)[1])
    out_w = register_pair_prepared_source(prep_w, tg, sg, cfg_w, key)
    agree = np.mean(
        np.asarray(ref_w["correspondences"])
        == np.asarray(out_w["correspondences"])
    )
    assert agree > 0.9, agree


def test_source_spectrum_hoistable_matrix():
    from pyfocusr_tpu.pipeline import prepare_source, source_spectrum_hoistable

    # Rigid ICP preserves edge weights: hoistable (the default config).
    assert source_spectrum_hoistable(PipelineConfig())
    # Similarity ICP moving the source rescales the smoothing operator.
    sim = PipelineConfig(icp_registration_mode="similarity")
    assert not source_spectrum_hoistable(sim)
    with pytest.raises(ValueError, match="pair-independent"):
        prepare_source(None, sim, jax.random.PRNGKey(0))
    # ...but with the TARGET moving instead, the source never moves.
    assert source_spectrum_hoistable(
        PipelineConfig(
            icp_registration_mode="similarity", icp_reg_target_to_source=True
        )
    )
    # No ICP at all: trivially hoistable.
    assert source_spectrum_hoistable(
        PipelineConfig(icp_register_first=False,
                       icp_registration_mode="similarity")
    )


def test_prepared_target_mesh_fingerprint(tmp_path):
    """A prepared state saved for one target must refuse to load against a
    different same-size target (same config, same shapes — the silent-mixing
    hazard)."""
    import dataclasses

    import jax.numpy as jnp

    from pyfocusr_tpu.pipeline import (
        load_prepared_target,
        save_prepared_target,
    )

    prep = {
        "lams": jnp.zeros(3), "vecs": jnp.zeros((4, 3)),
        "w": (jnp.zeros((4, 8)),),
        "smoothed_points": jnp.zeros((4, 3)),
    }
    key = jax.random.PRNGKey(0)
    pts = jax.random.normal(key, (16, 3))
    tris = jnp.zeros((4, 3), jnp.int32)
    from pyfocusr_tpu.mesh import TriMesh

    ga_a = mesh_to_graph_arrays(TriMesh(pts, tris))
    ga_b = mesh_to_graph_arrays(TriMesh(pts + 0.01, tris))  # same size!
    p = str(tmp_path / "prep.npz")
    save_prepared_target(p, prep, target=ga_a)
    load_prepared_target(p, target=ga_a)  # same mesh: ok
    load_prepared_target(p)  # no check requested: ok
    with pytest.raises(ValueError, match="does not match this target"):
        load_prepared_target(p, target=ga_b)


def test_split_spectra_matches_fused(monkeypatch):
    """Above _SPLIT_SPECTRA_N, register_pair hoists both eigensolves into
    separate programs; with ICP off and the same key the outputs must be
    bit-identical to the fused program (same key splits, same math)."""
    import pyfocusr_tpu.pipeline as pl
    from pyfocusr_tpu.mesh import TriMesh

    import sys

    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from test_curvature_icp import make_sphere

    pts, tris = make_sphere(n_theta=10, n_phi=20)
    tg = mesh_to_graph_arrays(TriMesh(jnp.asarray(pts, jnp.float32), jnp.asarray(tris)))
    warped = (pts * (1.0 + 0.05 * np.sin(3.0 * pts[:, [1]]))).astype(np.float32)
    sg = mesh_to_graph_arrays(TriMesh(jnp.asarray(warped), jnp.asarray(tris)))
    cfg = PipelineConfig(
        icp_register_first=False,
        n_coords_spectral_ordering=150,
        n_coords_spectral_registration=100,
        non_rigid_max_iterations=10,
        non_rigid_n_eigens=30,
        graph_smoothing_iterations=10,
        projection_smooth_iterations=2,
        eig_cg_iters=60,
    )
    key = jax.random.PRNGKey(3)
    fused = register_pair(tg, sg, cfg, key)
    monkeypatch.setattr(pl, "_SPLIT_SPECTRA_N", 1)
    split = register_pair(tg, sg, cfg, key)
    for k in ("correspondences", "weighted_points", "eig_vals_target",
              "eig_vals_source"):
        np.testing.assert_array_equal(np.asarray(fused[k]), np.asarray(split[k]))
    # (Rigid-ICP hoist agreement is asserted on BONE meshes in
    # tests/test_cohort.py::test_register_cohort_prepared_template_agrees —
    # a perfect sphere's degenerate eigenspace rotates freely between
    # solves, so correspondence agreement is not a meaningful check here.)


def test_warm_x0_masks_padding_rows(mesh_5k_source, mesh_5k_target):
    """ADVICE r3 (medium): _warm_x0 must mask padded 'from' rows to SENTINEL
    before the NN query.  Padding rows sit at the origin after
    _pad_graph_arrays, so a real 'to' vertex near the origin would otherwise
    seed from a dead all-zero block row."""
    import jax.numpy as jnp

    from pyfocusr_tpu.pipeline import (
        _pad_graph_arrays,
        _warm_x0,
        mesh_to_graph_arrays,
    )

    g_from = mesh_to_graph_arrays(mesh_5k_source)
    g_to = mesh_to_graph_arrays(mesh_5k_target)

    # Center the 'to' mesh on the origin so some real query point lands
    # nearer the padding cluster (origin) than most real 'from' vertices,
    # and shift the 'from' mesh away from the origin.
    shift = jnp.asarray([100.0, 0.0, 0.0])
    g_from = dataclasses_replace_points(g_from, g_from.points + shift)
    n = g_from.points.shape[0]
    g_from_pad = _pad_graph_arrays(g_from, n + 512, g_from.neighbors.shape[1],
                                   g_from.null_indicators.shape[1])

    # Block rows: row i of the block = i (so the gathered seed identifies
    # which 'from' row each 'to' vertex sampled).
    blk = jnp.arange(n + 512, dtype=jnp.float32)[:, None] * jnp.ones((1, 4))
    seeded = _warm_x0(blk, g_from_pad.points, g_from_pad.valid_mask,
                      g_to.points)
    # Every real 'to' vertex must seed from a REAL 'from' row (< n), never
    # from the origin padding cluster (rows >= n).
    mask = np.asarray(g_to.valid_mask) > 0
    src_rows = np.asarray(seeded[:, 0])[mask]
    assert np.all(src_rows < n), (
        f"{np.sum(src_rows >= n)} real vertices seeded from padding rows"
    )


def dataclasses_replace_points(g, pts):
    import dataclasses as _dc

    return _dc.replace(g, points=pts * g.valid_mask[:, None])


def test_class_template_warm_block(mesh_5k_source, mesh_5k_target):
    """Class-template warm start (register_pair warm_block=): a THIRD mesh
    of the same shape class, prepared once, seeds BOTH eigensolves of a
    never-seen pair.  Correspondences must closely agree with the cold run
    and eigenvalues must match to solver tolerance."""
    import sys as _sys

    from pyfocusr_tpu.pipeline import (
        prepare_target,
        warm_block_from_prepared,
    )

    _sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from conftest import _synthetic_bone

    tg = mesh_to_graph_arrays(mesh_5k_target)
    sg = mesh_to_graph_arrays(mesh_5k_source)
    template = mesh_to_graph_arrays(_synthetic_bone(3))

    cfg = PipelineConfig(**FAST)
    prep = prepare_target(template, cfg, jax.random.PRNGKey(5))
    wb = warm_block_from_prepared(prep, template)
    assert wb["block"].shape == (template.points.shape[0],
                                 cfg.eig_wide_block)

    cold = register_pair(tg, sg, cfg, jax.random.PRNGKey(0))
    warm = register_pair(tg, sg, cfg, jax.random.PRNGKey(0), warm_block=wb)

    np.testing.assert_allclose(
        np.asarray(warm["eig_vals_target"]),
        np.asarray(cold["eig_vals_target"]), rtol=5e-3,
    )
    np.testing.assert_allclose(
        np.asarray(warm["eig_vals_source"]),
        np.asarray(cold["eig_vals_source"]), rtol=5e-3,
    )
    cc = np.asarray(cold["correspondences"])
    cw = np.asarray(warm["correspondences"])
    # Exact index agreement fluctuates with any eigvector perturbation at
    # coincident-cost vertices; gate on physical pick distance instead.
    tp = np.asarray(tg.points)
    d = np.linalg.norm(tp[cc] - tp[cw], axis=1)
    # Mesh scale ~ tens of mm; the two runs must pick (near-)identical spots.
    assert np.median(d) < 1e-6, np.median(d)
    assert d.mean() < 0.5, d.mean()

    # A prepared state WITHOUT a block raises loudly.
    import dataclasses as _dc
    cfg_noblk = _dc.replace(cfg, eig_warm_start=False)
    prep2 = prepare_target(template, cfg_noblk, jax.random.PRNGKey(5))
    with pytest.raises(ValueError, match="no filtered block"):
        warm_block_from_prepared(prep2, template)

    # A hand-built dict missing required keys gets the guided error
    # naming warm_block_from_prepared, not a bare KeyError (advisor
    # finding r4).
    with pytest.raises(ValueError, match="warm_block_from_prepared"):
        register_pair(tg, sg, cfg, jax.random.PRNGKey(0),
                      warm_block={"points": wb["points"]})
