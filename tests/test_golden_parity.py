"""End-to-end parity gates against the executable reference golden.

The goldens (tests/goldens/reference_golden_*.npz) are produced by
tools/make_reference_golden.py: a seeded numpy/scipy transcription of the
FULL reference pipeline (tools/reference_pipeline.py — ARPACK shift-invert
eigs, scipy KDTree / linear_sum_assignment / wasserstein, f64 low-rank CPD)
run on the bundled meshes under the reference example notebook's
configuration (/root/reference/examples/Example_registering_two_bone_meshes
.ipynb cell 3).

Gate calibration: the reference pipeline is itself stochastic (unseeded
subsampling for CPD, reference ``graph.py:290``, ``focusr.py:300-306``); two
seeded golden runs (seed 0 vs 1) agree on only 49% of final correspondence
indices with a 1.0 mm mean pick distance.  The TPU pipeline measures 65%
exact / 0.67 mm against the golden — i.e. *within the reference's own noise
band* — and the gates below sit between the two.
"""

import numpy as np
import pytest

from conftest import SYNTHETIC_FIXTURES

# The goldens were generated from the REAL bundled meshes; the synthetic
# fixture pair (plain runners without the reference checkout) cannot match
# them — skip the whole module there.
pytestmark = pytest.mark.skipif(
    SYNTHETIC_FIXTURES,
    reason="golden gates need the bundled reference meshes",
)

GOLD = "tests/goldens/reference_golden_5k_kd.npz"

NOTEBOOK_COMMON = dict(
    n_spectral_features=3,
    n_extra_spectral=3,
    get_weighted_spectral_coords=False,
    non_rigid_alpha=0.01,
    non_rigid_beta=50.0,
    non_rigid_n_eigens=100,
    non_rigid_max_iterations=300,
    rigid_before_non_rigid_reg=False,
    projection_smooth_iterations=1,
    graph_smoothing_iterations=600,
    n_coords_spectral_registration=1000,
)


@pytest.fixture(scope="module")
def golden():
    return np.load(GOLD)


@pytest.fixture(scope="module")
def pipeline_result(mesh_5k_target, mesh_5k_source):
    import jax

    from pyfocusr_tpu.pipeline import (
        PipelineConfig,
        mesh_to_graph_arrays,
        register_pair,
    )

    cfg = PipelineConfig(n_coords_spectral_ordering=10000, **NOTEBOOK_COMMON)
    tg = mesh_to_graph_arrays(mesh_5k_target)
    sg = mesh_to_graph_arrays(mesh_5k_source)
    res = register_pair(tg, sg, cfg, jax.random.PRNGKey(0))
    jax.block_until_ready(res)
    return res


class TestGoldenParity5k:
    """North-star gate (BASELINE.json): correspondence parity vs the CPU
    reference on the bundled 5k pair, notebook config, 'kd' correspondences.

    NON-SLOW since round 4 (VERDICT r3 task #3): a quality regression in
    the FULL reference notebook config must fail plain ``make test``, not
    only ``make test-slow``.  Warm-cache cost ~11 s (one full 5k run
    shared module-wide)."""

    def test_eigenvalues(self, pipeline_result, golden):
        for key in ("eig_vals_target", "eig_vals_source"):
            ours = np.asarray(pipeline_result[key], np.float64)
            ref = golden[key]
            rel = np.abs(ours - ref) / ref
            assert rel.max() < 1e-4, (key, rel)

    def test_eigenvectors_mod_sign(self, pipeline_result, golden):
        for key in ("eig_vecs_target", "eig_vecs_source_sorted"):
            ours = np.asarray(pipeline_result[key], np.float64)
            ref = golden[key]
            cos = np.abs(
                (ours * ref).sum(0)
                / (np.linalg.norm(ours, axis=0) * np.linalg.norm(ref, axis=0))
            )
            assert cos.min() > 0.999, (key, cos)

    def test_final_correspondence_agreement(
        self, pipeline_result, golden, mesh_5k_target
    ):
        corr = np.asarray(pipeline_result["correspondences"])
        corr_g = golden["correspondences"]
        agree = float((corr == corr_g).mean())
        # Reference self-noise (seed 0 vs 1) is 49% exact; measured 65%.
        assert agree > 0.55, agree
        tgt = np.asarray(mesh_5k_target.points, np.float64)
        pick_d = np.linalg.norm(tgt[corr] - tgt[corr_g], axis=1)
        # Reference self-noise is 1.0 mm mean; measured 0.67 mm.
        assert pick_d.mean() < 0.9, pick_d.mean()

    def test_weighted_final_locations(self, pipeline_result, golden):
        ours = np.asarray(pipeline_result["weighted_points"], np.float64)
        ref = golden["weighted_points"]
        d = np.linalg.norm(ours - ref, axis=1)
        # Reference self-noise is 0.92 mm mean; measured 0.63 mm.
        assert d.mean() < 0.85, d.mean()
        assert np.percentile(d, 95) < 2.5, np.percentile(d, 95)

    def test_registration_quality_matches_reference(
        self, pipeline_result, golden
    ):
        """Unique-correspondence fraction — the quality number the bench
        tracks — must match the reference's, not just exceed a floor."""
        corr = np.asarray(pipeline_result["correspondences"])
        uniq = len(np.unique(corr)) / corr.shape[0]
        uniq_g = len(np.unique(golden["correspondences"])) / len(
            golden["correspondences"]
        )
        assert abs(uniq - uniq_g) < 0.05, (uniq, uniq_g)


class TestGoldenParityHungarian:
    """The reference notebook's ACTUAL 5k config uses
    initial_correspondence_type='hungarian' (notebook cell 3); round 2 made
    this run fully on-device inside the jit pipeline (exact Sinkhorn-warmed
    JV, ops/assignment.sinkhorn_jv_lap).

    NON-SLOW since round 4 (VERDICT r3 task #3) — the notebook's true
    initial_correspondence_type; ~116 s on this single-core CPU host
    (the 5000x5000 exact assignment dominates; TPU runs it in 0.2 s)."""

    def test_hungarian_pipeline_matches_golden(
        self, mesh_5k_target, mesh_5k_source
    ):
        import jax

        from pyfocusr_tpu.pipeline import (
            PipelineConfig,
            mesh_to_graph_arrays,
            register_pair,
        )

        golden = np.load("tests/goldens/reference_golden_5k_hungarian.npz")
        cfg = PipelineConfig(
            n_coords_spectral_ordering=10000,
            initial_correspondence_type="hungarian",
            **NOTEBOOK_COMMON,
        )
        tg = mesh_to_graph_arrays(mesh_5k_target)
        sg = mesh_to_graph_arrays(mesh_5k_source)
        res = register_pair(tg, sg, cfg, jax.random.PRNGKey(0))
        jax.block_until_ready(res)

        corr = np.asarray(res["correspondences"])
        corr_g = golden["correspondences"]
        agree = float((corr == corr_g).mean())
        assert agree > 0.55, agree  # reference self-noise is ~49%
        tgt = np.asarray(mesh_5k_target.points, np.float64)
        pick_d = np.linalg.norm(tgt[corr] - tgt[corr_g], axis=1)
        assert pick_d.mean() < 0.95, pick_d.mean()
        uniq = len(np.unique(corr)) / corr.shape[0]
        uniq_g = len(np.unique(corr_g)) / len(corr_g)
        assert abs(uniq - uniq_g) < 0.05, (uniq, uniq_g)


class TestTrimmedGoldenDefaultGate:
    """NON-SLOW reference-parity gate (VERDICT r1 task 6: `make test` must
    fail if registration quality regresses).  Uses a reduced-iteration
    variant of the notebook config whose golden
    (reference_golden_5k_trimmed.npz) regenerates in ~12 s."""

    TRIMMED = dict(
        NOTEBOOK_COMMON,
        non_rigid_max_iterations=60,
        graph_smoothing_iterations=100,
    )

    def test_trimmed_e2e_matches_reference(self, mesh_5k_target, mesh_5k_source):
        import jax

        from pyfocusr_tpu.pipeline import (
            PipelineConfig,
            mesh_to_graph_arrays,
            register_pair,
        )

        golden = np.load("tests/goldens/reference_golden_5k_trimmed.npz")
        cfg = PipelineConfig(n_coords_spectral_ordering=10000, **self.TRIMMED)
        tg = mesh_to_graph_arrays(mesh_5k_target)
        sg = mesh_to_graph_arrays(mesh_5k_source)
        res = register_pair(tg, sg, cfg, jax.random.PRNGKey(0))
        jax.block_until_ready(res)

        for key in ("eig_vals_target", "eig_vals_source"):
            rel = np.abs(np.asarray(res[key], np.float64) - golden[key]) / golden[key]
            assert rel.max() < 1e-4, (key, rel)

        corr = np.asarray(res["correspondences"])
        corr_g = golden["correspondences"]
        agree = float((corr == corr_g).mean())
        assert agree > 0.5, agree
        tgt = np.asarray(mesh_5k_target.points, np.float64)
        pick_d = np.linalg.norm(tgt[corr] - tgt[corr_g], axis=1)
        assert pick_d.mean() < 1.0, pick_d.mean()
        uniq = len(np.unique(corr)) / corr.shape[0]
        uniq_g = len(np.unique(corr_g)) / len(corr_g)
        assert abs(uniq - uniq_g) < 0.05, (uniq, uniq_g)


@pytest.mark.slow
class TestGoldenParityWeighted:
    """Confidence-weighted spectral coordinates (the reference's DEFAULT
    `get_weighted_spectral_coords=True`, ``focusr.py:459-508``) against the
    seeded reference golden."""

    def test_weighted_pipeline_matches_golden(
        self, mesh_5k_target, mesh_5k_source
    ):
        import jax

        from pyfocusr_tpu.pipeline import (
            PipelineConfig,
            mesh_to_graph_arrays,
            register_pair,
        )

        golden = np.load("tests/goldens/reference_golden_5k_weighted.npz")
        cfg_kw = dict(NOTEBOOK_COMMON)
        cfg_kw["get_weighted_spectral_coords"] = True
        cfg = PipelineConfig(n_coords_spectral_ordering=10000, **cfg_kw)
        tg = mesh_to_graph_arrays(mesh_5k_target)
        sg = mesh_to_graph_arrays(mesh_5k_source)
        res = register_pair(tg, sg, cfg, jax.random.PRNGKey(0))
        jax.block_until_ready(res)

        corr = np.asarray(res["correspondences"])
        corr_g = golden["correspondences"]
        agree = float((corr == corr_g).mean())
        # THE WEIGHTED CONFIG IS CHAOTIC IN EXACT-INDEX TERMS — measured
        # decomposition (round 3, against the pycpd-faithful golden):
        #   f64 oracle seed 0 vs seed 1 (self-noise):          30.6% / 1.50 mm
        #   f64 oracle + TPU f32 eigvecs (one realization):    33.6% / 1.51 mm
        #   f64 oracle + the pipeline's eigvec realization:    23.0% / 1.93 mm
        #   full f32 TPU pipeline:                             ~12%  / ~2.4 mm
        # Root cause, verified stepwise: all five eigsort cost matrices
        # agree with the f64 oracle to <= 1e-4 relative on identical
        # eigvecs, but the weighting w_u = exp(-(Q_u lam_u)^2 / 2 sigma^2)
        # (focusr.py:459-490) amplifies O(1e-6) shifts in the smallest
        # near-degenerate Q entries (and k x k assignment tie-breaks) into
        # O(10%) column-scale changes, which reshuffle nearest neighbors.
        # The reference's own f64 result is one sample of the same
        # sensitivity.  Exact index agreement is therefore gated only as a
        # loose sanity bound; parity is judged on the robust metrics below
        # (pick distance within ~2x self-noise, matching unique fraction,
        # matching displacement-field magnitude).
        assert agree > 0.08, agree
        tgt = np.asarray(mesh_5k_target.points, np.float64)
        pick_d = np.linalg.norm(tgt[corr] - tgt[corr_g], axis=1)
        assert pick_d.mean() < 3.0, pick_d.mean()  # self-noise 1.50 mm
        uniq = len(np.unique(corr)) / corr.shape[0]
        uniq_g = len(np.unique(corr_g)) / len(corr_g)
        assert abs(uniq - uniq_g) < 0.05, (uniq, uniq_g)
        # Displacement-field magnitude parity (registration quality, robust
        # to per-vertex reshuffling): mean |weighted - source|.
        disp = np.linalg.norm(
            np.asarray(res["weighted_points"], np.float64)
            - np.asarray(mesh_5k_source.points, np.float64),
            axis=1,
        ).mean()
        disp_g = np.linalg.norm(
            golden["weighted_points"]
            - np.asarray(mesh_5k_source.points, np.float64),
            axis=1,
        ).mean()
        assert abs(disp - disp_g) < 0.05 * disp_g, (disp, disp_g)


ENSEMBLE = "tests/goldens/reference_weighted_ensemble.npz"


def _weighted_gate_failures(corr, weighted_points, tgt_pts, src_pts, ens):
    """Calibrated weighted-config gate (VERDICT r3 task #7): every robust
    metric is bounded at the ORACLE ENSEMBLE's mean +/- 3 sigma (5 seeded
    f64 oracle realizations) instead of the old 'within ~2x one seed's
    self-noise' margin.  Small sigma floors guard the 5-sample estimate
    (sigma of n=5 is itself noisy): 0.004 absolute on unique fraction
    (~20 vertices), 5% relative on the pick-distance and displacement
    means.  Returns the list of violated bounds (empty = pass)."""
    tgt = np.asarray(tgt_pts, np.float64)
    corrs_o = ens["correspondences"]
    wpts_o = np.asarray(ens["weighted_points"], np.float64)
    n_seeds = corrs_o.shape[0]
    fails = []

    # Pick distance: oracle-vs-oracle pairwise means calibrate the band.
    oo = [
        np.linalg.norm(tgt[corrs_o[i]] - tgt[corrs_o[j]], axis=1).mean()
        for i in range(n_seeds) for j in range(i + 1, n_seeds)
    ]
    mu_oo, sd_oo = float(np.mean(oo)), float(np.std(oo, ddof=1))
    sd_oo = max(sd_oo, 0.05 * mu_oo)
    d_bar = float(np.mean([
        np.linalg.norm(tgt[np.asarray(corr)] - tgt[corrs_o[i]], axis=1).mean()
        for i in range(n_seeds)
    ]))
    if d_bar > mu_oo + 3 * sd_oo:
        fails.append(
            f"pick distance {d_bar:.3f} mm > ensemble {mu_oo:.3f} "
            f"+ 3*{sd_oo:.3f}"
        )

    # Unique-correspondence fraction.
    uniq_o = [len(np.unique(c)) / c.shape[0] for c in corrs_o]
    mu_u, sd_u = float(np.mean(uniq_o)), float(np.std(uniq_o, ddof=1))
    sd_u = max(sd_u, 0.004)
    uniq = len(np.unique(corr)) / len(corr)
    if abs(uniq - mu_u) > 3 * sd_u:
        fails.append(f"unique {uniq:.4f} vs ensemble {mu_u:.4f} +- 3*{sd_u:.4f}")

    # Displacement-field magnitude.
    src = np.asarray(src_pts, np.float64)
    disp_o = [
        np.linalg.norm(w - src, axis=1).mean() for w in wpts_o
    ]
    mu_d, sd_d = float(np.mean(disp_o)), float(np.std(disp_o, ddof=1))
    sd_d = max(sd_d, 0.05 * mu_d)
    disp = float(np.linalg.norm(
        np.asarray(weighted_points, np.float64) - src, axis=1
    ).mean())
    if abs(disp - mu_d) > 3 * sd_d:
        fails.append(
            f"displacement {disp:.3f} vs ensemble {mu_d:.3f} +- 3*{sd_d:.3f}"
        )
    return fails


@pytest.mark.slow
class TestWeightedEnsembleGate:
    """Multi-seed calibrated gate for the chaotic weighted config
    (VERDICT r3 task #7) — replaces margin guesswork with ensemble
    statistics, and proves the gate has TEETH by injecting a synthetic
    half-band quality regression it must reject."""

    @pytest.fixture(scope="class")
    def weighted_result(self, mesh_5k_target, mesh_5k_source):
        import jax

        from pyfocusr_tpu.pipeline import (
            PipelineConfig,
            mesh_to_graph_arrays,
            register_pair,
        )

        cfg_kw = dict(NOTEBOOK_COMMON)
        cfg_kw["get_weighted_spectral_coords"] = True
        cfg = PipelineConfig(n_coords_spectral_ordering=10000, **cfg_kw)
        tg = mesh_to_graph_arrays(mesh_5k_target)
        sg = mesh_to_graph_arrays(mesh_5k_source)
        res = register_pair(tg, sg, cfg, jax.random.PRNGKey(0))
        jax.block_until_ready(res)
        return res

    def test_pipeline_inside_calibrated_band(
        self, weighted_result, mesh_5k_target, mesh_5k_source
    ):
        ens = np.load(ENSEMBLE)
        fails = _weighted_gate_failures(
            np.asarray(weighted_result["correspondences"]),
            np.asarray(weighted_result["weighted_points"]),
            mesh_5k_target.points,
            mesh_5k_source.points,
            ens,
        )
        assert not fails, fails

    def test_gate_rejects_half_band_regression(
        self, weighted_result, mesh_5k_target, mesh_5k_source
    ):
        """Inject a +~0.8 mm pick-distance degradation (half the old 2x
        gate's slack over the 1.5 mm self-noise): picks move to a ~8th-
        ring neighbor on a fraction of vertices sized to add ~0.8 mm.
        The calibrated gate must flag it — the old '< 3.0 mm' margin
        would have passed it."""
        from scipy.spatial import KDTree

        corr = np.asarray(weighted_result["correspondences"]).copy()
        tgt = np.asarray(mesh_5k_target.points, np.float64)
        tree = KDTree(tgt)
        dists, nbrs = tree.query(tgt, k=9)
        partner = nbrs[:, 8]
        hop = dists[:, 8].mean()
        frac = min(0.8 / hop, 1.0)
        n_bad = int(frac * corr.shape[0])
        bad = corr.copy()
        bad[:n_bad] = partner[corr[:n_bad]]
        # The corrupted picks also perturb the final locations accordingly.
        wp_bad = np.asarray(weighted_result["weighted_points"]).copy()
        wp_bad[:n_bad] = tgt[bad[:n_bad]]
        ens = np.load(ENSEMBLE)
        fails = _weighted_gate_failures(
            bad, wp_bad, mesh_5k_target.points, mesh_5k_source.points, ens
        )
        assert fails, (
            "gate accepted a synthetic half-band regression "
            f"(hop {hop:.2f} mm on {n_bad} vertices)"
        )


class TestGoldenParityConfigSpace:
    """Round-3 (VERDICT task 3): the fused pipeline covers the reference's
    FULL config space; each corner gated by a golden generated through the
    transcription with that config."""

    TRIMMED = dict(
        NOTEBOOK_COMMON,
        non_rigid_max_iterations=60,
        graph_smoothing_iterations=100,
    )

    def _run(self, mesh_t, mesh_s, cfg_extra, feats=False):
        import jax

        from pyfocusr_tpu.pipeline import (
            PipelineConfig,
            mesh_to_graph_arrays,
            register_pair,
        )

        kw = {}
        if feats:
            # The reference normalizes features at Graph build
            # (graph.py:121-142): z-score, clamp +-3, 0-1 min-max.
            def norm(f):
                f = np.asarray(f, np.float64)
                f = np.clip((f - f.mean()) / f.std(), -3, 3)
                return (f - f.min()) / (f.max() - f.min())

            tg = mesh_to_graph_arrays(
                mesh_t,
                node_features=norm(mesh_t.point_data["thickness_change_(mm)"])[:, None],
            )
            sg = mesh_to_graph_arrays(
                mesh_s,
                node_features=norm(mesh_s.point_data["thickness_change_(mm)"])[:, None],
            )
        else:
            tg = mesh_to_graph_arrays(mesh_t)
            sg = mesh_to_graph_arrays(mesh_s)
        cfg = PipelineConfig(
            n_coords_spectral_ordering=10000, **{**self.TRIMMED, **cfg_extra}
        )
        res = register_pair(tg, sg, cfg, jax.random.PRNGKey(0))
        jax.block_until_ready(res)
        return res

    def _gate(self, res, golden_name, mesh_t, agree_min=0.5, pick_max=1.0):
        golden = np.load(f"tests/goldens/reference_golden_5k_{golden_name}.npz")
        corr = np.asarray(res["correspondences"])
        corr_g = golden["correspondences"]
        agree = float((corr == corr_g).mean())
        assert agree > agree_min, (golden_name, agree)
        tgt = np.asarray(mesh_t.points, np.float64)
        pick_d = np.linalg.norm(tgt[corr] - tgt[corr_g], axis=1).mean()
        assert pick_d < pick_max, (golden_name, pick_d)
        uniq = len(np.unique(corr)) / corr.shape[0]
        uniq_g = len(np.unique(corr_g)) / len(corr_g)
        assert abs(uniq - uniq_g) < 0.05, (golden_name, uniq, uniq_g)

    def test_reverse_eigsort_reference(self, mesh_5k_target, mesh_5k_source):
        """target_eigenmap_as_reference=False: assignment on Q.T, TARGET
        eigenmaps flipped/permuted (reference eigsort.py:75-78,100-122)."""
        res = self._run(
            mesh_5k_target, mesh_5k_source,
            {"target_eigenmap_as_reference": False},
        )
        self._gate(res, "trimmed_reverse", mesh_5k_target)

    def test_feature_weighted_graph(self, mesh_5k_target, mesh_5k_source):
        """use_features_in_graph + include_features_in_adj_matrix with the
        bundled thickness scalar (reference graph.py:166-214)."""
        res = self._run(
            mesh_5k_target, mesh_5k_source,
            {
                "use_features_in_graph": True,
                "include_features_in_adj_matrix": True,
                "G_matrix_p_function": "exp",
                "feature_weights_diag": (0.1,),
            },
            feats=True,
        )
        # STRONG gate: the feature-modulated OPERATOR itself — eigenvalues
        # of L = G(D-W) with the feature G and feature-augmented adjacency
        # must match the ARPACK golden tightly (measured: 8 matching
        # digits; eigvec |cos| ~ 1.0).
        golden = np.load(
            "tests/goldens/reference_golden_5k_trimmed_featgraph.npz"
        )
        for key in ("eig_vals_target", "eig_vals_source"):
            rel = (
                np.abs(np.asarray(res[key], np.float64) - golden[key])
                / golden[key]
            )
            assert rel.max() < 1e-3, (key, rel)
        # End-to-end: this config is the NOISIEST corner (measured oracle
        # seed-0-vs-seed-1 self-noise: 23.6% exact / 2.04 mm — the feature
        # modulation compounds the CPD subsample noise), so exact agreement
        # is gated loosely and quality parity carries the weight.
        self._gate(
            res, "trimmed_featgraph", mesh_5k_target,
            agree_min=0.12, pick_max=2.9,
        )

    def test_icp_reversed_direction(self, mesh_5k_target, mesh_5k_source):
        """icp_reg_target_to_source=True: the TARGET mesh is pre-aligned
        onto the source (reference focusr.py:110-121)."""
        res = self._run(
            mesh_5k_target, mesh_5k_source,
            {"icp_reg_target_to_source": True},
        )
        self._gate(res, "trimmed_icprev", mesh_5k_target)


@pytest.mark.slow
class TestFeatureE2EGolden:
    """Feature-path END-TO-END golden (VERDICT r3 task #4): the bundled
    thickness scalar as registration coordinate + edge weight on the 15k
    pair — bench.py's features_15k config — gated at correspondence level
    against TWO oracle seeds (self-noise calibrated, like the base
    configs).  Establishes whether the ~0.63 unique fraction of this
    config is reference-identical behavior or a TPU-path defect."""

    GOLD = [
        "tests/goldens/reference_golden_15k_features_s0.npz",
        "tests/goldens/reference_golden_15k_features_s1.npz",
    ]

    def test_feature_pipeline_matches_reference(self):
        import os as _os

        if not all(_os.path.exists(g) for g in self.GOLD):
            pytest.skip("15k feature goldens not generated")
        import jax

        from pyfocusr_tpu import load_mesh
        from pyfocusr_tpu.pipeline import (
            PipelineConfig,
            mesh_to_graph_arrays,
            register_pair,
        )

        key_t = "thickness_change_(mm)"
        target = load_mesh("/root/reference/data/target_mesh_15k.vtk")
        source = load_mesh("/root/reference/data/source_mesh_15k.vtk")

        def _normf(f):
            f = np.asarray(f, np.float64)
            std = f.std()
            f = np.clip((f - f.mean()) / (std if std > 0 else 1.0), -3, 3)
            ptp = f.max() - f.min()
            return ((f - f.min()) / (ptp if ptp > 0 else 1.0))[:, None]

        cfg = PipelineConfig(
            n_coords_spectral_ordering=10000,
            use_features_as_coords=True,
            include_features_in_adj_matrix=True,
            feature_smoothing_iterations=10,
            **NOTEBOOK_COMMON,
        )
        tg = mesh_to_graph_arrays(
            target, node_features=_normf(target.point_data[key_t])
        )
        sg = mesh_to_graph_arrays(
            source, node_features=_normf(source.point_data[key_t])
        )
        res = register_pair(tg, sg, cfg, jax.random.PRNGKey(0))
        corr = np.asarray(res["correspondences"])
        tgt = np.asarray(target.points, np.float64)

        g0 = np.load(self.GOLD[0])
        g1 = np.load(self.GOLD[1])
        c0, c1 = g0["correspondences"], g1["correspondences"]
        # Self-noise calibration: the oracle's own seed-to-seed scatter.
        self_pick = np.linalg.norm(tgt[c0] - tgt[c1], axis=1).mean()
        self_agree = float((c0 == c1).mean())
        uniq_o = [len(np.unique(c)) / len(c) for c in (c0, c1)]

        uniq = len(np.unique(corr)) / corr.shape[0]
        # Unique fraction must sit in the oracle band (widened by the
        # oracle's own seed spread + a 0.04 absolute floor).
        band = max(abs(uniq_o[0] - uniq_o[1]) * 3, 0.04)
        mid = float(np.mean(uniq_o))
        assert abs(uniq - mid) < band, (uniq, uniq_o)
        # Pick distance to each oracle seed within 2x self-noise (the
        # feature channel inherits the weighted config's sensitivity).
        for cg in (c0, c1):
            pick = np.linalg.norm(tgt[corr] - tgt[cg], axis=1).mean()
            assert pick < max(2.0 * self_pick, 0.5), (pick, self_pick)
        agree = float(np.mean([(corr == c0).mean(), (corr == c1).mean()]))
        assert agree > 0.4 * self_agree, (agree, self_agree)
