"""Sharded cohort registration (parallel/cohort.py) on the 8-virtual-device
CPU mesh (SURVEY §4: 'multi-chip without a cluster')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from pyfocusr_tpu.mesh import TriMesh
from pyfocusr_tpu.parallel.cohort import (
    all_pairs_surface_errors,
    build_ssm_template,
    iterate_template,
    pad_cohort,
    register_cohort,
    stack_graph_arrays,
)
from pyfocusr_tpu.pipeline import PipelineConfig, mesh_to_graph_arrays


def _sphere_mesh(r=1.0, warp=0.0, n_theta=10, n_phi=20, seed=0):
    import sys

    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from test_curvature_icp import make_sphere

    pts, tris = make_sphere(n_theta=n_theta, n_phi=n_phi, r=r)
    if warp:
        pts = pts * (1.0 + warp * np.sin(3.0 * pts[:, [1]]))
    return TriMesh(jnp.asarray(pts, jnp.float32), jnp.asarray(tris))


TINY = PipelineConfig(
    icp_iterations=10,
    n_coords_spectral_ordering=150,
    n_coords_spectral_registration=100,
    non_rigid_max_iterations=10,
    non_rigid_n_eigens=30,
    graph_smoothing_iterations=10,
    projection_smooth_iterations=2,
    eig_cg_iters=60,
)


def test_register_cohort_unsharded():
    template = mesh_to_graph_arrays(_sphere_mesh())
    subjects = stack_graph_arrays(
        [mesh_to_graph_arrays(_sphere_mesh(warp=0.05 * (i + 1))) for i in range(2)]
    )
    results, mean_shape = register_cohort(
        template, subjects, TINY, jax.random.PRNGKey(0)
    )
    assert results["correspondences"].shape == (2, template.n_points)
    assert mean_shape.shape == (template.n_points, 3)
    assert np.all(np.isfinite(np.asarray(mean_shape)))


@pytest.mark.slow
def test_register_cohort_sharded_8dev():
    n_dev = len(jax.devices())
    assert n_dev >= 8, "conftest should provide 8 virtual CPU devices"
    template = mesh_to_graph_arrays(_sphere_mesh())
    subjects = stack_graph_arrays(
        [mesh_to_graph_arrays(_sphere_mesh(warp=0.02 * (i + 1))) for i in range(8)]
    )
    dev_mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8), ("cohort",))
    results, mean_shape = register_cohort(
        template, subjects, TINY, jax.random.PRNGKey(0), device_mesh=dev_mesh
    )
    assert results["correspondences"].shape == (8, template.n_points)
    # psum mean equals the arithmetic mean of the per-pair results.
    np.testing.assert_allclose(
        np.asarray(mean_shape),
        np.asarray(results["weighted_points"]).mean(axis=0),
        rtol=1e-5,
        atol=1e-6,
    )


@pytest.mark.slow
def test_sharded_matches_unsharded():
    """Sharded and unsharded cohort runs agree geometrically.

    Bitwise equality is not expected: per-device compilation changes f32
    reduction order, and the sphere's near-degenerate Laplacian spectrum
    amplifies that into different (equally valid) eigenvector bases.  The
    invariant is the registration GEOMETRY: final point locations must agree
    to a small fraction of the mesh scale.
    """
    from pyfocusr_tpu import load_mesh
    from pyfocusr_tpu.mesh import TriMesh as TM

    # Bone meshes: well-separated spectrum, so eigvec bases are stable across
    # compilations (the sphere's degenerate multiplets are not).
    bone = load_mesh("/root/reference/data/target_mesh.vtk")
    pts = np.asarray(bone.points)

    def warped(i):
        w = pts * (1.0 + 0.002 * (i + 1) * np.sin(0.05 * pts[:, [1]]))
        return TM(jnp.asarray(w, jnp.float32), bone.triangles)

    template = mesh_to_graph_arrays(bone)
    subjects = stack_graph_arrays(
        [mesh_to_graph_arrays(warped(i)) for i in range(8)]
    )
    cfg = TINY
    res_u, mean_u = register_cohort(template, subjects, cfg, jax.random.PRNGKey(1))
    dev_mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8), ("cohort",))
    res_s, mean_s = register_cohort(
        template, subjects, cfg, jax.random.PRNGKey(1), device_mesh=dev_mesh
    )
    wu = np.asarray(res_u["weighted_points"])
    ws = np.asarray(res_s["weighted_points"])
    d = np.linalg.norm(wu - ws, axis=-1)
    extent = np.linalg.norm(np.ptp(pts, axis=0))
    assert np.median(d) < 0.05 * extent, (np.median(d), extent)
    np.testing.assert_allclose(
        np.asarray(mean_u), np.asarray(mean_s), atol=0.05 * extent
    )


def test_build_ssm_template_mechanics():
    """Fast loop-mechanics check on tiny spheres: shapes, finiteness, motion
    trace.  (Geometric convergence is asserted on the bone meshes below —
    sphere-like shapes have near-degenerate spectra, so their maps are
    ambiguous and the mean shape is not meaningful.)"""
    meshes = [_sphere_mesh(warp=0.04 * (i + 1)) for i in range(2)]
    tmpl_mesh, results, motions = build_ssm_template(
        meshes, TINY, jax.random.PRNGKey(0), n_iterations=2
    )
    assert len(motions) == 2 and all(np.isfinite(motions))
    assert tmpl_mesh.n_points == meshes[0].n_points
    assert np.all(np.isfinite(np.asarray(tmpl_mesh.points)))
    assert results["correspondences"].shape[0] == 2


@pytest.mark.slow
def test_iterate_template_bone_converges():
    """Groupwise SSM loop on real bone meshes: after 3 rounds the template
    must lie ON the cohort's surfaces (mean NN distance well under 2% of the
    extent) with bounded per-round motion.

    Regression guard: before exact_lap_small, the eigsort auction returned
    wrong k x k matchings on the near-identical template-vs-subject pairs of
    round >= 2, scrambling the map (template drifted to ~5% of extent)."""
    from pyfocusr_tpu import load_mesh
    from pyfocusr_tpu.ops.knn import nn_query

    bone = load_mesh("/root/reference/data/target_mesh.vtk")
    pts = np.asarray(bone.points)

    def warped(i):
        w = pts * (1.0 + 0.004 * (i + 1) * np.sin(0.05 * pts[:, [1]]))
        return TriMesh(jnp.asarray(w, jnp.float32), bone.triangles)

    meshes = [warped(i) for i in range(2)]
    tmpl, results, motions = build_ssm_template(
        meshes, TINY, jax.random.PRNGKey(0), n_iterations=3
    )
    ext = float(np.linalg.norm(np.ptp(pts, axis=0)))
    for m in meshes:
        d, _ = nn_query(jnp.asarray(m.points), jnp.asarray(tmpl.points))
        assert float(jnp.mean(d)) < 0.02 * ext
    assert max(motions) < 0.1 * ext


def test_iterate_template_tolerance_stops_early():
    meshes = [_sphere_mesh(warp=0.02), _sphere_mesh(warp=0.04)]
    graphs = pad_cohort(meshes)
    targets = stack_graph_arrays(graphs)
    _, _, motions = iterate_template(
        graphs[0], targets, TINY, jax.random.PRNGKey(0),
        n_iterations=5, tolerance=1e9,  # absurdly large -> stop after round 1
    )
    assert len(motions) == 1


def test_cohort_shape_modes_recovers_planted_modes():
    """PCA of corresponded shapes: plant two orthogonal displacement fields
    with known variances; the modes and variances must come back (B-1 cap)."""
    from pyfocusr_tpu.parallel.cohort import cohort_shape_modes

    rng = np.random.default_rng(0)
    N, B = 500, 12
    base = rng.normal(size=(N, 3)).astype(np.float32)
    U1 = rng.normal(size=(N, 3)); U1 /= np.linalg.norm(U1)
    U2 = rng.normal(size=(N, 3)); U2 -= U1 * np.sum(U1 * U2); U2 /= np.linalg.norm(U2)
    c1 = rng.normal(scale=2.0, size=B).astype(np.float32)
    c2 = rng.normal(scale=0.5, size=B).astype(np.float32)
    shapes = base[None] + c1[:, None, None] * U1[None] + c2[:, None, None] * U2[None]

    mean, modes, variances = cohort_shape_modes(shapes)
    mean, modes, variances = map(np.asarray, (mean, modes, variances))
    np.testing.assert_allclose(mean, shapes.mean(axis=0), atol=1e-4)
    # mode 0 ~ U1 (dominant), mode 1 ~ U2 (up to sign)
    for i, U in enumerate((U1, U2)):
        cos = abs(np.sum(modes[i] * U))
        assert cos > 0.99, (i, cos)
    np.testing.assert_allclose(variances[0], c1.var(ddof=1), rtol=0.05)
    np.testing.assert_allclose(variances[1], c2.var(ddof=1), rtol=0.05)
    # only B-1 can be nonzero; the rest are numerically tiny
    assert np.all(variances[2:] < 1e-4 * variances[0])
    # n_modes truncation
    _, m2, v2 = cohort_shape_modes(shapes, n_modes=2)
    assert np.asarray(m2).shape == (2, N, 3) and np.asarray(v2).shape == (2,)


def test_pad_cohort_mixed_sizes():
    meshes = [
        _sphere_mesh(n_theta=8, n_phi=16),
        _sphere_mesh(n_theta=10, n_phi=20),
    ]
    graphs = pad_cohort(meshes)
    assert graphs[0].n_points == graphs[1].n_points
    assert graphs[0].neighbors.shape == graphs[1].neighbors.shape
    assert float(graphs[0].valid_mask.sum()) == meshes[0].n_points
    stacked = stack_graph_arrays(graphs)
    assert stacked.points.shape[0] == 2


def test_all_pairs_surface_errors():
    meshes = [_sphere_mesh(r=1.0), _sphere_mesh(r=1.0, warp=0.05)]
    errs = all_pairs_surface_errors(meshes)
    assert errs.shape == (2, 2)
    assert errs[0, 0] == 0 and errs[1, 1] == 0
    assert errs[0, 1] > 0 and errs[1, 0] > 0
    assert errs[0, 1] < 0.2  # warp scale bound


def test_cohort_subsample_guard():
    """Oversized subsample settings vs the smallest cohort mesh must raise
    (padding rows would leak into eigsort/CPD subsamples)."""
    import jax

    template = mesh_to_graph_arrays(_sphere_mesh())
    subjects = stack_graph_arrays(
        [mesh_to_graph_arrays(_sphere_mesh(warp=0.05))]
    )
    big = PipelineConfig(n_coords_spectral_ordering=10**6)
    with pytest.raises(ValueError, match="smallest"):
        register_cohort(template, subjects, big, jax.random.PRNGKey(0))


def test_iterate_template_procrustes_removes_pose_drift():
    """Procrustes-normalized template iteration (round-2, VERDICT r1 task 8):
    injecting a global rotation into every subject must not rotate the
    template — the mean shape is re-aligned to the previous template pose
    each round, so shape modes exclude pose."""
    from scipy.spatial.transform import Rotation

    def asym_mesh(extra):
        m = _sphere_mesh()
        p = np.asarray(m.points, np.float64)
        # Strongly asymmetric warp so ICP has a unique pose optimum.
        p = p * (
            1.0
            + 0.25 * np.sin(2.1 * p[:, [0]] + 0.7)
            + 0.15 * np.cos(3.3 * p[:, [1]])
            + extra * np.sin(3.0 * p[:, [2]])
        )
        return TriMesh(jnp.asarray(p, jnp.float32), m.triangles)

    base = [asym_mesh(0.04 * (i + 1)) for i in range(2)]
    R = Rotation.from_euler("xyz", [8, -5, 10], degrees=True).as_matrix()
    rotated = [
        TriMesh(
            jnp.asarray(np.asarray(m.points) @ R.T, jnp.float32), m.triangles
        )
        for m in base
    ]
    template = asym_mesh(0.0)
    key = jax.random.PRNGKey(0)

    def run(subjects):
        tg = mesh_to_graph_arrays(template)
        targets = stack_graph_arrays([mesh_to_graph_arrays(m) for m in subjects])
        out, _, _ = iterate_template(
            tg, targets, TINY, key, n_iterations=2, procrustes=True
        )
        return np.asarray(out.points, np.float64)

    t_base = run(base)
    t_rot = run(rotated)
    # Same template pose regardless of the subjects' global rotation: the
    # two results agree directly (no re-alignment needed for comparison).
    dev = np.linalg.norm(t_base - t_rot, axis=1).mean()
    scale = np.ptp(t_base)
    assert dev < 0.05 * scale, (dev, scale)

    # Without procrustes the same rotation injection visibly MOVES the
    # template (the drift the normalization exists to remove).
    def run_np(subjects):
        tg = mesh_to_graph_arrays(template)
        targets = stack_graph_arrays([mesh_to_graph_arrays(m) for m in subjects])
        out, _, _ = iterate_template(
            tg, targets, TINY, key, n_iterations=2, procrustes=False
        )
        return np.asarray(out.points, np.float64)

    dev_np = np.linalg.norm(run_np(base) - run_np(rotated), axis=1).mean()
    assert dev_np > dev, (dev_np, dev)


def test_iterate_template_checkpoints(tmp_path):
    """checkpoint_dir: per-round template snapshots for resumable SSM runs."""
    template = mesh_to_graph_arrays(_sphere_mesh())
    targets = stack_graph_arrays(
        [mesh_to_graph_arrays(_sphere_mesh(warp=0.05 * (i + 1))) for i in range(2)]
    )
    out, _, motions = iterate_template(
        template, targets, TINY, jax.random.PRNGKey(0),
        n_iterations=2, checkpoint_dir=str(tmp_path),
    )
    files = sorted(tmp_path.glob("template_round_*.npz"))
    assert len(files) == 2
    last = np.load(files[-1])
    np.testing.assert_allclose(last["points"], np.asarray(out.points))
    assert last["motion"].shape == (2,)


class TestSSMProjection:
    """Out-of-sample SSM fitting (ssm_project / fit_subject_to_ssm) — the
    round-trip that completes the SSM workflow cohort_shape_modes starts."""

    def _basis(self, n=200, m=3, seed=0):
        rng = np.random.default_rng(seed)
        mean = rng.normal(size=(n, 3)).astype(np.float32)
        raw = rng.normal(size=(m, n * 3))
        q, _ = np.linalg.qr(raw.T)  # orthonormal columns
        modes = q.T.reshape(m, n, 3).astype(np.float32)
        variances = np.array([4.0, 1.0, 0.25], np.float32)
        return mean, modes, variances

    def test_planted_coefficients_recovered(self):
        from pyfocusr_tpu.parallel.cohort import ssm_project

        mean, modes, variances = self._basis()
        b_true = np.array([1.3, -0.7, 0.4], np.float32)
        subject = mean + np.tensordot(b_true, modes, axes=1)
        # Raw displacement amplitudes without variances ...
        coeffs, recon, resid = ssm_project(subject, mean, modes)
        np.testing.assert_allclose(np.asarray(coeffs), b_true, atol=1e-4)
        np.testing.assert_allclose(np.asarray(recon), subject, atol=1e-4)
        assert float(resid) < 1e-4
        # ... and standard-deviation units (ssm_sample's convention) with.
        coeffs_sd, recon_sd, _ = ssm_project(subject, mean, modes, variances)
        np.testing.assert_allclose(
            np.asarray(coeffs_sd), b_true / np.sqrt(variances), atol=1e-4
        )
        np.testing.assert_allclose(np.asarray(recon_sd), subject, atol=1e-4)

    def test_out_of_basis_residual_reported(self):
        from pyfocusr_tpu.parallel.cohort import ssm_project

        mean, modes, _ = self._basis()
        rng = np.random.default_rng(5)
        noise = rng.normal(size=mean.shape).astype(np.float32) * 0.1
        # remove the in-basis component of the noise so the residual is pure
        flat = noise.reshape(-1)
        B = modes.reshape(3, -1)
        noise = (flat - B.T @ (B @ flat)).reshape(mean.shape)
        subject = mean + np.tensordot(
            np.array([0.5, 0.0, 0.0], np.float32), modes, axes=1
        ) + noise
        coeffs, recon, resid = ssm_project(subject, mean, modes)
        np.testing.assert_allclose(
            np.asarray(coeffs), [0.5, 0.0, 0.0], atol=1e-4
        )
        expected_rms = np.sqrt(np.mean(np.sum(noise**2, axis=1)))
        np.testing.assert_allclose(float(resid), expected_rms, rtol=1e-3)

    def test_n_modes_truncation(self):
        from pyfocusr_tpu.parallel.cohort import ssm_project

        mean, modes, _ = self._basis()
        subject = mean + np.tensordot(
            np.array([1.0, 1.0, 1.0], np.float32), modes, axes=1
        )
        coeffs, _, resid1 = ssm_project(subject, mean, modes, n_modes=1)
        assert coeffs.shape == (1,)
        _, _, resid3 = ssm_project(subject, mean, modes)
        assert float(resid3) < float(resid1)

    def test_fit_subject_end_to_end(self):
        """A held-out warped sphere registered + projected onto a 2-mode
        basis built from sphere shapes: the fit must reconstruct it better
        than the mean alone."""
        import jax

        from pyfocusr_tpu.parallel.cohort import (
            build_ssm_template,
            cohort_shape_modes,
            fit_subject_to_ssm,
        )

        meshes = [_sphere_mesh(warp=0.04 * (i + 1), seed=i) for i in range(3)]
        cfg = TINY
        template_mesh, results, _ = build_ssm_template(
            meshes, cfg, jax.random.PRNGKey(0), n_iterations=1
        )
        n_real = template_mesh.n_points
        mean, modes, variances = cohort_shape_modes(
            results["weighted_points"][:, :n_real]
        )
        # In-sample projection of a cohort member's CORRESPONDED points:
        # with B=3 subjects the 2 nonzero modes span the centered shapes
        # exactly, so reconstruction must be near-perfect while the mean
        # alone is not.
        from pyfocusr_tpu.parallel.cohort import ssm_project

        x0 = np.asarray(results["weighted_points"])[0, :n_real]
        c0, r0, resid0 = ssm_project(x0, mean, modes)
        mean_rms0 = float(np.sqrt(np.mean(np.sum((x0 - np.asarray(mean)) ** 2, axis=1))))
        assert float(resid0) < 0.05 * max(mean_rms0, 1e-9), (resid0, mean_rms0)

        # Held-out registration plumbing (finiteness only here: sphere
        # registration under the TINY config is registration-noise-bound —
        # the captured-energy gate runs on bones in the slow test below).
        coeffs, recon, resid = fit_subject_to_ssm(
            meshes[1], template_mesh, mean, modes, cfg, jax.random.PRNGKey(7)
        )
        assert np.all(np.isfinite(np.asarray(coeffs)))
        assert recon.shape == (n_real, 3)

    @pytest.mark.slow
    def test_fit_held_out_bone_captures_energy(self, mesh_5k_target, mesh_5k_source):
        """Bone-mesh SSM: build a 2-subject model from smooth warps of the
        source bone, fit a HELD-OUT intermediate warp, and gate the
        captured-energy fraction (|coeffs|^2 / (|coeffs|^2 + N resid^2))
        — the real out-of-sample guarantee registration noise hid on
        spheres."""
        from conftest import SYNTHETIC_FIXTURES

        if SYNTHETIC_FIXTURES:
            # The monotonicity gate below is calibrated to the real bone
            # geometry; at these iteration budgets the synthetic stand-in's
            # fit is too noisy to order the 0.03/0.06 warps reliably
            # (measured: coeffs 26.5/49.6/47.5).
            pytest.skip("calibrated thresholds need the bundled bone mesh")
        import jax

        from pyfocusr_tpu.mesh import TriMesh
        from pyfocusr_tpu.parallel.cohort import (
            build_ssm_template,
            cohort_shape_modes,
            fit_subject_to_ssm,
        )
        from pyfocusr_tpu.pipeline import PipelineConfig

        base = np.asarray(mesh_5k_source.points, np.float64)
        tris = mesh_5k_source.triangles

        def warped(a):
            pts = base * (1.0 + a * np.sin(0.05 * base[:, [1]]))
            return TriMesh(np.asarray(pts, np.float32), tris)

        cohort = [warped(0.0), warped(0.06)]
        cfg = PipelineConfig(
            icp_iterations=20,
            # min(): the synthetic fixture stand-in has 2562 vertices, and
            # check_cohort_config rejects subsamples above the mesh size.
            n_coords_spectral_ordering=min(5000, len(base)),
            n_coords_spectral_registration=800,
            non_rigid_max_iterations=60,
            graph_smoothing_iterations=100,
            projection_smooth_iterations=1,
        )
        template_mesh, results, _ = build_ssm_template(
            cohort, cfg, jax.random.PRNGKey(0), n_iterations=1
        )
        n_real = template_mesh.n_points
        mean, modes, variances = cohort_shape_modes(
            results["weighted_points"][:, :n_real]
        )
        # Gate: the fitted mode-1 coefficient must TRACK the planted warp
        # amplitude linearly (measured: a=0 -> -151, a=0.03 -> +11,
        # a=0.06 -> +173 on one seed) and recover the build-time
        # coefficient span.  A captured-energy gate is not usable here:
        # the residual is dominated by registration repeatability noise
        # (~2-3 mm rms under this trimmed config), not model error.
        from pyfocusr_tpu.parallel.cohort import ssm_project

        b_build = [
            float(
                ssm_project(
                    np.asarray(results["weighted_points"])[i, :n_real],
                    mean, modes,
                )[0][0]
            )
            for i in range(2)
        ]
        build_span = b_build[1] - b_build[0]

        fitted = []
        for i, a in enumerate((0.0, 0.03, 0.06)):
            coeffs, recon, resid = fit_subject_to_ssm(
                warped(a), template_mesh, mean, modes, cfg,
                jax.random.PRNGKey(5 + i),
            )
            assert np.isfinite(float(resid))
            fitted.append(float(np.asarray(coeffs)[0]))
        # monotone in the warp amplitude, matching the build-time sign
        s = np.sign(build_span)
        assert s * fitted[0] < s * fitted[1] < s * fitted[2], (fitted, build_span)
        # span recovered within 35%
        fit_span = fitted[2] - fitted[0]
        assert abs(fit_span - build_span) < 0.35 * abs(build_span), (
            fitted, b_build,
        )


def test_register_cohort_prepared_template_agrees():
    """The hoisted-template path (prepare_source broadcast into every lane)
    agrees geometrically with the per-lane recompute.  Bone geometry: its
    spectrum is well-separated, so the hoisted eigensolve (different PRNG
    init, and computed pre-ICP) converges to the same basis."""
    from pyfocusr_tpu import load_mesh
    from pyfocusr_tpu.mesh import TriMesh as TM

    bone = load_mesh("/root/reference/data/target_mesh.vtk")
    pts = np.asarray(bone.points)

    def warped(i):
        w = pts * (1.0 + 0.002 * (i + 1) * np.sin(0.05 * pts[:, [1]]))
        return TM(jnp.asarray(w, jnp.float32), bone.triangles)

    template = mesh_to_graph_arrays(bone)
    subjects = stack_graph_arrays(
        [mesh_to_graph_arrays(warped(i)) for i in range(2)]
    )
    res_p, mean_p = register_cohort(
        template, subjects, TINY, jax.random.PRNGKey(2), prepared_template=True
    )
    res_u, mean_u = register_cohort(
        template, subjects, TINY, jax.random.PRNGKey(2), prepared_template=False
    )
    wp = np.asarray(res_p["weighted_points"])
    wu = np.asarray(res_u["weighted_points"])
    extent = np.linalg.norm(np.ptp(pts, axis=0))
    d = np.linalg.norm(wp - wu, axis=-1)
    assert np.median(d) < 0.05 * extent, (np.median(d), extent)
    np.testing.assert_allclose(mean_p, mean_u, atol=0.05 * extent)
    # Most correspondences identical (differences only at decision
    # boundaries of the NN search, from f32 eigensolve noise).
    agree = np.mean(
        np.asarray(res_p["correspondences"]) == np.asarray(res_u["correspondences"])
    )
    assert agree > 0.9, agree


def test_register_cohort_prepared_template_guard():
    """prepared_template=True on a non-hoistable config raises; the default
    (None) silently falls back to the per-lane recompute."""
    template = mesh_to_graph_arrays(_sphere_mesh())
    subjects = stack_graph_arrays(
        [mesh_to_graph_arrays(_sphere_mesh(warp=0.05))]
    )
    import dataclasses

    sim = dataclasses.replace(TINY, icp_registration_mode="similarity")
    with pytest.raises(ValueError, match="pair-independent"):
        register_cohort(
            template, subjects, sim, jax.random.PRNGKey(0),
            prepared_template=True,
        )
    res, mean_shape = register_cohort(
        template, subjects, sim, jax.random.PRNGKey(0)
    )
    assert np.all(np.isfinite(np.asarray(mean_shape)))


class TestSSMSample:
    """Generative SSM sampling (ssm_sample): the third leg of the workflow
    (fit -> project -> sample)."""

    def _basis(self, n=200, m=3, seed=0):
        rng = np.random.default_rng(seed)
        mean = rng.normal(size=(n, 3)).astype(np.float32)
        raw = rng.normal(size=(m, n * 3))
        q, _ = np.linalg.qr(raw.T)
        modes = q.T.reshape(m, n, 3).astype(np.float32)
        variances = np.array([4.0, 1.0, 0.25], np.float32)
        return mean, modes, variances

    def test_explicit_coefficients_roundtrip(self):
        from pyfocusr_tpu.parallel.cohort import ssm_project, ssm_sample

        mean, modes, variances = self._basis()
        b = np.array([2.0, -1.0, 0.5], np.float32)  # sd units
        shape = ssm_sample(mean, modes, variances, b=b)
        assert shape.shape == mean.shape
        coeffs, _, resid = ssm_project(shape, mean, modes)
        np.testing.assert_allclose(
            np.asarray(coeffs), b * np.sqrt(variances), atol=1e-4
        )
        assert float(resid) < 1e-4

    def test_random_batch_clipped(self):
        from pyfocusr_tpu.parallel.cohort import ssm_project, ssm_sample

        mean, modes, variances = self._basis()
        shapes = ssm_sample(
            mean, modes, variances, key=jax.random.PRNGKey(0),
            n_samples=16, clip_std=2.0,
        )
        assert shapes.shape == (16, *mean.shape)
        assert np.all(np.isfinite(np.asarray(shapes)))
        sd = np.sqrt(variances)
        for s in np.asarray(shapes):
            coeffs, _, _ = ssm_project(s, mean, modes)
            assert np.all(np.abs(np.asarray(coeffs)) <= 2.0 * sd + 1e-4)

    def test_argument_validation(self):
        from pyfocusr_tpu.parallel.cohort import ssm_sample

        mean, modes, variances = self._basis()
        with pytest.raises(ValueError, match="exactly one"):
            ssm_sample(mean, modes, variances)
        with pytest.raises(ValueError, match="exactly one"):
            ssm_sample(
                mean, modes, variances, b=[1.0, 0.0, 0.0],
                key=jax.random.PRNGKey(0),
            )
        with pytest.raises(ValueError, match="coefficient length"):
            ssm_sample(mean, modes, variances, b=[1.0, 0.0])


def test_hungarian_rejects_padded_targets():
    """Padding on the TARGET side of a cohort must also trip the
    'hungarian' guard — dead rows would steal one-to-one assignments."""
    template = mesh_to_graph_arrays(_sphere_mesh(n_theta=8, n_phi=16))
    # Unequal subjects force pad_cohort to pad the smaller one.
    subjects = stack_graph_arrays(
        pad_cohort(
            [
                _sphere_mesh(n_theta=8, n_phi=16),
                _sphere_mesh(n_theta=10, n_phi=20),
            ]
        )
    )
    cfg = PipelineConfig(
        n_coords_spectral_ordering=64,
        n_coords_spectral_registration=64,
        icp_n_landmarks=64,  # below min real count: isolates the hungarian guard
        initial_correspondence_type="hungarian",
        non_rigid_max_iterations=2,
        graph_smoothing_iterations=2,
        projection_smooth_iterations=1,
    )
    with pytest.raises(ValueError, match="hungarian"):
        register_cohort(template, subjects, cfg, jax.random.PRNGKey(0))
    # The ICP landmark draw has the same padding hazard: an oversized
    # icp_n_landmarks on a PADDED cohort must be rejected too.
    cfg_icp = PipelineConfig(
        n_coords_spectral_ordering=64,
        n_coords_spectral_registration=64,
        icp_n_landmarks=2000,
        non_rigid_max_iterations=2,
        graph_smoothing_iterations=2,
        projection_smooth_iterations=1,
    )
    with pytest.raises(ValueError, match="icp_n_landmarks"):
        register_cohort(template, subjects, cfg_icp, jax.random.PRNGKey(0))


def test_pad_cohort_then_arrays_match_direct_build():
    """pad_cohort's topology reuse must be byte-identical to building the
    arrays from scratch with the same pad sizes."""
    meshes = [
        _sphere_mesh(n_theta=8, n_phi=16),
        _sphere_mesh(n_theta=10, n_phi=20),
    ]
    via_reuse = pad_cohort(meshes)
    n_pad = max(m.n_points for m in meshes)
    d_pad = max(g.neighbors.shape[1] for g in via_reuse)
    c_pad = via_reuse[0].null_indicators.shape[1]
    e_pad = via_reuse[0].overflow.shape[0]
    for m, g in zip(meshes, via_reuse):
        direct = mesh_to_graph_arrays(
            m,
            pad_n_points=n_pad,
            pad_degree=d_pad,
            pad_components=c_pad,
            pad_overflow=e_pad,
        )
        for a, b in zip(jax.tree.leaves(direct), jax.tree.leaves(g)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ssm_project_variances_returns_std_units():
    """With variances passed, ssm_project's coefficients are in the
    standard-deviation units ssm_sample consumes: project(sample(b)) == b."""
    from pyfocusr_tpu.parallel.cohort import ssm_project, ssm_sample

    rng = np.random.default_rng(0)
    n = 40
    mean = rng.standard_normal((n, 3)).astype(np.float32)
    raw = rng.standard_normal((2, n, 3)).astype(np.float32)
    # Orthonormal mode fields
    flat = raw.reshape(2, -1)
    q, _ = np.linalg.qr(flat.T)
    modes = q.T.reshape(2, n, 3).astype(np.float32)
    variances = np.asarray([4.0, 0.25], np.float32)
    b = np.asarray([1.5, -2.0], np.float32)
    shape = ssm_sample(mean, modes, variances, b=b)
    coeffs, recon, resid = ssm_project(shape, mean, modes, variances=variances)
    np.testing.assert_allclose(np.asarray(coeffs), b, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(recon), np.asarray(shape), atol=1e-4)
    assert float(resid) < 1e-4
    # Without variances: raw displacement amplitudes (b * sigma).
    raw_coeffs, _, _ = ssm_project(shape, mean, modes)
    np.testing.assert_allclose(
        np.asarray(raw_coeffs), b * np.sqrt(variances), rtol=1e-4, atol=1e-4
    )
