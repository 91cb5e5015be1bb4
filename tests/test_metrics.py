"""Registration-quality metrics (pyfocusr_tpu/metrics.py)."""

import numpy as np
import pytest

from pyfocusr_tpu.metrics import registration_quality, surface_distance


def test_identity_registration_is_perfect():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(50, 3))

    class M:
        points = pts

    res = {
        "correspondences": np.arange(50),
        "weighted_points": pts.copy(),
    }
    q = registration_quality(M, M, res)
    assert q["unique_fraction"] == 1.0
    assert q["mean_displacement_mm"] == 0.0
    assert q["symmetric_surface_dist_mm"] == 0.0
    assert q["hausdorff_mm"] == 0.0
    assert q["n_unique_correspondences"] == 50


def test_known_offset_values():
    src = np.array([[0, 0, 0], [10, 0, 0]], np.float64)
    tgt = src.copy()
    moved = np.array([[1, 0, 0], [10, 0, 0]], np.float64)
    res = {"correspondences": np.array([0, 0]), "weighted_points": moved}
    q = registration_quality(tgt, src, res)
    assert q["unique_fraction"] == 0.5
    # One point moved 1 mm, one stayed: mean displacement 0.5.
    assert q["mean_displacement_mm"] == pytest.approx(0.5, abs=1e-6)
    # fwd NN dists: [1, 0]; rev NN dists: [1, 0] -> symmetric mean 0.5.
    assert q["symmetric_surface_dist_mm"] == pytest.approx(0.5, abs=1e-6)
    assert q["hausdorff_mm"] == pytest.approx(1.0, abs=1e-6)


def test_surface_distance_symmetric_and_accepts_meshes():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(30, 3))
    b = a + 0.001 * rng.normal(size=(30, 3))

    class M:
        points = b

    m1, h1 = surface_distance(a, M)
    m2, h2 = surface_distance(M, a)
    assert m1 == pytest.approx(m2, rel=1e-6)
    assert h1 == pytest.approx(h2, rel=1e-6)
    assert 0 < m1 < 0.01 and m1 <= h1


def test_shape_mismatch_raises():
    pts = np.zeros((4, 3))
    res = {"correspondences": np.arange(3), "weighted_points": np.zeros((3, 3))}
    with pytest.raises(ValueError, match="does not match source"):
        registration_quality(pts, pts, res)


def test_real_pipeline_quality(mesh_5k_target, mesh_5k_source):
    """End-to-end: metrics on an actual registration land in the healthy
    band (and the dict is JSON-serializable)."""
    import json

    import jax

    from pyfocusr_tpu.pipeline import (
        PipelineConfig,
        mesh_to_graph_arrays,
        register_pair,
    )

    cfg = PipelineConfig(
        non_rigid_max_iterations=50,
        graph_smoothing_iterations=50,
        n_coords_spectral_registration=500,
        n_coords_spectral_ordering=min(5000, mesh_5k_source.n_points),
    )
    res = register_pair(
        mesh_to_graph_arrays(mesh_5k_target),
        mesh_to_graph_arrays(mesh_5k_source),
        cfg,
        jax.random.PRNGKey(0),
    )
    q = registration_quality(mesh_5k_target, mesh_5k_source, res)
    json.dumps(q)  # plain python scalars only
    assert q["unique_fraction"] > 0.5
    assert 0 < q["symmetric_surface_dist_mm"] < q["hausdorff_mm"]
    assert q["n_source_points"] == mesh_5k_source.n_points


def test_focusr_registration_quality_method(mesh_5k_target, mesh_5k_source):
    """Focusr.registration_quality(): the class-API entry to the metrics."""
    import pytest as _pytest

    from pyfocusr_tpu import Focusr

    reg = Focusr(
        vtk_mesh_target=mesh_5k_target,
        vtk_mesh_source=mesh_5k_source,
        n_spectral_features=3,
        n_extra_spectral=3,
        list_features_to_calc=[],
        non_rigid_max_iterations=30,
        graph_smoothing_iterations=30,
        projection_smooth_iterations=1,
        n_coords_spectral_registration=500,
        n_coords_spectral_ordering=min(5000, mesh_5k_source.n_points),
        seed=0,
    )
    with _pytest.raises(ValueError, match="align_maps"):
        reg.registration_quality()
    reg.align_maps_pipeline()
    q = reg.registration_quality()
    assert q["unique_fraction"] > 0.5
    assert q["n_source_points"] == mesh_5k_source.n_points
