"""End-to-end registration on synthetic meshes — no reference data needed.

Every other e2e test gates on /root/reference/data (skipped on plain CI
runners); this module keeps a full-pipeline smoke path alive anywhere by
generating a warped-sphere pair in-process (same generator the driver
entry uses).
"""

import jax
import numpy as np
import pytest

from __graft_entry__ import _small_pair
from pyfocusr_tpu.pipeline import (
    PipelineConfig,
    mesh_to_graph_arrays,
    register_pair,
)


@pytest.fixture(scope="module")
def sphere_pair():
    return _small_pair(n_theta=12, n_phi=24)


def test_register_synthetic_pair(sphere_pair):
    target, source = sphere_pair
    cfg = PipelineConfig(
        n_spectral_features=3,
        n_extra_spectral=2,
        non_rigid_max_iterations=30,
        graph_smoothing_iterations=30,
        projection_smooth_iterations=1,
        n_coords_spectral_registration=200,
        n_coords_spectral_ordering=200,
    )
    tg, sg = mesh_to_graph_arrays(target), mesh_to_graph_arrays(source)
    res = register_pair(tg, sg, cfg, jax.random.PRNGKey(0))
    corr = np.asarray(res["correspondences"])
    n = tg.points.shape[0]
    assert corr.shape == (sg.points.shape[0],)
    assert corr.min() >= 0 and corr.max() < n
    # a mild warp of the same sphere: correspondences should be rich and
    # the transformed points should land near the target surface
    assert len(np.unique(corr)) > 0.5 * len(corr)
    w = np.asarray(res["weighted_points"])
    assert np.all(np.isfinite(w))
    from pyfocusr_tpu.ops.knn import nn_query

    d, _ = nn_query(tg.points, w)
    # unit-ish sphere: mean surface distance well under the mesh spacing
    assert float(np.asarray(d).mean()) < 0.1


def test_synthetic_pair_save_load_roundtrip(sphere_pair, tmp_path):
    from pyfocusr_tpu import load_mesh, save_mesh

    target, _ = sphere_pair
    for ext in ("vtk", "ply", "stl", "obj"):
        p = str(tmp_path / f"sphere.{ext}")
        save_mesh(p, target)
        back = load_mesh(p)
        assert back.triangles.shape == target.triangles.shape
