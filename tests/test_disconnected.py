"""Disconnected meshes (extra Laplacian null modes) register correctly —
the bundled source_mesh_15k has two isolated vertices; this covers the same
path with a fast synthetic case."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyfocusr_tpu.mesh import TriMesh, build_topology
from pyfocusr_tpu.pipeline import PipelineConfig, mesh_to_graph_arrays, register_pair


def _mesh_with_isolated_vertices(n_isolated=2):
    import sys

    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from test_curvature_icp import make_sphere

    pts, tris = make_sphere(n_theta=10, n_phi=20)
    extra = np.full((n_isolated, 3), 5.0) + np.arange(n_isolated)[:, None]
    pts = np.concatenate([pts, extra])
    return TriMesh(jnp.asarray(pts, jnp.float32), jnp.asarray(tris))


def test_topology_counts_components():
    mesh = _mesh_with_isolated_vertices(2)
    topo = build_topology(np.asarray(mesh.triangles), mesh.n_points)
    assert topo.n_components == 3


def test_registration_with_isolated_vertices():
    target = _mesh_with_isolated_vertices(2)
    source = _mesh_with_isolated_vertices(0)
    cfg = PipelineConfig(
        icp_iterations=10,
        n_coords_spectral_ordering=150,
        n_coords_spectral_registration=100,
        non_rigid_max_iterations=10,
        non_rigid_n_eigens=30,
        graph_smoothing_iterations=10,
        projection_smooth_iterations=2,
        eig_cg_iters=60,
    )
    res = register_pair(
        mesh_to_graph_arrays(target),
        mesh_to_graph_arrays(source),
        cfg,
        jax.random.PRNGKey(0),
    )
    lams = np.asarray(res["eig_vals_target"])
    # No near-zero eigenvalues leak through despite the 3 null modes.
    assert np.all(lams > 1e-6), lams
    assert np.all(np.isfinite(np.asarray(res["weighted_points"])))


def test_config_validation():
    with pytest.raises(ValueError, match="transform mode"):
        PipelineConfig(icp_registration_mode="banana")
    with pytest.raises(ValueError, match="eig_method"):
        PipelineConfig(eig_method="arpack")
    with pytest.raises(ValueError, match="n_spectral_features"):
        PipelineConfig(n_spectral_features=0)
    with pytest.raises(ValueError, match="alpha"):
        PipelineConfig(non_rigid_alpha=-1.0)
