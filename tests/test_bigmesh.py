"""Intra-mesh (vertex-sharded) refine — parallel/bigmesh.py — on the
8-virtual-device CPU mesh (SURVEY §4: 'multi-chip without a cluster').

The acceptance bar: the sharded refine is the SAME math as the
single-device ``multires._refine_fine_level`` per row, so outputs must
agree to f32 roundoff and correspondence indices must match (ties are
measure-zero on these irrational-coordinate spheres)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from pyfocusr_tpu.mesh import TriMesh
from pyfocusr_tpu.multires import _refine_fine_level, register_pair_multires, subdivide
from pyfocusr_tpu.ops.knn import SENTINEL, nn_query
from pyfocusr_tpu.parallel.bigmesh import (
    pad_rows_for_sharding,
    partition_overflow_by_owner,
    refine_fine_level_sharded,
)
from pyfocusr_tpu.pipeline import PipelineConfig, mesh_to_graph_arrays


def _sphere_mesh(r=1.0, warp=0.0, n_theta=10, n_phi=20):
    import sys

    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from test_curvature_icp import make_sphere

    pts, tris = make_sphere(n_theta=n_theta, n_phi=n_phi, r=r)
    if warp:
        pts = pts * (1.0 + warp * np.sin(3.0 * pts[:, [1]]))
    return TriMesh(jnp.asarray(pts, jnp.float32), jnp.asarray(tris))


CFG = PipelineConfig(
    graph_smoothing_iterations=25,
    projection_smooth_iterations=4,
)


def _mesh8():
    return Mesh(np.asarray(jax.devices()[:8]).reshape(8), ("verts",))


def _pair(degree_cap=24):
    tgt = mesh_to_graph_arrays(_sphere_mesh(), degree_cap=degree_cap)
    src = mesh_to_graph_arrays(_sphere_mesh(warp=0.06), degree_cap=degree_cap)
    tq = jnp.where(tgt.valid_mask[:, None] > 0, tgt.points, SENTINEL)
    _, init = nn_query(tq, src.points)
    return tgt, src, init


def _compare(res_ref, res_sh):
    agree = np.mean(
        np.asarray(res_ref["correspondences"])
        == np.asarray(res_sh["correspondences"])
    )
    assert agree >= 0.99, f"correspondence agreement {agree}"
    for k in (
        "weighted_points",
        "average_points",
        "smoothed_target_coords",
        "source_projected_on_target",
    ):
        np.testing.assert_allclose(
            np.asarray(res_ref[k]), np.asarray(res_sh[k]), rtol=2e-4, atol=2e-5,
            err_msg=k,
        )


@pytest.mark.parametrize("method", ["chebyshev", "exact"])
def test_sharded_refine_matches_single_device(method):
    tgt, src, init = _pair()
    cfg = dataclasses.replace(CFG, smoothing_method=method)
    res_ref = _refine_fine_level(tgt, src, init, cfg)
    res_sh = refine_fine_level_sharded(tgt, src, init, cfg, _mesh8())
    # N = 182 is not divisible by 8, so row padding is exercised too.
    assert tgt.n_points % 8 != 0
    _compare(res_ref, res_sh)


def test_sharded_refine_hub_overflow():
    """Degree-capped graphs carry hub spill edges; the sharded path must
    scatter them on their owner shard (poles of the UV sphere have degree
    n_phi=20 > cap 6)."""
    tgt, src, init = _pair(degree_cap=6)
    assert int(tgt.overflow.shape[0]) > 0
    res_ref = _refine_fine_level(tgt, src, init, CFG)
    res_sh = refine_fine_level_sharded(tgt, src, init, CFG, _mesh8())
    _compare(res_ref, res_sh)


def test_sharded_refine_no_smoothing():
    tgt, src, init = _pair()
    cfg = dataclasses.replace(CFG, smooth_correspondences=False)
    res_ref = _refine_fine_level(tgt, src, init, cfg)
    res_sh = refine_fine_level_sharded(tgt, src, init, cfg, _mesh8())
    np.testing.assert_array_equal(
        np.asarray(res_ref["correspondences"]),
        np.asarray(res_sh["correspondences"]),
    )
    _compare(res_ref, res_sh)


def test_partition_overflow_by_owner_roundtrip():
    """Every real directed edge survives partitioning onto its owner shard;
    padding rows are weight-0 self-loops inside the owner's row range."""
    rng = np.random.default_rng(0)
    n, n_shards = 64, 8
    e = rng.integers(0, n, size=(37, 2))
    e = e[e[:, 0] != e[:, 1]]
    out = np.asarray(partition_overflow_by_owner(jnp.asarray(e, jnp.int32), n, n_shards))
    per = out.reshape(n_shards, -1, 2)
    rows_per = n // n_shards
    real = []
    for s in range(n_shards):
        for src, dst in per[s]:
            if src == dst:
                assert src // rows_per == s  # self-loop inside owner shard
            else:
                assert src // rows_per == s  # owner placement
                real.append((src, dst))
    assert sorted(map(tuple, e.tolist())) == sorted(real)


def test_pad_rows_for_sharding_masks():
    tgt = mesh_to_graph_arrays(_sphere_mesh())
    padded, n = pad_rows_for_sharding(tgt, 8)
    assert n == tgt.n_points
    assert padded.n_points % 8 == 0
    pad_rows = np.asarray(padded.valid_mask[n:])
    assert np.all(pad_rows == 0)
    assert np.all(np.asarray(padded.nbr_mask[n:]) == 0)


@pytest.mark.slow
def test_multires_sharded_device_mesh():
    """register_pair_multires(device_mesh=...) routes the fine refine
    through the sharded path and agrees with the single-device run."""
    tgt_m = subdivide(_sphere_mesh())
    src_m = subdivide(_sphere_mesh(warp=0.05))
    cfg = PipelineConfig(
        icp_iterations=10,
        n_coords_spectral_ordering=120,
        n_coords_spectral_registration=80,
        non_rigid_max_iterations=10,
        non_rigid_n_eigens=20,
        graph_smoothing_iterations=10,
        projection_smooth_iterations=2,
        eig_cg_iters=60,
    )
    key = jax.random.PRNGKey(0)
    fine_ref, _ = register_pair_multires(tgt_m, src_m, cfg, key, coarse_n=120, seed=3)
    fine_sh, _ = register_pair_multires(
        tgt_m, src_m, cfg, key, coarse_n=120, seed=3, device_mesh=_mesh8()
    )
    agree = np.mean(
        np.asarray(fine_ref["correspondences"])
        == np.asarray(fine_sh["correspondences"])
    )
    assert agree >= 0.99
    np.testing.assert_allclose(
        np.asarray(fine_ref["weighted_points"]),
        np.asarray(fine_sh["weighted_points"]),
        rtol=2e-4,
        atol=2e-5,
    )
