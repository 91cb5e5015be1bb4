#!/usr/bin/env python
"""Multi-resolution registration of very large meshes (100k+ vertices).

Builds a large pair by midpoint-subdividing the bundled 15k bone meshes
(one round -> ~60k vertices, two rounds -> ~240k), then registers them with
``pyfocusr_tpu.multires.register_pair_multires``: decimate to ~12k, run the
full spectral pipeline at the coarse level, prolong the correspondences
through the cluster maps, and refine at full resolution with the
correspondence-smoothing + final-location stages.  Time and memory scale
linearly with the fine vertex count.

Usage:
    python examples/multires_large_mesh.py [subdivisions] [out_dir] [--warm]

``--warm`` registers a second time in the same process and reports the
steady-state (compile-free) time — the per-pair cost when sweeping a cohort
of same-sized meshes.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from pyfocusr_tpu import load_mesh, save_mesh
from pyfocusr_tpu.multires import register_pair_multires, subdivide
from pyfocusr_tpu.pipeline import PipelineConfig

DATA = "/root/reference/data"


def main():
    args = [a for a in sys.argv[1:] if a != "--warm"]
    warm = "--warm" in sys.argv[1:]
    n_sub = int(args[0]) if len(args) > 0 else 1
    out_dir = args[1] if len(args) > 1 else "multires_out"
    os.makedirs(out_dir, exist_ok=True)

    target = load_mesh(f"{DATA}/target_mesh_15k.vtk")
    source = load_mesh(f"{DATA}/source_mesh_15k.vtk")
    for _ in range(n_sub):
        target, source = subdivide(target), subdivide(source)
    print(f"fine pair: {target.n_points} / {source.n_points} vertices")

    cfg = PipelineConfig(
        get_weighted_spectral_coords=False,
        non_rigid_alpha=0.01,
        non_rigid_beta=50.0,
        non_rigid_max_iterations=300,
        rigid_before_non_rigid_reg=False,
        projection_smooth_iterations=1,
        graph_smoothing_iterations=600,
        n_coords_spectral_ordering=10000,
        n_coords_spectral_registration=1000,
    )
    t0 = time.perf_counter()
    fine, coarse = register_pair_multires(
        target, source, cfg, jax.random.PRNGKey(0), coarse_n=12000
    )
    jax.block_until_ready(fine)
    dt = time.perf_counter() - t0

    if warm:
        t0 = time.perf_counter()
        fine, coarse = register_pair_multires(
            target, source, cfg, jax.random.PRNGKey(1), coarse_n=12000
        )
        jax.block_until_ready(fine)
        dt_warm = time.perf_counter() - t0
        print(f"warm (steady-state) second registration: {dt_warm:.1f}s")

    corr = np.asarray(fine["correspondences"])
    w = np.asarray(fine["weighted_points"], np.float64)
    src = np.asarray(source.points, np.float64)
    print(
        f"registered in {dt:.1f}s  unique corr "
        f"{len(np.unique(corr))}/{len(corr)}  mean displacement "
        f"{np.linalg.norm(w - src, axis=1).mean():.2f} mm"
    )
    out = source.with_points(fine["weighted_points"])
    save_mesh(os.path.join(out_dir, "transformed_source.vtk"), out)
    np.save(os.path.join(out_dir, "correspondences.npy"), corr)
    print(f"outputs in {out_dir}/")


if __name__ == "__main__":
    main()
