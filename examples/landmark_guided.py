#!/usr/bin/env python
"""Landmark-guided registration — a beyond-reference capability.

Anatomical workflows often have a handful of expert-picked paired
landmarks (femoral notch, condyle apices, ...).  ``register_pair`` accepts
them as MAP-CPD priors (``landmark_pairs`` + ``cfg.landmark_weight``): the
spectral registration stays fully automatic everywhere else, but the
pinned correspondences pull the named points onto each other.

This script registers the bundled 5k pair twice — unconstrained vs with
four index-pair landmarks — and reports, for both runs:

* mean distance of the landmarked source vertices to their designated
  target vertices after transformation (the quantity landmarks optimize),
* unique-correspondence fraction and mean surface distance (global
  quality, which must NOT degrade).

CLI equivalent:
    pyfocusr-tpu register target.vtk source.vtk --landmarks lm.txt \
        --landmark-weight 200 -o out/

Usage:
    python examples/landmark_guided.py [out_dir]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from pyfocusr_tpu import load_mesh, save_mesh

DATA = "/root/reference/data"

# Source vertices an expert would pick landmarks at.  The paired target
# vertices are derived below from the unconstrained run's own map —
# emulating an expert CONFIRMING the automatic correspondence at a few
# anatomical points.  (Pinning vertices to anatomically-wrong targets —
# e.g. naive i -> i pairs on these two different subjects — measurably
# degrades global quality: the prior fights the true map.  Landmarks
# must encode knowledge, not noise.)
LANDMARK_SRC = np.array([10, 500, 2500, 4000], np.int32)


def run(landmark_pairs, weight, target, source, cfg_kwargs, key, lm_eval):
    import jax

    from pyfocusr_tpu.pipeline import (
        PipelineConfig,
        mesh_to_graph_arrays,
        register_pair,
    )

    cfg = PipelineConfig(landmark_weight=weight, **cfg_kwargs)
    tg, sg = mesh_to_graph_arrays(target), mesh_to_graph_arrays(source)
    t0 = time.perf_counter()
    res = register_pair(tg, sg, cfg, key, landmark_pairs=landmark_pairs)
    jax.block_until_ready(res)
    dt = time.perf_counter() - t0

    tgt = np.asarray(target.points, np.float64)
    moved = np.asarray(res["weighted_points"], np.float64)
    corr = np.asarray(res["correspondences"])
    stats = {
        "seconds": round(dt, 3),
        "unique_fraction": round(len(np.unique(corr)) / len(corr), 4),
    }
    if lm_eval is not None:
        stats["landmark_mean_dist_mm"] = round(
            float(
                np.linalg.norm(
                    moved[lm_eval[:, 0]] - tgt[lm_eval[:, 1]], axis=1
                ).mean()
            ),
            4,
        )
    # Global quality: transformed source to (subsampled) target surface.
    d2 = ((moved[:, None, :] - tgt[None, :: 7, :]) ** 2).sum(-1)
    stats["approx_surface_dist_mm"] = round(float(np.sqrt(d2.min(1)).mean()), 4)
    return stats, res


def main(out_dir="landmark_out"):
    import jax

    os.makedirs(out_dir, exist_ok=True)
    target = load_mesh(f"{DATA}/target_mesh.vtk")
    source = load_mesh(f"{DATA}/source_mesh.vtk")
    cfg_kwargs = dict(
        non_rigid_max_iterations=100,
        graph_smoothing_iterations=300,
        n_coords_spectral_registration=1000,
    )
    key = jax.random.PRNGKey(0)

    free, res_free = run(None, 100.0, target, source, cfg_kwargs, key, None)
    # "Expert picks": the automatic map's own correspondences at the chosen
    # source vertices (an expert confirming anatomy at a few points).
    corr_free = np.asarray(res_free["correspondences"])
    landmarks = np.stack(
        [LANDMARK_SRC, corr_free[LANDMARK_SRC].astype(np.int32)], axis=1
    )
    # Evaluate the free run against the same picks (no re-run needed).
    tgt = np.asarray(target.points, np.float64)
    moved_free = np.asarray(res_free["weighted_points"], np.float64)
    free["landmark_mean_dist_mm"] = round(
        float(
            np.linalg.norm(
                moved_free[landmarks[:, 0]] - tgt[landmarks[:, 1]], axis=1
            ).mean()
        ),
        4,
    )

    pinned, res = run(
        landmarks, 200.0, target, source, cfg_kwargs, key, landmarks
    )

    out = {"unconstrained": free, "landmarked": pinned}
    print(json.dumps(out, indent=2))
    assert pinned["landmark_mean_dist_mm"] < free["landmark_mean_dist_mm"], (
        "landmarks should pull the pinned vertices closer"
    )
    assert pinned["unique_fraction"] > free["unique_fraction"] - 0.05, (
        "consistent landmarks must not degrade global quality"
    )

    moved = source.with_points(res["weighted_points"]).with_point_data(
        "corresp_idx", np.asarray(res["correspondences"], np.float32)
    )
    save_mesh(os.path.join(out_dir, "transformed_source_landmarked.vtk"), moved)
    with open(os.path.join(out_dir, "summary.json"), "w") as fh:
        json.dump(out, fh, indent=2)


if __name__ == "__main__":
    main(*sys.argv[1:2])
