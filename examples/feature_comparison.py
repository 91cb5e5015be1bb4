#!/usr/bin/env python
"""Feature-comparison study — the working version of the reference's second
notebook (``examples/Notebook_for_testing_and_comparing_features.ipynb``),
whose cells are commented-out exploration code "to look at features, their
distributions, and to compare them and how they affect results".

This script actually runs that study end to end:

1. registers the bundled 5k pair WITHOUT extra features (baseline),
2. registers it WITH curvature features appended as registration
   coordinates (``list_features_to_calc=('curvature',)`` +
   ``use_features_as_coords=True`` + the example's
   ``feature_weights=diag([.1, .1])``),
3. reports quality for both: unique-correspondence fraction, symmetric
   surface distance of the transformed source, and the thickness-transfer
   error (the bundled ``thickness_change_(mm)`` scalar carried through the
   correspondences vs the target's own values — a readout neither
   configuration optimizes directly),
4. exports meshes carrying the curvature features and the log-transformed
   views the notebook's cells explored, as point-data channels.

Usage:
    python examples/feature_comparison.py [out_dir]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from pyfocusr_tpu import Focusr, load_mesh, save_mesh

DATA = "/root/reference/data"

COMMON = dict(
    icp_register_first=True,
    n_spectral_features=3,
    n_extra_spectral=3,
    get_weighted_spectral_coords=False,
    non_rigid_alpha=0.01,
    non_rigid_beta=50,
    non_rigid_n_eigens=100,
    non_rigid_max_iterations=300,
    rigid_before_non_rigid_reg=False,
    projection_smooth_iterations=1,
    graph_smoothing_iterations=600,
    n_coords_spectral_ordering=10000,
    n_coords_spectral_registration=1000,
    initial_correspondence_type="kd",
    final_correspondence_type="kd",
    seed=0,
)


def quality(reg, target, source):
    """Quality readouts for one registration."""
    import jax.numpy as jnp

    from pyfocusr_tpu.ops.knn import nn_query

    corr = np.asarray(reg.corresponding_target_idx_for_each_source_pt)
    uniq = len(np.unique(corr)) / corr.shape[0]
    moved = np.asarray(reg.weighted_avg_transformed_points, np.float64)
    tgt_pts = np.asarray(target.points, np.float64)
    d_f, _ = nn_query(jnp.asarray(tgt_pts, jnp.float32), jnp.asarray(moved, jnp.float32))
    d_r, _ = nn_query(jnp.asarray(moved, jnp.float32), jnp.asarray(tgt_pts, jnp.float32))
    surf = (float(np.asarray(d_f).mean()) + float(np.asarray(d_r).mean())) / 2.0
    # Thickness transfer: source's thickness vs the thickness pulled across
    # the correspondence (the library's transfer API).  Lower MAE = more
    # anatomically consistent correspondences.
    from pyfocusr_tpu import transfer_point_data

    th_s = np.asarray(source.point_data["thickness_change_(mm)"], np.float64)
    pulled = transfer_point_data(
        target,
        {"correspondences": corr},
        names=["thickness_change_(mm)"],
        method="nearest",
    )["thickness_change_(mm)"].astype(np.float64)
    transfer_err = float(np.abs(th_s - pulled).mean())
    transfer_corr = float(np.corrcoef(th_s, pulled)[0, 1])
    return {
        "unique_fraction": round(uniq, 4),
        "symmetric_surface_dist_mm": round(surf, 4),
        "thickness_transfer_mae_mm": round(transfer_err, 4),
        "thickness_transfer_corr": round(transfer_corr, 4),
    }


def log_view(values, cap=3.0, shift=3.5):
    """The notebook cells' log-compressed feature view (clamp, shift, log,
    0-1 normalize) — exported as a scalar channel instead of itkwidgets."""
    v = np.clip(np.asarray(values, np.float64), -cap, cap) + shift
    v = np.log(v)
    v -= v.min()
    return v / max(v.max(), 1e-12)


def main(out_dir="feature_comparison_output"):
    os.makedirs(out_dir, exist_ok=True)
    target = load_mesh(f"{DATA}/target_mesh.vtk")
    source = load_mesh(f"{DATA}/source_mesh.vtk")

    results = {}
    runs = {
        "featureless": dict(COMMON, list_features_to_calc=[]),
        "curvature_features": dict(
            COMMON,
            list_features_to_calc=("curvature",),
            use_features_as_coords=True,
            feature_weights=np.diag([0.1, 0.1]),
        ),
    }
    for name, kwargs in runs.items():
        t0 = time.time()
        reg = Focusr(vtk_mesh_target=target, vtk_mesh_source=source, **kwargs)
        reg.align_maps_pipeline()
        dt = time.time() - t0
        results[name] = dict(quality(reg, target, source), seconds=round(dt, 2))

        if name == "curvature_features":
            # Export the feature channels the notebook visualized.
            out = target
            for fi, fname in enumerate(("min_curvature", "max_curvature")):
                vals = np.asarray(reg.graph_target.node_features[fi])
                out = out.with_point_data(fname, vals)
                out = out.with_point_data(f"{fname}_logview", log_view(vals))
            save_mesh(os.path.join(out_dir, "target_with_features.vtk"), out)

    print(json.dumps(results, indent=2))
    with open(os.path.join(out_dir, "feature_comparison.json"), "w") as f:
        json.dump(results, f, indent=2)
    return results


if __name__ == "__main__":
    main(*sys.argv[1:])
