#!/usr/bin/env python
"""Register two bone meshes — script version of the reference's example
notebook (``examples/Example_registering_two_bone_meshes.ipynb``), same
hyperparameters (notebook cell 3), running on whatever JAX backend is active.

Usage:
    python examples/register_two_bone_meshes.py [out_dir]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from pyfocusr_tpu import Focusr, load_mesh, save_mesh

DATA = "/root/reference/data"


def main(out_dir="example_output"):
    os.makedirs(out_dir, exist_ok=True)
    target = load_mesh(f"{DATA}/target_mesh.vtk")
    source = load_mesh(f"{DATA}/source_mesh.vtk")

    t0 = time.time()
    reg = Focusr(
        vtk_mesh_target=target,
        vtk_mesh_source=source,
        icp_register_first=True,
        n_spectral_features=3,
        n_extra_spectral=3,
        get_weighted_spectral_coords=False,
        list_features_to_calc=[],
        non_rigid_alpha=0.01,
        non_rigid_beta=50,
        non_rigid_n_eigens=100,
        non_rigid_max_iterations=300,
        rigid_before_non_rigid_reg=False,
        projection_smooth_iterations=1,
        graph_smoothing_iterations=600,
        feature_smoothing_iterations=10,
        norm_physical_and_spectral=True,
        feature_weights=np.diag([0.1, 0.1]),
        n_coords_spectral_ordering=10000,
        n_coords_spectral_registration=1000,
        initial_correspondence_type="kd",  # notebook uses 'hungarian' on the
        # equal-count 5k pair; 'kd' matches the 15k-safe default
        final_correspondence_type="kd",
        verbose=True,
    )
    reg.align_maps()
    print(f"registration finished in {time.time() - t0:.1f}s")

    # --- Getting results (notebook "Getting Results" cell) ---
    corr = reg.corresponding_target_idx_for_each_source_pt
    print("unique correspondences:", len(np.unique(corr)), "/", len(corr))

    reg.set_all_mesh_scalars_to_corresp_target_idx()
    reg.get_average_shape()

    save_mesh(os.path.join(out_dir, "source_on_target_weighted.vtk"),
              reg.weighted_avg_transformed_mesh)
    save_mesh(os.path.join(out_dir, "source_on_target_nearest.vtk"),
              reg.nearest_neighbour_transformed_mesh)
    save_mesh(os.path.join(out_dir, "average_mesh.vtk"), reg.average_mesh)
    np.save(os.path.join(out_dir, "correspondences.npy"), np.asarray(corr))

    # Standalone WebGL viewer (no dependencies, no network): open in any
    # browser to inspect the correspondence coloring interactively.
    reg.export_viewer_html(os.path.join(out_dir, "viewer.html"))
    print("wrote results to", out_dir)

    reg.timer.report()


if __name__ == "__main__":
    main(*sys.argv[1:])
