#!/usr/bin/env python
"""Template serving: register many subjects against one prepared template.

The production pattern for cohort studies and registration services: the
template's eigensolve + coordinate smoothing are hoisted out of the
per-pair path (``pipeline.prepare_target``), computed once (or loaded from
a saved ``.npz``), and reused for every incoming subject — measured 1.69x
per pair at 15k vertices on one v5e chip, with outputs bit-identical to
``register_pair``.

Usage:
    python examples/template_serving.py [--fast] template.vtk subj1.vtk ...
    python examples/template_serving.py --state prep.npz template.vtk s*.vtk

Equivalent CLI:
    pyfocusr-tpu register template.vtk s1.vtk s2.vtk --save-prepared prep.npz
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from pyfocusr_tpu import load_mesh
from pyfocusr_tpu.pipeline import (
    PipelineConfig,
    load_prepared_target,
    mesh_to_graph_arrays,
    prepare_target,
    register_pair_prepared,
    save_prepared_target,
)


def main():
    args = sys.argv[1:]
    fast = "--fast" in args
    args = [a for a in args if a != "--fast"]
    state_path = None
    if args and args[0] == "--state":
        state_path = args[1]
        args = args[2:]
    if len(args) < 2:
        print(__doc__)
        return 2
    template_path, subject_paths = args[0], args[1:]

    cfg = PipelineConfig(
        non_rigid_alpha=0.01,
        non_rigid_beta=50.0,
        non_rigid_max_iterations=30 if fast else 300,
        graph_smoothing_iterations=30 if fast else 600,
        projection_smooth_iterations=1,
        n_coords_spectral_ordering=2000 if fast else 10000,
        n_coords_spectral_registration=500 if fast else 1000,
    )
    key = jax.random.PRNGKey(0)
    tg = mesh_to_graph_arrays(load_mesh(template_path))

    t0 = time.perf_counter()
    if state_path and os.path.exists(state_path):
        prep = load_prepared_target(state_path, cfg)
        print(f"loaded prepared state from {state_path}")
    else:
        prep = prepare_target(tg, cfg, jax.random.split(key, 8)[0])
        jax.block_until_ready(prep["vecs"])
        if state_path:
            save_prepared_target(state_path, prep, cfg)
            print(f"saved prepared state to {state_path}")
    print(f"template preparation: {time.perf_counter() - t0:.2f}s")

    for i, path in enumerate(subject_paths):
        sg = mesh_to_graph_arrays(load_mesh(path))
        t0 = time.perf_counter()
        res = register_pair_prepared(
            prep, tg, sg, cfg, jax.random.fold_in(key, i)
        )
        corr = np.asarray(res["correspondences"])
        dt = time.perf_counter() - t0
        print(
            f"{path}: {dt:.2f}s  unique correspondences "
            f"{len(np.unique(corr))}/{len(corr)}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
