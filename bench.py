#!/usr/bin/env python
"""Headline benchmark: full source->target FOCUSR registration of the bundled
15k-vertex bone-mesh pair on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": seconds, "unit": "s", "vs_baseline": speedup}

Baseline: the driver-set target of 5 s end-to-end on one TPU chip
(BASELINE.md "Targets"; the reference publishes no numbers of its own —
SURVEY §6).  vs_baseline = baseline_seconds / measured_seconds, so > 1.0
beats the target.

Method: one warm-up run compiles the single-program jit pipeline (the
persistent compilation cache makes this cheap across invocations), then the
timed run measures steady-state device execution with a fresh PRNG key —
the production regime for registering mesh cohorts of a common size class.
The measured span covers the ENTIRE registration (ICP pre-alignment,
Laplacian spectra for both meshes, eigsort, CPD affine+deformable,
correspondence search, smoothing, final locations) — host mesh loading /
topology extraction is reported separately in the diagnostics.
"""

import json
import sys
import time

import jax

try:  # persistent compile cache: cold pipeline compiles take minutes
    jax.config.update("jax_compilation_cache_dir",
                      __import__("os").environ.get("JAX_COMPILATION_CACHE_DIR",
                                                   "/root/.jax_cache"))
except Exception:
    pass
import numpy as np

sys.path.insert(0, ".")

from pyfocusr_tpu import load_mesh
from pyfocusr_tpu.pipeline import PipelineConfig, mesh_to_graph_arrays, register_pair

DATA = "/root/reference/data"
BASELINE_SECONDS = 5.0  # driver target: <5 s on one TPU chip (BASELINE.md)


def main():
    t_load0 = time.perf_counter()
    target = load_mesh(f"{DATA}/target_mesh_15k.vtk")
    source = load_mesh(f"{DATA}/source_mesh_15k.vtk")
    # The remote-TPU tunnel occasionally drops the worker on first contact;
    # retry the initial device transfer like the timed runs below.
    for attempt in range(3):
        try:
            tg = mesh_to_graph_arrays(target)
            sg = mesh_to_graph_arrays(source)
            jax.block_until_ready((tg.points, sg.points))
            break
        except Exception as e:
            print(f"device transfer attempt {attempt} failed: {e}", file=sys.stderr)
            if attempt == 2:
                raise
            time.sleep(15)
    t_load = time.perf_counter() - t_load0

    # Notebook-equivalent configuration (15k pair => 'kd' correspondences).
    cfg = PipelineConfig(
        n_spectral_features=3,
        n_extra_spectral=3,
        get_weighted_spectral_coords=False,
        non_rigid_alpha=0.01,
        non_rigid_beta=50.0,
        non_rigid_n_eigens=100,
        non_rigid_max_iterations=300,
        n_coords_spectral_ordering=10000,
        n_coords_spectral_registration=1000,
        graph_smoothing_iterations=600,
        projection_smooth_iterations=1,
    )

    # Warm-up: compile (cached across invocations via the persistent cache).
    # The remote-TPU tunnel occasionally faults transiently (watchdog /
    # infrastructure); retry rather than losing the round's benchmark.
    t_c0 = time.perf_counter()
    for attempt in range(3):
        try:
            res = register_pair(tg, sg, cfg, jax.random.PRNGKey(0))
            jax.block_until_ready(res)
            break
        except Exception as e:  # transient device errors
            print(f"warmup attempt {attempt} failed: {e}", file=sys.stderr)
            if attempt == 2:
                raise
            time.sleep(10)
    t_compile_run = time.perf_counter() - t_c0

    # Timed steady-state runs.  The timed region ends with a host transfer
    # of an output array: on the remote-TPU runtime block_until_ready alone
    # was observed to return early in rare cases, and the transfer guarantees
    # the computation actually finished.
    times = []
    for i in range(3):
        for attempt in range(3):
            try:
                t0 = time.perf_counter()
                res = register_pair(tg, sg, cfg, jax.random.PRNGKey(i + 1))
                jax.block_until_ready(res)
                _ = np.asarray(res["correspondences"])
                times.append(time.perf_counter() - t0)
                break
            except Exception as e:
                print(f"run {i} attempt {attempt} failed: {e}", file=sys.stderr)
                if attempt == 2:
                    raise
                time.sleep(10)
    t_run = float(np.median(times))

    # --- Quality metrics (BASELINE.json tracked; VERDICT r1 task #2) ---
    corr = np.asarray(res["correspondences"])
    uniq = len(np.unique(corr))
    weighted = np.asarray(res["weighted_points"], np.float64)
    src_pts = np.asarray(source.points, np.float64)
    tgt_pts = np.asarray(target.points, np.float64)
    mean_displacement = float(
        np.linalg.norm(weighted - src_pts, axis=1).mean()
    )
    # Symmetric surface (point-cloud) distance: transformed source <-> target.
    import jax.numpy as jnp

    from pyfocusr_tpu.ops.knn import nn_query

    wj = jnp.asarray(weighted, jnp.float32)
    tj = jnp.asarray(tgt_pts, jnp.float32)
    d_fwd, _ = nn_query(tj, wj)
    d_rev, _ = nn_query(wj, tj)
    surface_dist = float(
        (np.asarray(d_fwd).mean() + np.asarray(d_rev).mean()) / 2.0
    )

    # --- Standalone k=6 eigensolve time (BASELINE.json tracked metric) ---
    from functools import partial

    from pyfocusr_tpu.pipeline import _spectrum

    @partial(jax.jit, static_argnames=("k", "cfg"))
    def eigensolve(g, k, key, cfg):
        lams, vecs, _ = _spectrum(g, k, key, cfg)
        return lams, vecs

    eig_times = []
    _ = jax.block_until_ready(
        eigensolve(tg, cfg.n_total, jax.random.PRNGKey(0), cfg)
    )  # compile
    for i in range(3):
        t0 = time.perf_counter()
        out_t = eigensolve(tg, cfg.n_total, jax.random.PRNGKey(i), cfg)
        out_s = eigensolve(sg, cfg.n_total, jax.random.PRNGKey(i), cfg)
        jax.block_until_ready((out_t, out_s))
        _ = np.asarray(out_t[0])
        eig_times.append(time.perf_counter() - t0)
    t_eig = float(np.median(eig_times))

    # --- 5k pair with 'hungarian' (the reference notebook's actual config;
    # exact 5000x5000 assignment ON DEVICE via sinkhorn_jv_lap) ---
    t5 = load_mesh(f"{DATA}/target_mesh.vtk")
    s5 = load_mesh(f"{DATA}/source_mesh.vtk")
    tg5, sg5 = mesh_to_graph_arrays(t5), mesh_to_graph_arrays(s5)
    cfg5 = PipelineConfig(
        n_spectral_features=3,
        n_extra_spectral=3,
        get_weighted_spectral_coords=False,
        non_rigid_alpha=0.01,
        non_rigid_beta=50.0,
        non_rigid_n_eigens=100,
        non_rigid_max_iterations=300,
        n_coords_spectral_ordering=10000,
        n_coords_spectral_registration=1000,
        graph_smoothing_iterations=600,
        projection_smooth_iterations=1,
        initial_correspondence_type="hungarian",
    )
    try:
        res5 = register_pair(tg5, sg5, cfg5, jax.random.PRNGKey(0))
        jax.block_until_ready(res5)
        t0 = time.perf_counter()
        res5 = register_pair(tg5, sg5, cfg5, jax.random.PRNGKey(1))
        jax.block_until_ready(res5)
        _ = np.asarray(res5["correspondences"])
        t_hung = round(time.perf_counter() - t0, 4)
    except Exception as e:  # transient device faults must not kill the bench
        print(f"hungarian diagnostic failed: {e}", file=sys.stderr)
        t_hung = None

    diag = {
        "device": str(jax.devices()[0]),
        "mesh_load_s": round(t_load, 3),
        "first_run_s": round(t_compile_run, 3),
        "runs_s": [round(t, 3) for t in times],
        "unique_correspondences": f"{uniq}/{corr.shape[0]}",
        "unique_fraction": round(uniq / corr.shape[0], 4),
        "mean_displacement_mm": round(mean_displacement, 4),
        "symmetric_surface_dist_mm": round(surface_dist, 4),
        "eigensolve_k6_both_meshes_s": round(t_eig, 4),
        "eigensolve_runs_s": [round(t, 4) for t in eig_times],
        "hungarian_5k_end_to_end_s": t_hung,
    }
    print(json.dumps(diag), file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "15k-pair end-to-end FOCUSR registration (1 chip)",
                "value": round(t_run, 4),
                "unit": "s",
                "vs_baseline": round(BASELINE_SECONDS / t_run, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
