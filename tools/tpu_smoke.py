#!/usr/bin/env python
"""TPU smoke battery (ROADMAP CI item): one command that validates the
TPU-only code paths the CPU test suite cannot reach — the Pallas kernels
(JV Dijkstra, streamed CPD E-step, Sinkhorn duals), real-chip registration
quality, and the AOT serving round-trip — and prints ONE JSON verdict line.

The CPU suite runs everything in XLA-CPU or Pallas interpret mode; the two
biggest round-1 bug classes (precision and layout) only manifest on real
hardware.  Run this on any TPU worker after a toolchain bump:

    python tools/tpu_smoke.py            # ~1 min warm, ~10 min cold cache

Exit code 0 iff every check passes.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache"),
    )
except Exception:
    pass

import jax.numpy as jnp
import numpy as np

DATA = "/root/reference/data"


def main():
    from scipy.optimize import linear_sum_assignment

    from pyfocusr_tpu import load_mesh
    from pyfocusr_tpu.ops.assignment import sinkhorn_jv_lap
    from pyfocusr_tpu.ops.knn import pairwise_sq_dists
    from pyfocusr_tpu.pipeline import (
        PipelineConfig,
        mesh_to_graph_arrays,
        register_pair,
    )

    checks = {}
    ok = True

    def check(name, passed, detail):
        nonlocal ok
        checks[name] = {"pass": bool(passed), **detail}
        ok = ok and bool(passed)

    dev = jax.devices()[0]
    check("backend", dev.platform in ("tpu", "axon") or "TPU" in str(dev),
          {"device": str(dev)})

    # --- 1. Registration quality on the bundled 5k pair ---------------
    t5 = load_mesh(f"{DATA}/target_mesh.vtk")
    s5 = load_mesh(f"{DATA}/source_mesh.vtk")
    tg, sg = mesh_to_graph_arrays(t5), mesh_to_graph_arrays(s5)
    cfg = PipelineConfig(
        n_spectral_features=3, n_extra_spectral=3,
        non_rigid_alpha=0.01, non_rigid_beta=50.0, non_rigid_n_eigens=100,
        non_rigid_max_iterations=300, rigid_before_non_rigid_reg=False,
        projection_smooth_iterations=1, graph_smoothing_iterations=600,
        n_coords_spectral_ordering=10000, n_coords_spectral_registration=1000,
    )
    t0 = time.perf_counter()
    res = register_pair(tg, sg, cfg, jax.random.PRNGKey(0))
    jax.block_until_ready(res)
    t_first = time.perf_counter() - t0
    corr = np.asarray(res["correspondences"])
    uniq = len(np.unique(corr)) / corr.shape[0]
    check("register_5k_quality", uniq > 0.8,
          {"unique_fraction": round(uniq, 4), "first_run_s": round(t_first, 2)})
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    gold_path = os.path.join(
        repo_root, "tests", "goldens", "reference_golden_5k_kd.npz"
    )
    if os.path.exists(gold_path):
        g = np.load(gold_path)
        agree = float((corr == g["correspondences"]).mean())
        # reference seed-to-seed self-noise is 51%; TPU measures ~72%
        check("golden_parity_5k", agree > 0.6, {"exact_agreement": round(agree, 4)})

    # --- 2. Pallas JV exactness on the REAL contested cost ------------
    src_c = jnp.asarray(res["spectral_coords_source"])
    tgt_c = jnp.asarray(res["spectral_coords_target"])
    cost = jnp.sqrt(jnp.maximum(pairwise_sq_dists(src_c, tgt_c), 0.0))
    t0 = time.perf_counter()
    col = sinkhorn_jv_lap(cost)
    col.block_until_ready()
    t_lap = time.perf_counter() - t0
    cnp = np.asarray(cost)
    col_np = np.asarray(col)
    is_perm = sorted(col_np) == list(range(cnp.shape[0]))
    ri, ci = linear_sum_assignment(cnp)
    obj = cnp[np.arange(len(col_np)), col_np].sum()
    gap = (obj - cnp[ri, ci].sum()) / cnp[ri, ci].sum()
    check("pallas_jv_exact", is_perm and abs(gap) < 1e-6,
          {"gap_pct": round(float(gap) * 100, 6), "seconds": round(t_lap, 3)})

    # --- 3. Streamed CPD E-step (Pallas) vs dense -----------------------
    from pyfocusr_tpu.ops.pallas_kernels import cpd_estep_pallas, cpd_estep_tiled

    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.normal(size=(3000, 6)) * 0.2, jnp.float32)
    TY = X + jnp.asarray(rng.normal(size=(3000, 6)) * 0.01, jnp.float32)
    outs_p = jax.block_until_ready(cpd_estep_pallas(X, TY, 0.01, 0.0))
    outs_t = jax.block_until_ready(cpd_estep_tiled(X, TY, 0.01, 0.0))
    rel = max(
        float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-30))
        for a, b in zip(outs_p[:3], outs_t[:3])
    )
    check("pallas_cpd_estep", rel < 1e-4, {"max_rel_dev": f"{rel:.2e}"})

    # --- 4. AOT export / serve round-trip on this backend --------------
    try:
        from pyfocusr_tpu.utils.aot import export_registration, load_registration

        path = "/tmp/tpu_smoke_reg.jaxexp"
        t0 = time.perf_counter()
        export_registration(cfg, tg, sg, path)
        t_exp = time.perf_counter() - t0
        runner = load_registration(path)
        t0 = time.perf_counter()
        out = runner(tg, sg, jax.random.PRNGKey(0))
        jax.block_until_ready(out)
        t_serve = time.perf_counter() - t0
        same = np.array_equal(np.asarray(out["correspondences"]), corr)
        check("aot_serving_roundtrip", same,
              {"export_s": round(t_exp, 2), "served_first_call_s": round(t_serve, 2),
               "artifact_mb": round(os.path.getsize(path) / 1e6, 2)})
    except Exception as e:  # noqa: BLE001
        check("aot_serving_roundtrip", False, {"error": f"{type(e).__name__}: {e}"[:200]})

    print(json.dumps({"ok": ok, "checks": checks}))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
