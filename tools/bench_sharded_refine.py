"""Sharded-vs-single fine-refine benchmark on the virtual 8-device mesh.

VERDICT r3 task #6: `parallel/bigmesh.py` was test-only; this records a
real measurement of the vertex-sharded refine against the single-device
refine at >= 960k vertices (the bundled 15k pair subdivided x3), on N
virtual CPU devices (`--xla_force_host_platform_device_count`) — the
same mechanism the test suite and the driver's multichip dryrun use.
Run standalone or through bench.py's `sharded_refine_960k` block (which
launches this in a subprocess: the bench process owns the TPU backend
and cannot re-init as multi-device CPU).

Prints ONE JSON line with both times, the speedup, and the index
agreement.  On a single-core host the virtual devices time-slice one
core, so the sharded path measures the COORDINATION overhead (expect
<= 1x); on a multi-core host it measures real scale-out.
"""

import json
import os
import sys
import time

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache"),
)

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from pyfocusr_tpu import load_mesh
from pyfocusr_tpu.multires import _refine_fine_level, subdivide
from pyfocusr_tpu.ops.knn import SENTINEL, nn_query
from pyfocusr_tpu.parallel.bigmesh import refine_fine_level_sharded
from pyfocusr_tpu.pipeline import PipelineConfig, mesh_to_graph_arrays

DATA = "/root/reference/data"


def main() -> int:
    t = load_mesh(f"{DATA}/target_mesh_15k.vtk")
    s = load_mesh(f"{DATA}/source_mesh_15k.vtk")
    for _ in range(3):
        t = subdivide(t)
        s = subdivide(s)
    tg = mesh_to_graph_arrays(t)
    sg = mesh_to_graph_arrays(s)
    cfg = PipelineConfig(
        graph_smoothing_iterations=600, projection_smooth_iterations=1
    )
    tq = jnp.where(tg.valid_mask[:, None] > 0, tg.points, SENTINEL)
    _, init = nn_query(tq, sg.points)
    init = jax.block_until_ready(init)

    mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("verts",))
    out = {"n_vertices": int(tg.n_points), "n_devices": 8,
           "host_cores": os.cpu_count()}

    o_sh = refine_fine_level_sharded(tg, sg, init, cfg, mesh)
    jax.block_until_ready(o_sh)  # compile
    t0 = time.perf_counter()
    o_sh = refine_fine_level_sharded(tg, sg, init, cfg, mesh)
    jax.block_until_ready(o_sh)
    out["sharded_s"] = round(time.perf_counter() - t0, 2)

    o_si = _refine_fine_level(tg, sg, init, cfg)
    jax.block_until_ready(o_si)  # compile
    t0 = time.perf_counter()
    o_si = _refine_fine_level(tg, sg, init, cfg)
    jax.block_until_ready(o_si)
    out["single_s"] = round(time.perf_counter() - t0, 2)

    out["speedup"] = round(out["single_s"] / out["sharded_s"], 3)
    out["index_agreement"] = round(float(
        (np.asarray(o_sh["correspondences"])
         == np.asarray(o_si["correspondences"])).mean()
    ), 6)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
