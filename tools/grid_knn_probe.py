"""A/B probe: voxel-grid vs brute-force KNN at large N on the current
backend.  Usage: python tools/grid_knn_probe.py [n_points]

Generates a surface-like cloud (noisy sphere — same occupancy profile as
the bone meshes), times nn/knn3 through both paths, and reports the grid
path's fallback fraction.  All timings fence with block_until_ready.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 960_000
    import jax
    import jax.numpy as jnp

    from pyfocusr_tpu.ops import grid_knn
    from pyfocusr_tpu.ops.knn import _brute_knn

    rng = np.random.default_rng(0)
    u = rng.normal(size=(n, 3))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    r = (u * 40 + rng.normal(scale=0.05, size=(n, 3))).astype(np.float32)
    q = (r + rng.normal(scale=0.03, size=(n, 3))).astype(np.float32)
    r_d = jnp.asarray(r)
    q_d = jnp.asarray(q)
    jax.block_until_ready((r_d, q_d))
    print(f"backend={jax.default_backend()} n={n}")

    results = {}
    for k in (1, 3):
        # warm + time grid
        for label, fn in (
            ("grid", lambda: grid_knn.knn_grid(r_d, q_d, k)),
            ("brute", lambda: _brute_knn(r_d, q_d, k)),
        ):
            out = fn()
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            out = fn()
            jax.block_until_ready(out)
            dt = time.perf_counter() - t0
            results[(label, k)] = (dt, out)
            extra = (
                f" fallback={grid_knn.last_stats['fallback_fraction']:.4%}"
                f" dims={grid_knn.last_stats['dims']}"
                if label == "grid"
                else ""
            )
            print(f"k={k} {label:5s}: {dt:8.3f} s{extra}")
        ig = np.asarray(results[("grid", k)][1][1])
        ib = np.asarray(results[("brute", k)][1][1])
        print(f"k={k} index agreement grid-vs-brute: {(ig == ib).mean():.6f}")


if __name__ == "__main__":
    main()
