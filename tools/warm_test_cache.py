"""Pre-populate the persistent compile cache for the heavy test gates.

tests/conftest.py disables persistent-cache WRITES (an upstream jaxlib
XLA:CPU `executable.serialize()` segfault fires late in long-lived
processes — it killed the default suite once the full notebook-config
gates went non-slow).  Without writes, heavy programs would recompile in
EVERY test session; this script compiles them once in a short-lived
process with writes re-enabled (the segfault needs a long-lived process —
every test shard passes in isolation, ROADMAP "Infrastructure").

`make test` runs this first; with a warm cache it costs seconds.
"""

import os
import sys

os.environ["PYFOCUSR_TPU_CACHE_WRITES"] = "1"
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

import conftest  # noqa: E402  (forces CPU + 8 virtual devices + cache config)
import jax  # noqa: E402

jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)



def main() -> int:
    from conftest import DATA, SYNTHETIC_FIXTURES, _synthetic_bone

    from pyfocusr_tpu.pipeline import (
        PipelineConfig,
        mesh_to_graph_arrays,
    )

    if SYNTHETIC_FIXTURES:
        target, source = _synthetic_bone(2), _synthetic_bone(1)
    else:
        from pyfocusr_tpu.mesh import load_mesh

        target = load_mesh(f"{DATA}/target_mesh.vtk")
        source = load_mesh(f"{DATA}/source_mesh.vtk")
    tg = mesh_to_graph_arrays(target)
    sg = mesh_to_graph_arrays(source)

    notebook = dict(
        n_spectral_features=3,
        n_extra_spectral=3,
        get_weighted_spectral_coords=False,
        non_rigid_alpha=0.01,
        non_rigid_beta=50.0,
        non_rigid_n_eigens=100,
        non_rigid_max_iterations=300,
        rigid_before_non_rigid_reg=False,
        projection_smooth_iterations=1,
        graph_smoothing_iterations=600,
        n_coords_spectral_registration=1000,
        n_coords_spectral_ordering=10000,
    )
    # The heavy non-slow gate programs (test_golden_parity): kd, hungarian,
    # and the ensemble-gated weighted config.
    configs = [
        PipelineConfig(**notebook),
        PipelineConfig(**{**notebook,
                          "initial_correspondence_type": "hungarian"}),
        PipelineConfig(**{**notebook, "get_weighted_spectral_coords": True}),
    ]
    from pyfocusr_tpu.pipeline import _register_pair_jit

    for i, cfg in enumerate(configs):
        # COMPILE-ONLY warm (review finding r4): lower().compile() writes
        # the executable to the persistent cache without running the
        # registration — executing all three configs cost minutes per
        # `make test` on CPU (the 5000x5000 hungarian assignment alone is
        # ~116 s of compute the cache can never skip).  The lambda traces
        # the same jaxpr register_pair dispatches, so the cache key the
        # tests hit is identical.
        fn = jax.jit(lambda t, s, k, cfg=cfg: _register_pair_jit(t, s, cfg, k))
        fn.lower(tg, sg, jax.random.PRNGKey(0)).compile()
        print(f"warmed {i + 1}/{len(configs)}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
