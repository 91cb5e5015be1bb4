"""Driver entry points: entry() compiles and runs; the cohort shard path is
covered by tests/test_cohort.py (dryrun_multichip spawns a subprocess, which
pytest shouldn't)."""

import sys


def test_entry_compiles_and_runs():
    sys.path.insert(0, "/root/repo")
    import jax

    from __graft_entry__ import entry

    fn, args = entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert out["correspondences"].shape == (args[1].n_points,)
    import numpy as np

    assert np.all(np.isfinite(np.asarray(out["weighted_points"])))
