"""Ahead-of-time export of compiled registration programs (serving path).

The reference is a research library with no deployment story; production
serving of a TPU registration pipeline needs two things the interactive
path lacks:

1. **No first-contact compile.**  A cold ``register_pair`` compile takes
   minutes on remote-TPU runtimes (ROADMAP infra note).  The persistent
   compilation cache (`JAX_COMPILATION_CACHE_DIR`) covers repeat runs on
   one machine; `export_registration` goes further and serializes the
   fully-lowered program (StableHLO via ``jax.export``) to a portable
   artifact that any worker with the same topology can load and run
   without tracing or re-lowering Python at all.
2. **Pinned shapes.**  Serving fleets register cohorts of a known size
   class; the artifact pins (n_target, n_source, degrees, ...) and the
   config, making the served program immutable and auditable.

Usage:
    path = export_registration(cfg, tg_example, sg_example, "reg_15k.jaxexp")
    runner = load_registration(path)
    res = runner(tg, sg, key)          # same output dict as register_pair

The CLI ``warmup`` command uses the same machinery to pre-populate the
compile cache for a list of mesh sizes (see cli.py).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

__all__ = ["export_registration", "load_registration"]

_REGISTERED = False


def _ensure_serializable():
    """Register GraphArrays for jax.export pytree serialization (idempotent;
    its aux data is None so the payload is empty)."""
    global _REGISTERED
    if _REGISTERED:
        return
    from ..pipeline import GraphArrays

    jax.export.register_pytree_node_serialization(
        GraphArrays,
        serialized_name="pyfocusr_tpu.GraphArrays",
        serialize_auxdata=lambda aux: b"",
        deserialize_auxdata=lambda blob: None,
    )
    _REGISTERED = True


def _specs_like(tree):
    return jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), tree
    )


def export_registration(cfg, target_example, source_example, path: str) -> str:
    """Serialize the fully-lowered ``register_pair`` program for the given
    config and example GraphArrays shapes to ``path``.

    ``target_example`` / ``source_example`` fix every static shape (vertex
    counts, ELL degree, overflow length, feature count); the exported
    program accepts any inputs of those exact shapes.  The artifact is
    platform-specific (exported for the current default backend).

    Scale note: jax.export serializes ONE program, so this wraps the fused
    single-program pipeline.  Above ``pipeline._SPLIT_SPECTRA_N`` vertices
    the live ``register_pair`` instead hoists each eigensolve into its own
    program (measured 3.4x faster at 122k — pipeline.py split-spectra
    notes); exporting such shapes would permanently serve the slow fused
    variant, so it is rejected rather than silently degraded.
    """
    from ..pipeline import (
        _SPLIT_SPECTRA_N,
        _check_padding_hazards,
        _register_pair_jit,
    )

    n_max = max(target_example.n_points, source_example.n_points)
    if _SPLIT_SPECTRA_N > 0 and n_max >= _SPLIT_SPECTRA_N:
        raise ValueError(
            f"export_registration serializes the fused single-program "
            f"pipeline, which is ~3.4x slower than the split-spectra path "
            f"register_pair uses at {n_max} vertices (threshold "
            f"{_SPLIT_SPECTRA_N}); serve large pairs through register_pair "
            "with the persistent compilation cache instead"
        )

    # The example arrays are concrete, so the padding guards register_pair
    # runs pre-jit apply here too — an exported 'hungarian' program must
    # not silently serve corrupt assignments on padded graphs.
    _check_padding_hazards(target_example, source_example, cfg)
    _ensure_serializable()
    fn = jax.jit(
        lambda tg, sg, key: _register_pair_jit(tg, sg, cfg, key)
    )
    exp = jax.export.export(fn)(
        _specs_like(target_example),
        _specs_like(source_example),
        jax.ShapeDtypeStruct((2,), jnp.uint32),
    )
    blob = exp.serialize()
    # Atomic publish: a process killed mid-write must not leave a
    # truncated artifact at the serving path.
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)
    return path


def load_registration(path: str):
    """Load an exported registration program; returns
    ``runner(target, source, key) -> results dict`` (no tracing, no
    Python-level pipeline code on the serving path)."""
    _ensure_serializable()
    with open(path, "rb") as f:
        exp = jax.export.deserialize(f.read())

    def runner(target, source, key):
        return exp.call(target, source, key)

    return runner
