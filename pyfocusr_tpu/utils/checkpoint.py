"""Checkpoint / resume for registration results.

The reference has no checkpointing (SURVEY §5.4): all intermediate state
lives as ``Focusr`` attributes for post-hoc inspection.  Here every pipeline
stage is a pure function over array pytrees, so checkpointing is plain
serialization: ``save_results``/``load_results`` round-trip any result pytree
(the ``register_pair`` output dict, cohort results, or a hand-built dict of
``Focusr`` attributes) through a single ``.npz`` file.
"""

from __future__ import annotations

import re

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["save_results", "load_results", "focusr_state_dict", "restore_focusr_state"]


def save_results(path: str, tree) -> None:
    """Serialize an array pytree (dict/list/tuple nesting) to ``.npz``,
    self-describing via flattened pytree paths."""
    paths = jax.tree_util.tree_flatten_with_path(tree)[0]
    keys = ["/".join(str(p) for p in kp) for kp, _ in paths]
    np.savez_compressed(
        path,
        __keys__=np.array(keys),
        **{f"leaf_{i}": np.asarray(v) for i, (_, v) in enumerate(paths)},
    )


def load_results(path: str) -> dict:
    """Load a checkpoint as a flat {path: array} dict (keys are the pytree
    paths written by :func:`save_results`)."""
    with np.load(path, allow_pickle=False) as data:
        keys = [str(k) for k in data["__keys__"]]
        return {
            k: data[f"leaf_{i}"] for i, k in enumerate(keys)
        }


_FOCUSR_RESULT_ATTRS = (
    "Q",
    "spectral_weights",
    "source_spectral_coords",
    "target_spectral_coords",
    "source_spectral_coords_b4_reg",
    "source_spectral_coords_after_rigid",
    "smoothed_target_coords",
    "source_projected_on_target",
    "corresponding_target_idx_for_each_source_pt",
    "nearest_neighbor_transformed_points",
    "weighted_avg_transformed_points",
)


def focusr_state_dict(reg) -> dict:
    """Snapshot the reference-named result attributes of a Focusr instance
    (the post-hoc-inspection state of reference ``focusr.py:174-212``)."""
    out = {}
    for name in _FOCUSR_RESULT_ATTRS:
        val = getattr(reg, name, None)
        if val is not None:
            out[name] = jnp.asarray(val)
    return out


_PYTREE_KEY_RE = re.compile(r"^\[['\"](.+)['\"]\]$")


def _attr_from_path(name: str) -> str:
    """Map a flattened pytree path (e.g. ``\"['Q']\"``) or a bare attribute
    name to the Focusr attribute it denotes."""
    leaf = name.rsplit("/", 1)[-1]
    m = _PYTREE_KEY_RE.match(leaf)
    return m.group(1) if m else leaf


def restore_focusr_state(reg, state: dict, strict: bool = True) -> None:
    """Restore a :func:`focusr_state_dict` / :func:`load_results` snapshot
    onto a Focusr instance.

    Only attributes in the known result-attribute set are restored; an
    unrecognized key raises (``strict=True``, default) rather than silently
    setting a mis-parsed attribute name.
    """
    for name, val in state.items():
        key = _attr_from_path(name)
        if key not in _FOCUSR_RESULT_ATTRS:
            if strict:
                raise KeyError(
                    f"checkpoint key {name!r} -> {key!r} is not a known "
                    f"Focusr result attribute; pass strict=False to skip"
                )
            continue
        setattr(reg, key, jnp.asarray(val))
