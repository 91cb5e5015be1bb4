"""Exact 1-D Wasserstein (earth mover's) distance.

Replaces ``scipy.stats.wasserstein_distance`` used by the eigsort histogram
cost (reference ``eigsort.py:182-189``).  In 1-D the optimal transport cost
between empirical distributions is the L1 distance between their quantile
functions, computed exactly from the sorted samples — no solver needed.

For equal sample sizes this reduces to mean |sort(u) - sort(v)|; the general
unequal-size case (needed for the bundled 15k pair: 14996 vs 14998 samples)
integrates |CDF_u - CDF_v| over the merged support, identical to scipy's
algorithm.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["wasserstein_1d"]


@jax.jit
def wasserstein_1d(u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """W1 between empirical samples u [Nu] and v [Nv] (uniform weights)."""
    if u.shape[0] == v.shape[0]:
        return jnp.mean(jnp.abs(jnp.sort(u) - jnp.sort(v)))
    us = jnp.sort(u)
    vs = jnp.sort(v)
    allv = jnp.sort(jnp.concatenate([us, vs]))
    deltas = jnp.diff(allv)
    # CDF of each sample at the merged grid (right-continuous).
    cdf_u = jnp.searchsorted(us, allv[:-1], side="right") / u.shape[0]
    cdf_v = jnp.searchsorted(vs, allv[:-1], side="right") / v.shape[0]
    return jnp.sum(jnp.abs(cdf_u - cdf_v) * deltas)
