"""Linear assignment (Hungarian) solvers.

The reference uses scipy's Jonker-Volgenant ``linear_sum_assignment`` in two
regimes: (a) the tiny k x k eigenmap-matching problem (``eigsort.py:76-78``,
k ~ 6-10) and (b) the full N x N spectral-correspondence assignment for
``initial/final_correspondence_type='hungarian'`` (``focusr.py:346``, e.g.
5000 x 5000, equal vertex counts required — guard at ``focusr.py:377-385``).

TPU-native design:
  * (a) stays on host: an O(n^3) shortest-augmenting-path JV implementation in
    pure numpy (``lap_host``) with a vectorized Dijkstra relaxation — no
    device round-trip is worth making at k ~ 10, and it also serves as the
    exact fallback at any size.
  * (b) runs on device: a jit-compiled epsilon-scaling *auction* algorithm
    (``auction_lap``).  Each bidding round is one [n, n] vectorized pass
    (top-2 values per unassigned row) plus padded scatter-max conflict
    resolution — map-reduce shaped work the VPU eats, instead of the
    inherently serial augmenting paths of JV.  Epsilon scaling makes the
    result optimal to within n * eps_final.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.precision import f32_matmuls

__all__ = ["lap_host", "auction_lap", "exact_lap_small", "linear_sum_assignment"]


def lap_host(cost: np.ndarray):
    """Jonker-Volgenant shortest-augmenting-path LAP on the host (numpy).

    Returns (row_ind, col_ind) minimizing cost[row_ind, col_ind].sum(), rows
    in order — the scipy contract.  Requires n_rows <= n_cols (transposes
    internally otherwise).
    """
    cost = np.asarray(cost, dtype=np.float64)
    n_rows, n_cols = cost.shape
    if n_rows > n_cols:
        rows, cols = lap_host(cost.T)
        order = np.argsort(cols)
        return cols[order], rows[order]

    # Native C++ fast path (native/lap_jv.cpp via ctypes), if built.
    from ..native import lap_jv_native

    native_cols = lap_jv_native(cost)
    if native_cols is not None:
        return np.arange(n_rows), native_cols

    INF = np.inf
    u = np.zeros(n_rows + 1)
    v = np.zeros(n_cols + 1)
    # p[j] = row (1-based) matched to column j (1-based); column 0 is virtual.
    p = np.zeros(n_cols + 1, dtype=np.int64)
    way = np.zeros(n_cols + 1, dtype=np.int64)

    for i in range(1, n_rows + 1):
        p[0] = i
        j0 = 0
        minv = np.full(n_cols + 1, INF)
        used = np.zeros(n_cols + 1, dtype=bool)
        while True:
            used[j0] = True
            i0 = p[j0]
            # Vectorized relaxation over free columns.
            free = ~used[1:]
            cur = cost[i0 - 1, :] - u[i0] - v[1:]
            sub = minv[1:]
            upd = free & (cur < sub)
            sub[upd] = cur[upd]
            way[1:][upd] = j0
            masked = np.where(free, sub, INF)
            j1 = int(np.argmin(masked)) + 1
            delta = masked[j1 - 1]
            # Potential update.
            used_cols = np.where(used)[0]
            u[p[used_cols]] += delta
            v[used_cols] -= delta
            minv[1:][free] -= delta
            j0 = j1
            if p[j0] == 0:
                break
        # Augment along the alternating path.
        while j0 != 0:
            j1 = way[j0]
            p[j0] = p[j1]
            j0 = j1

    col_ind = np.zeros(n_rows, dtype=np.int64)
    for j in range(1, n_cols + 1):
        if p[j] > 0:
            col_ind[p[j] - 1] = j - 1
    return np.arange(n_rows), col_ind


@partial(jax.jit, static_argnames=("max_rounds",))
@f32_matmuls
def _auction_scaling_phase(cost_neg, eps, prices, max_rounds: int):
    """One epsilon phase: bid until every row is assigned (or round cap)."""
    n = cost_neg.shape[0]
    rows = jnp.arange(n, dtype=jnp.int32)
    assignment = jnp.full((n,), -1, jnp.int32)  # row -> col
    owner = jnp.full((n,), -1, jnp.int32)  # col -> row

    def cond(state):
        assignment, owner, prices, rounds = state
        return jnp.logical_and(jnp.any(assignment < 0), rounds < max_rounds)

    def body(state):
        assignment, owner, prices, rounds = state
        bidder = assignment < 0
        values = cost_neg - prices[None, :]
        top2, top2_idx = jax.lax.top_k(values, 2)
        best_j = top2_idx[:, 0]
        bids = top2[:, 0] - top2[:, 1] + eps

        neg_inf = jnp.array(-jnp.inf, cost_neg.dtype)
        bid_eff = jnp.where(bidder, bids, neg_inf)
        # Padded scatter-max: winning bid per column.
        tgt = jnp.where(bidder, best_j, n)
        col_bid = jnp.full((n + 1,), neg_inf, cost_neg.dtype).at[tgt].max(bid_eff)
        # Candidate winners (ties broken by smallest row index).
        cand = jnp.logical_and(bidder, bid_eff >= col_bid[best_j])
        cand_tgt = jnp.where(cand, best_j, n)
        col_winner = (
            jnp.full((n + 1,), n, jnp.int32)
            .at[cand_tgt]
            .min(jnp.where(cand, rows, n))
        )
        won = jnp.logical_and(cand, col_winner[best_j] == rows)
        won_tgt = jnp.where(won, best_j, n)

        # Price bump by the winning bid.
        prices = (
            jnp.concatenate([prices, jnp.zeros((1,), prices.dtype)])
            .at[won_tgt]
            .add(jnp.where(won, bids, 0.0))[:n]
        )
        # Evict previous owners of newly won columns.
        prev_owner_pad = jnp.concatenate([owner, jnp.array([-1], jnp.int32)])
        evicted_row = prev_owner_pad[won_tgt]  # per bidding row: who they evict
        evict_tgt = jnp.where(evicted_row >= 0, evicted_row, n)
        assignment = (
            jnp.concatenate([assignment, jnp.array([-1], jnp.int32)])
            .at[evict_tgt]
            .set(-1)[:n]
        )
        owner = (
            jnp.concatenate([owner, jnp.array([-1], jnp.int32)])
            .at[won_tgt]
            .set(jnp.where(won, rows, -1))[:n]
        )
        assignment = jnp.where(won, best_j, assignment)
        return assignment, owner, prices, rounds + 1

    assignment, owner, prices, rounds = jax.lax.while_loop(
        cond, body, (assignment, owner, prices, jnp.int32(0))
    )
    return assignment, prices


def auction_lap(
    cost: jnp.ndarray, eps_scaling_steps: int = 7, max_rounds: int = 100000
) -> jnp.ndarray:
    """Square LAP via forward auction with epsilon scaling, on device.

    Returns the column assigned to each row (i32 [n]).  Final eps is
    spread/(4n), giving a total cost within n*eps of optimal (exact for costs
    whose pairwise differences exceed that, which random geometric costs do).
    """
    cost = jnp.asarray(cost, jnp.float32)
    n = cost.shape[0]
    cost_neg = -cost
    spread = jnp.maximum(jnp.max(cost) - jnp.min(cost), 1e-12)
    prices = jnp.zeros((n,), cost.dtype)
    eps_final = spread / (4.0 * n)
    assignment = jnp.full((n,), -1, jnp.int32)
    eps = spread / 2.0
    for _ in range(eps_scaling_steps):
        eps = jnp.maximum(eps, eps_final)
        assignment, prices = _auction_scaling_phase(cost_neg, eps, prices, max_rounds)
        eps = eps / 6.0
    return assignment


def exact_lap_small(cost: jnp.ndarray) -> jnp.ndarray:
    """EXACT square LAP for tiny k (k <= 8) by static enumeration, on device.

    All k! permutations are a host-side static constant; the device work is
    one [k!, k] gather + sum + argmin.  Unlike the epsilon-scaling auction
    (optimal only to within n*eps_final = spread/4), this is exact regardless
    of cost magnitude or ties — which matters for the eigsort k x k matching,
    whose cost entries shrink toward the auction's epsilon floor as the
    eigsort subsample grows (observed wrong matchings on near-identical
    meshes at ``n_coords_spectral_ordering=1000``).

    Returns the column assigned to each row (i32 [k]).
    """
    import itertools

    k = cost.shape[0]
    if k > 8:
        raise ValueError(f"exact_lap_small enumerates k! permutations; k={k} > 8")
    perms = jnp.asarray(
        np.array(list(itertools.permutations(range(k))), np.int32)
    )  # [k!, k]
    totals = jnp.sum(jnp.asarray(cost)[jnp.arange(k)[None, :], perms], axis=1)
    return perms[jnp.argmin(totals)]


def linear_sum_assignment(cost, device_threshold: int | None = None):
    """Dispatcher with the scipy contract: returns (row_ind, col_ind).

    Default: exact host JV at every size (the native C++ solver handles
    5000 x 5000 in ~11 s — comparable to what the reference's scipy call
    printed timings for at ``focusr.py:341-348``).  The device auction is
    available by passing ``device_threshold``: square problems larger than it
    solve on-device.  Auction caveat, measured on v5e: with *contested*
    geometric costs (many rows sharing a best column, e.g. two nearly
    identical point clouds) the bidding can run long enough to trip the TPU
    watchdog — use it for well-separated costs or moderate n only.
    """
    cost_np = np.asarray(cost)
    n_rows, n_cols = cost_np.shape
    if (
        device_threshold is None
        or n_rows != n_cols
        or max(n_rows, n_cols) <= device_threshold
    ):
        return lap_host(cost_np)
    col_ind = np.asarray(auction_lap(jnp.asarray(cost_np)))
    return np.arange(n_rows), col_ind
