"""Pallas TPU kernels for the O(M*N) pairwise stages.

The reference copes with quadratic cost by *subsampling* (CPD runs on
1000-5000 random points, ``focusr.py:300-306``; its docs recommend never
going far beyond that).  On TPU the right answer is to tile: these kernels
stream the [M, N] Gaussian responsibility matrix through VMEM without ever
materializing it in HBM (the 15k x 15k P matrix would be 900 MB), which makes
FULL-RESOLUTION CPD practical — a capability the CPU reference does not have
(measured: 15k x 15k x 150 EM iterations in 1.79 s on one v5e chip).

Hyperparameter note for full resolution: CPD's smoothness weight ``alpha``
multiplies sigma^2 against a data term that grows with the number of
registered points, so alpha tuned for an n-point subsample must be scaled by
~N/n when registering all N points (measured on the 15k pair: alpha=0.01 at
n=1000 == alpha~0.15 at N=15k; without rescaling the warp overfits and
correspondence quality collapses).

Kernels:
  * ``cpd_estep`` — fused CPD E-step: squared distances on the MXU, exp on
    the VPU, and the three reductions (den[n], P1[m], PX[m,:]) accumulated in
    VMEM across grid steps.  Two passes (den, then P1/PX), flash-attention
    style but without max-rescaling (CPD's raw exp semantics, matching
    cycpd).
  * pure-XLA ``cpd_estep_tiled`` with identical semantics — the fallback for
    CPU tests / interpret mode, also used on small problems where one matmul
    is cheaper than a kernel launch.

All matmuls run at f32 precision (see utils/precision.py for why).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PREC = jax.lax.Precision.HIGHEST

__all__ = [
    "cpd_estep",
    "cpd_estep_tiled",
    "gaussian_matvec_tiled",
    "sinkhorn_duals_streamed",
    "knn_pallas",
]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ----------------------------------------------------------------------
# XLA tiled fallback (identical math, any backend)
# ----------------------------------------------------------------------
@partial(jax.jit, static_argnames=("tile_m",))
def cpd_estep_tiled(X, TY, sigma2, c, tile_m: int = 2048):
    """CPD E-step over M-tiles: returns (Pt1 [N], P1 [M], PX [M, D], Np, L)
    with P never materialized beyond one [tile_m, N] slab.

    c is the uniform-outlier constant ((2 pi s2)^{D/2} w/(1-w) M/N; 0 for
    w=0, the reference's setting).
    """
    N, D = X.shape
    M = TY.shape[0]
    m_pad = _round_up(M, tile_m)
    TY_p = jnp.pad(TY, ((0, m_pad - M), (0, 0)), constant_values=1e15)
    xn = jnp.sum(X * X, axis=1)

    ty_tiles = TY_p.reshape(m_pad // tile_m, tile_m, D)

    def slab(ty_tile):
        tn = jnp.sum(ty_tile * ty_tile, axis=1)
        d2 = tn[:, None] + xn[None, :] - 2.0 * jnp.dot(ty_tile, X.T, precision=_PREC)
        return jnp.exp(-jnp.maximum(d2, 0.0) / (2.0 * sigma2))

    # Pass 1: denominator per X point.
    def den_step(carry, ty_tile):
        return carry + jnp.sum(slab(ty_tile), axis=0), None

    den, _ = jax.lax.scan(den_step, jnp.zeros((N,), X.dtype), ty_tiles)
    den = jnp.maximum(den + c, 1e-30)
    L = -jnp.sum(jnp.log(den)) + D * N * jnp.log(sigma2) / 2.0

    # Pass 2: row sums P1 and moment PX with the normalized P.
    inv_den = 1.0 / den

    def row_step(_, ty_tile):
        Pn = slab(ty_tile) * inv_den[None, :]
        return None, (jnp.sum(Pn, axis=1), jnp.dot(Pn, X, precision=_PREC))

    _, (p1_tiles, px_tiles) = jax.lax.scan(row_step, None, ty_tiles)
    P1 = p1_tiles.reshape(m_pad)[:M]
    PX = px_tiles.reshape(m_pad, D)[:M]
    Pt1 = 1.0 - c * inv_den  # column sums of normalized P
    Np = jnp.sum(P1)
    return Pt1, P1, PX, Np, L


# ----------------------------------------------------------------------
# Pallas TPU kernel
# ----------------------------------------------------------------------
def _estep_den_kernel(x_ref, ty_ref, xn_ref, inv2s2_ref, den_ref):
    """Grid (n_tiles, m_tiles): accumulate den over m for each n block.
    The den output block has index_map i -> revisited across all j, so the
    accumulation lives in VMEM for the whole m sweep.  All vector operands
    are carried as [1, N] 2-D blocks (Mosaic rejects raw 1-D f32 blocks with
    non-native tiling)."""
    x = x_ref[:, :]  # [TN, D]
    ty = ty_ref[:, :]  # [TM, D]
    xn = xn_ref[0, :]  # [TN]
    inv2s2 = inv2s2_ref[0, 0]
    tn = jnp.sum(ty * ty, axis=1)
    d2 = (
        tn[:, None]
        + xn[None, :]
        - 2.0 * jnp.dot(ty, x.T, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
    )
    p = jnp.exp(-jnp.maximum(d2, 0.0) * inv2s2)

    @pl.when(pl.program_id(1) == 0)
    def _init():
        den_ref[:, :] = jnp.zeros_like(den_ref)

    den_ref[0, :] += jnp.sum(p, axis=0)


def _estep_row_kernel(x_ref, ty_ref, xn_ref, invden_ref, inv2s2_ref, p1_ref, px_ref):
    """Grid (m_tiles, n_tiles): accumulate P1 and PX over n for each m block."""
    x = x_ref[:, :]
    ty = ty_ref[:, :]
    xn = xn_ref[0, :]
    invden = invden_ref[0, :]
    inv2s2 = inv2s2_ref[0, 0]
    tn = jnp.sum(ty * ty, axis=1)
    d2 = (
        tn[:, None]
        + xn[None, :]
        - 2.0 * jnp.dot(ty, x.T, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
    )
    p = jnp.exp(-jnp.maximum(d2, 0.0) * inv2s2) * invden[None, :]

    @pl.when(pl.program_id(1) == 0)
    def _init():
        p1_ref[:, :] = jnp.zeros_like(p1_ref)
        px_ref[:, :] = jnp.zeros_like(px_ref)

    p1_ref[0, :] += jnp.sum(p, axis=1)
    px_ref[:, :] += jnp.dot(
        p, x, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


@partial(jax.jit, static_argnames=("tile_m", "tile_n", "interpret"))
def cpd_estep_pallas(X, TY, sigma2, c, tile_m: int = 512, tile_n: int = 512,
                     interpret: bool = False):
    """Pallas two-pass CPD E-step.  Same contract as cpd_estep_tiled."""
    N, D = X.shape
    M = TY.shape[0]
    n_pad = _round_up(N, tile_n)
    m_pad = _round_up(M, tile_m)
    # Pad: fake TY rows far away (exp -> 0); fake X rows also far away (their
    # den entries are garbage but sliced off).
    X_p = jnp.pad(X, ((0, n_pad - N), (0, 0)), constant_values=1e15)
    TY_p = jnp.pad(TY, ((0, m_pad - M), (0, 0)), constant_values=-1e15)
    xn = jnp.sum(X_p * X_p, axis=1)[None, :]  # [1, n_pad]
    inv2s2 = jnp.reshape(1.0 / (2.0 * sigma2), (1, 1))

    den2 = pl.pallas_call(
        _estep_den_kernel,
        grid=(n_pad // tile_n, m_pad // tile_m),
        in_specs=[
            pl.BlockSpec((tile_n, D), lambda i, j: (i, 0)),
            pl.BlockSpec((tile_m, D), lambda i, j: (j, 0)),
            pl.BlockSpec((1, tile_n), lambda i, j: (0, i)),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile_n), lambda i, j: (0, i)),
        out_shape=jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
        interpret=interpret,
    )(X_p, TY_p, xn, inv2s2)
    den = den2[0]

    den = jnp.maximum(den + c, 1e-30)
    L = -jnp.sum(jnp.log(den[:N])) + D * N * jnp.log(sigma2) / 2.0
    inv_den = jnp.where(jnp.arange(n_pad) < N, 1.0 / den, 0.0)[None, :]

    p1, px = pl.pallas_call(
        _estep_row_kernel,
        grid=(m_pad // tile_m, n_pad // tile_n),
        in_specs=[
            pl.BlockSpec((tile_n, D), lambda i, j: (j, 0)),
            pl.BlockSpec((tile_m, D), lambda i, j: (i, 0)),
            pl.BlockSpec((1, tile_n), lambda i, j: (0, j)),
            pl.BlockSpec((1, tile_n), lambda i, j: (0, j)),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, tile_m), lambda i, j: (0, i)),
            pl.BlockSpec((tile_m, D), lambda i, j: (i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, m_pad), jnp.float32),
            jax.ShapeDtypeStruct((m_pad, D), jnp.float32),
        ),
        interpret=interpret,
    )(X_p, TY_p, xn, inv_den, inv2s2)

    Pt1 = 1.0 - c / den[:N]
    P1 = p1[0, :M]
    PX = px[:M]
    Np = jnp.sum(P1)
    return Pt1, P1, PX, Np, L


def cpd_estep(X, TY, sigma2, c=0.0, force: str | None = None):
    """Dispatch: Pallas on TPU for large problems, tiled XLA otherwise."""
    M, N = TY.shape[0], X.shape[0]
    backend = jax.default_backend()
    use_pallas = force == "pallas" or (
        force is None and backend == "tpu" and M * N >= 4096 * 4096
    )
    if use_pallas:
        return cpd_estep_pallas(X, TY, sigma2, c)
    return cpd_estep_tiled(X, TY, sigma2, c)


# ----------------------------------------------------------------------
# Tiled Gaussian-Gram matvec (for randomized eigendecomposition at full res)
# ----------------------------------------------------------------------
@partial(jax.jit, static_argnames=("tile",))
def gaussian_matvec_tiled(Y, beta, V, tile: int = 2048):
    """Z = G V where G = exp(-||y_i - y_j||^2 / 2 beta^2), computed in row
    tiles so the [M, M] Gram never materializes (M = 15k -> 900 MB saved)."""
    M, D = Y.shape
    m_pad = _round_up(M, tile)
    Y_p = jnp.pad(Y, ((0, m_pad - M), (0, 0)), constant_values=1e15)
    yn = jnp.sum(Y * Y, axis=1)
    y_tiles = Y_p.reshape(m_pad // tile, tile, D)

    def step(_, y_tile):
        tn = jnp.sum(y_tile * y_tile, axis=1)
        d2 = tn[:, None] + yn[None, :] - 2.0 * jnp.dot(y_tile, Y.T, precision=_PREC)
        g = jnp.exp(-jnp.maximum(d2, 0.0) / (2.0 * beta**2))
        return None, jnp.dot(g, V, precision=_PREC)

    _, z_tiles = jax.lax.scan(step, None, y_tiles)
    return z_tiles.reshape(m_pad, -1)[:M]


# ----------------------------------------------------------------------
# Streamed annealed-Sinkhorn duals (warm start for the device JV LAP)
# ----------------------------------------------------------------------
# The XLA log-domain iteration re-materializes (g - C)/T per update (~5
# passes over the [n, n] cost each), measured 2.3 ms/iteration at n=5000 on
# v5e.  Each dual update reduces along ONE axis only, so a row-tiled kernel
# computes f_i = -T logsumexp_j((g_j - C_ij)/T) in a single pass over C;
# the column update reuses the same kernel on a transpose materialized once.

def _lse_rows_kernel(c_ref, g_ref, invT_ref, f_ref):
    """Grid (row_tiles,): one full-row logsumexp per output element.
    The cost block may arrive in a narrower dtype (bf16 stream, see
    ``sinkhorn_duals_streamed``); all arithmetic is f32."""
    C = c_ref[:, :].astype(jnp.float32)  # [TR, n_pad]
    g = g_ref[0, :]  # [n_pad]
    invT = invT_ref[0, 0]
    A = g[None, :] - C
    m = jnp.max(A, axis=1)
    s = jnp.sum(jnp.exp((A - m[:, None]) * invT), axis=1)
    f_ref[0, :] = -(m + jnp.log(jnp.maximum(s, 1e-30)) / invT)


_DUAL_BIG = 1e30


@partial(jax.jit, static_argnames=("tile_r", "interpret"))
def _lse_rows_pallas(Cmat, vec, invT, tile_r: int, interpret: bool = False):
    n_pad = Cmat.shape[0]
    out = pl.pallas_call(
        _lse_rows_kernel,
        grid=(n_pad // tile_r,),
        in_specs=[
            pl.BlockSpec((tile_r, n_pad), lambda i: (i, 0)),
            pl.BlockSpec((1, n_pad), lambda i: (0, 0)),
            pl.BlockSpec((1, 1), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile_r), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
        interpret=interpret,
    )(Cmat, vec.reshape(1, -1), jnp.full((1, 1), invT, jnp.float32))
    return out[0]


@partial(
    jax.jit,
    static_argnames=(
        "levels", "iters_per_level", "tile_r", "interpret", "cost_dtype"
    ),
)
def _sinkhorn_phase(
    cost, T0, T_factor: float, levels: int, iters_per_level: int,
    tile_r: int = 256, interpret: bool = False, cost_dtype=jnp.float32,
    init=None,
):
    """One annealing phase of :func:`sinkhorn_duals_streamed` (single cost
    dtype, optional resume duals); see that wrapper for semantics."""
    n = cost.shape[0]
    lane = max(tile_r, 128)
    n_pad = _round_up(n, lane)
    Cp = jnp.pad(
        cost.astype(jnp.float32),
        ((0, n_pad - n), (0, n_pad - n)),
        constant_values=_DUAL_BIG,
    ).astype(cost_dtype)
    CpT = Cp.T
    real = (jnp.arange(n_pad) < n).astype(jnp.float32)

    def mask_pad(v):
        return jnp.where(real > 0, v, -_DUAL_BIG)

    def one_T(carry, T):
        f, g = carry
        invT = 1.0 / T

        def one_iter(carry2, _):
            f, g = carry2
            f = mask_pad(_lse_rows_pallas(Cp, g, invT, tile_r, interpret))
            g = mask_pad(_lse_rows_pallas(CpT, f, invT, tile_r, interpret))
            return (f, g), None

        (f, g), _ = jax.lax.scan(one_iter, (f, g), None, length=iters_per_level)
        return (f, g), None

    Ts = T0 * T_factor ** jnp.arange(levels, dtype=jnp.float32)
    if init is None:
        f0 = jnp.zeros((n_pad,), jnp.float32)
        g0 = jnp.zeros((n_pad,), jnp.float32)
    else:  # resume a partially-annealed schedule (mixed-precision phases)
        f0 = jnp.pad(jnp.asarray(init[0], jnp.float32), (0, n_pad - n))
        g0 = jnp.pad(jnp.asarray(init[1], jnp.float32), (0, n_pad - n))
    (f, g), _ = jax.lax.scan(one_T, (mask_pad(f0), mask_pad(g0)), Ts)
    return f[:n], g[:n]


def sinkhorn_duals_streamed(
    cost, T0, T_factor: float, levels: int, iters_per_level: int,
    tile_r: int = 256, interpret: bool = False, cost_dtype=jnp.float32,
    init=None, f32_tail_levels: int = 0,
):
    """Annealed Sinkhorn dual potentials (f, g) with Pallas row-streamed
    logsumexp updates — the same math as ``assignment._sinkhorn_duals`` at
    ~4x less HBM traffic per iteration.

    Cost-matrix padding uses a large FINITE sentinel (1e30, not inf: inf
    would make the in-kernel max/rescale produce NaNs), and the padded
    entries of each dual vector are forced to -1e30 after every update so
    padded rows/columns contribute exp(-large) = 0 to real updates.

    ``cost_dtype=jnp.bfloat16`` streams the cost at half the HBM bytes
    (the iteration is bandwidth-bound: every update reads the full [n, n]
    matrix once), at the price of quantizing the duals to ~0.4% of the
    cost's range.  ``f32_tail_levels=k`` runs the LAST k levels of the
    schedule with an f32 stream (resuming the low-precision phase's duals
    via ``init``), which restores final dual precision while keeping the
    byte saving on the early high-temperature levels.  Measured at 5k on
    v5e: bf16 alone halves the warm start (119 -> 68 ms) but the noisier
    duals lengthen JV augmentation 99k -> 126k steps — a net wash; bf16
    with a 3-level f32 tail keeps the f32 step count at 79 ms of warm
    start (the production recipe, assignment.sinkhorn_jv_lap).

    ``init``: optional (f [n], g [n]) duals to resume from; zeros when
    None.  ``levels=0`` returns the initial duals unchanged.
    """
    tail = min(f32_tail_levels, levels)
    if cost_dtype == jnp.float32:
        tail = 0  # a same-dtype split would be pure overhead
    head = levels - tail
    if head > 0:
        init = _sinkhorn_phase(
            cost, T0, T_factor, head, iters_per_level, tile_r=tile_r,
            interpret=interpret, cost_dtype=cost_dtype, init=init,
        )
        T0 = T0 * T_factor**head
    if tail > 0 or head == 0:
        # levels == 0 still flows through one empty-schedule phase so the
        # return shape/dtype contract holds for any input.
        return _sinkhorn_phase(
            cost, T0, T_factor, tail, iters_per_level, tile_r=tile_r,
            interpret=interpret, init=init,
        )
    return init


# ----------------------------------------------------------------------
# Jonker-Volgenant Dijkstra augmentation: ONE kernel per augmenting row
# ----------------------------------------------------------------------
#
# The XLA while_loop version of the shortest-augmenting-path search costs
# ~9 us per step on this runtime (dispatch-bound: each [n]-vector step is a
# dozen tiny ops), and the bundled 5k 'hungarian' config needs ~120k steps
# -> ~1.0 s.  This kernel runs the ENTIRE search + augmentation for one
# free row inside a single pallas_call with all state VMEM-resident: per
# step, one aligned 8-row DMA fetches the current cost row from HBM and
# ~15 masked [1, n]-vector VPU ops do the relax/argmin/bookkeeping (every
# "scalar" read/write is a masked full-vector op — Mosaic cannot gather or
# scalar-store VMEM).  The deferred dual updates (scipy _lsap style) need a
# VMEM gather (spc[col4row]) that Mosaic cannot express, so the kernel
# RETURNS (spc, scanned, rvis, minVal) and the XLA caller applies the
# u/v updates — 3 dispatches per augmented row instead of ~12 per step.
#
# _BIG_JV is 1e30 (matches assignment._BIG); n is padded to a lane multiple
# with padded columns pre-scanned so they never participate.

_BIG_JV = 1e30  # python float: jnp constants would be captured tracers in the kernel


def _jv_row_kernel(
    scal_ref,  # SMEM [4] i32: i_start, budget, n_real, n_pad
    cost_hbm,  # ANY  [n_pad, n_pad] f32
    u_ref,  # VMEM [1, n] f32
    v_ref,  # VMEM [1, n] f32
    r4c_in,  # VMEM [1, n] i32 (row4col)
    c4r_in,  # VMEM [1, n] i32 (col4row)
    r4c_out,
    c4r_out,
    spc_out,  # VMEM [1, n] f32 shortest-path costs
    scan_out,  # VMEM [1, n] f32 0/1 scanned-column mask
    rvis_out,  # VMEM [1, n] f32 0/1 visited-row mask
    stats_out,  # VMEM [1, 128] f32: [0]=minVal [1]=steps [2]=sink
    path_ref,  # VMEM scratch [1, n] i32
    cost_blk,  # VMEM scratch [8, n] f32
    sem,
):
    n = spc_out.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)[0]
    sub = jax.lax.broadcasted_iota(jnp.int32, (8, n), 0)
    i_start = scal_ref[0]
    budget = scal_ref[1]
    n_real = scal_ref[2]

    r4c_out[0, :] = r4c_in[0, :]
    c4r_out[0, :] = c4r_in[0, :]
    spc_out[0, :] = jnp.full((n,), _BIG_JV)
    scan_out[0, :] = jnp.where(lane >= n_real, 1.0, 0.0)
    rvis_out[0, :] = jnp.zeros((n,))
    path_ref[0, :] = jnp.full((n,), -1, jnp.int32)

    def dj_cond(c):
        _i, _mv, sink, steps = c
        return jnp.logical_and(sink < 0, steps < budget)

    def dj_body(c):
        i_cur, min_val, _sink, steps = c
        rvis_out[0, :] = jnp.where(lane == i_cur, 1.0, rvis_out[0, :])
        base = (i_cur // 8) * 8
        dma = pltpu.make_async_copy(cost_hbm.at[pl.ds(base, 8)], cost_blk, sem)
        dma.start()
        u_i = jnp.sum(jnp.where(lane == i_cur, u_ref[0, :], 0.0))
        dma.wait()
        row = jnp.sum(jnp.where(sub == (i_cur - base), cost_blk[:, :], 0.0), axis=0)
        r = min_val + row - u_i - v_ref[0, :]
        scanned = scan_out[0, :]
        spc = spc_out[0, :]
        better = jnp.logical_and(scanned == 0.0, r < spc)
        spc = jnp.where(better, r, spc)
        spc_out[0, :] = spc
        path_ref[0, :] = jnp.where(better, i_cur, path_ref[0, :])
        masked = jnp.where(scanned > 0.0, _BIG_JV, spc)
        lowest = jnp.min(masked)
        j1 = jnp.min(jnp.where(masked == lowest, lane, n))
        scan_out[0, :] = jnp.where(lane == j1, 1.0, scanned)
        owner = jnp.sum(jnp.where(lane == j1, r4c_out[0, :], 0))
        is_free = owner < 0
        sink = jnp.where(is_free, j1, -1)
        i_next = jnp.where(is_free, i_cur, owner)
        return (i_next, lowest, sink, steps + 1)

    _, min_val, sink, steps = jax.lax.while_loop(
        dj_cond, dj_body, (i_start, jnp.float32(0.0), jnp.int32(-1), jnp.int32(0))
    )

    # Augmentation backtrack: flip the matching along the found path
    # (skips entirely when sink < 0, i.e. budget exhausted).
    def aug_cond(c):
        j, _ = c
        return j >= 0

    def aug_body(c):
        j, _ = c
        i = jnp.sum(jnp.where(lane == j, path_ref[0, :], 0))
        r4c_out[0, :] = jnp.where(lane == j, i, r4c_out[0, :])
        j_next = jnp.sum(jnp.where(lane == i, c4r_out[0, :], 0))
        c4r_out[0, :] = jnp.where(lane == i, j, c4r_out[0, :])
        return (j_next, 0)

    jax.lax.while_loop(aug_cond, aug_body, (sink, 0))

    stat_lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)[0]
    stats_out[0, :] = jnp.where(
        stat_lane == 0,
        min_val,
        jnp.where(
            stat_lane == 1,
            steps.astype(jnp.float32),
            jnp.where(stat_lane == 2, sink.astype(jnp.float32), 0.0),
        ),
    )


def _jv_row_call(scal, cost_pad, u, v, r4c, c4r, interpret=False):
    """One augmenting-row search (see _jv_row_kernel).  All [1, n] state."""
    n_pad = cost_pad.shape[0]
    f32 = jnp.float32
    return pl.pallas_call(
        _jv_row_kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_shape=[
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),  # r4c
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),  # c4r
            jax.ShapeDtypeStruct((1, n_pad), f32),  # spc
            jax.ShapeDtypeStruct((1, n_pad), f32),  # scanned
            jax.ShapeDtypeStruct((1, n_pad), f32),  # rvis
            jax.ShapeDtypeStruct((1, 128), f32),  # stats
        ],
        scratch_shapes=[
            pltpu.VMEM((1, n_pad), jnp.int32),
            pltpu.VMEM((8, n_pad), f32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(scal, cost_pad, u, v, r4c, c4r)


@partial(jax.jit, static_argnames=("max_total_steps", "n_real", "interpret"))
def jv_device_pallas(cost, u0, v0, row4col0, col4row0, max_total_steps: int,
                     n_real: int, interpret: bool = False):
    """Dijkstra augmentation for every unassigned row, one pallas_call per
    row (assignment._jv_device semantics; returns (col4row [n_real],
    steps_used)).

    ``cost`` [n_real, n_real]; duals/matching from the tight-edge bulk
    phase.  Measured on the bundled 5k 'hungarian' cost (v5e): the XLA
    while_loop needed ~1.03 s for ~120k steps; this path runs the same
    steps VMEM-resident.
    """
    n_pad = _round_up(max(n_real, 128), 128)
    cost_pad = jnp.pad(
        cost, ((0, n_pad - n_real), (0, n_pad - n_real)),
        constant_values=_BIG_JV,
    )
    pad1 = ((0, 0), (0, n_pad - n_real))
    u = jnp.pad(u0[None, :], pad1)
    v = jnp.pad(v0[None, :], pad1)
    r4c = jnp.pad(row4col0[None, :], pad1, constant_values=-2)
    c4r = jnp.pad(col4row0[None, :], pad1, constant_values=-2)
    lane = jnp.arange(n_pad, dtype=jnp.int32)

    # Augmentation never unassigns a row (the path flips columns among
    # already-matched rows and finally assigns i_start), so the rows
    # needing a Dijkstra search are EXACTLY the ones the bulk phase left
    # free — compact them up front and loop over only those.  A scan over
    # all n rows with a lax.cond skip measured ~7.5 us per SKIPPED row on
    # v5e (37 ms of pure skip overhead at 5k, where ~90% of rows are bulk-
    # assigned); the dynamic-trip while_loop pays only for real searches.
    rows_i32 = jnp.arange(n_real, dtype=jnp.int32)
    free0 = c4r[0, :n_real] < 0
    free_rows = jnp.sort(jnp.where(free0, rows_i32, jnp.int32(n_real)))
    n_free = jnp.sum(free0.astype(jnp.int32))

    def cond(carry):
        k, u, v, r4c, c4r, steps_left = carry
        return jnp.logical_and(k < n_free, steps_left > 0)

    def body(carry):
        k, u, v, r4c, c4r, steps_left = carry
        i_start = free_rows[k]  # ascending — same order the row scan used
        scal = jnp.stack(
            [i_start, steps_left, jnp.int32(n_real), jnp.int32(n_pad)]
        )
        r4c_n, c4r_n, spc, scanned, rvis, stats = _jv_row_call(
            scal, cost_pad, u, v, r4c, c4r, interpret=interpret
        )
        min_val = stats[0, 0]
        steps = stats[0, 1].astype(jnp.int32)
        sink = stats[0, 2].astype(jnp.int32)
        did = sink >= 0

        # Deferred dual updates (scipy _lsap): need spc gathered at the
        # PRE-augmentation col4row — a VMEM gather Mosaic can't express,
        # done here in XLA instead.
        spc_of_row = spc[0][jnp.clip(c4r[0], 0, n_pad - 1)]
        upd_rows = jnp.logical_and(rvis[0] > 0, lane != i_start)
        u_new = jnp.where(
            upd_rows[None, :], u + min_val - spc_of_row[None, :], u
        )
        u_new = u_new.at[0, i_start].add(min_val)
        v_new = jnp.where(
            scanned[0][None, :] > 0, v - (min_val - spc[0][None, :]), v
        )
        u = jnp.where(did, u_new, u)
        v = jnp.where(did, v_new, v)
        r4c = jnp.where(did, r4c_n, r4c)
        c4r = jnp.where(did, c4r_n, c4r)
        return (k + 1, u, v, r4c, c4r, steps_left - steps)

    init = (jnp.int32(0), u, v, r4c, c4r, jnp.int32(max_total_steps))
    _, u, v, r4c, c4r, steps_left = jax.lax.while_loop(cond, body, init)
    return c4r[0, :n_real], jnp.int32(max_total_steps) - steps_left


# ----------------------------------------------------------------------
# Direct coordinate-difference KNN kernel
# ----------------------------------------------------------------------
#
# The matmul identity |q|^2+|r|^2-2q.r is the wrong tool for KNN in D<=16
# dims on TPU: it must run at Precision.HIGHEST (the identity cancels
# catastrophically in bf16 — see ops/knn.py), and the MXU pads the D=3
# contraction to 128 lanes, so a 15k x 15k query does ~128/3 x 6-pass the
# useful FLOPs.  This kernel instead expands (q_d - r_d)^2 directly on the
# VPU — exact f32, no padding waste — and keeps the running top-k
# VMEM-resident across reference tiles, so the [Nq, Nr] distance matrix
# never exists.  Measured on v5e at 15k x 15k (chained dispatch, transfer-
# fenced): D=3 nn 3.8 -> 0.5 ms, knn3 12.8 -> 1.0 ms; D=8 nn 3.7 -> 2.0 ms,
# knn3 12.6 -> 3.9 ms; at 960k x 960k D=3: nn 19.8 -> 3.9 s, knn3
# 42.8 -> 7.6 s (compute-bound).  Block sweep: (256, 2048) best of six.
#
# Mosaic constraints shape the code (see memory notes / JV kernel above):
# no VMEM gathers and no scalar stores, so per-lane reads are masked lane
# reductions and per-lane writes are full-vector selects; all sublane
# blocks are multiples of 8 (D is padded to 8/16 with zero coordinates,
# which add (0-0)^2 = 0 to every distance).


def _knn_kernel(q_ref, rt_ref, vout_ref, iout_ref, *, k, d_real, n_ref,
                block_q, block_r):
    j = pl.program_id(1)

    big = 1e30
    int_big = jnp.int32(2**30)

    @pl.when(j == 0)
    def _init():
        vout_ref[:] = jnp.zeros((block_q, 128), jnp.float32) + big
        iout_ref[:] = jnp.zeros((block_q, 128), jnp.int32)

    lane_q = jax.lax.broadcasted_iota(jnp.int32, (block_q, q_ref.shape[1]), 1)
    sub_r = jax.lax.broadcasted_iota(jnp.int32, (rt_ref.shape[0], block_r), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, block_r), 1) + j * block_r

    q_blk = q_ref[:]
    rt_blk = rt_ref[:]
    acc = jnp.zeros((block_q, block_r), jnp.float32)
    for d in range(d_real):
        qd = jnp.sum(jnp.where(lane_q == d, q_blk, 0.0), axis=1,
                     keepdims=True)                       # [bq, 1]
        rd = jnp.sum(jnp.where(sub_r == d, rt_blk, 0.0), axis=0,
                     keepdims=True)                       # [1, br]
        diff = qd - rd
        acc = acc + diff * diff
    acc = jnp.where(col < n_ref, acc, big)

    # Tile top-k: k rounds of (min, first-argmin, mask-out).
    cand = []
    for t in range(k):
        m = jnp.min(acc, axis=1, keepdims=True)           # [bq, 1]
        cidx = jnp.min(jnp.where(acc <= m, col, int_big), axis=1,
                       keepdims=True)                     # [bq, 1]
        cand.append((m, cidx))
        if t + 1 < k:
            acc = jnp.where(col == cidx, big, acc)

    # Running top-k lives in the revisited output block (lanes 0..k-1).
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (block_q, 128), 1)
    vout = vout_ref[:]
    iout = iout_ref[:]
    pairs = [
        (
            jnp.sum(jnp.where(lane128 == t, vout, 0.0), axis=1, keepdims=True),
            jnp.sum(jnp.where(lane128 == t, iout, 0), axis=1, keepdims=True),
        )
        for t in range(k)
    ] + cand

    # Odd-even transposition sort of the 2k (value, index) pairs; stable
    # (strict <) so earlier tiles win ties, then lower in-tile index.
    def cmpswap(a, b):
        av, ai = a
        bv, bi = b
        swap = bv < av
        return (
            (jnp.where(swap, bv, av), jnp.where(swap, bi, ai)),
            (jnp.where(swap, av, bv), jnp.where(swap, ai, bi)),
        )

    m2 = 2 * k
    for p in range(m2):
        for t in range(p % 2, m2 - 1, 2):
            pairs[t], pairs[t + 1] = cmpswap(pairs[t], pairs[t + 1])

    newv = jnp.zeros((block_q, 128), jnp.float32) + big
    newi = jnp.zeros((block_q, 128), jnp.int32)
    for t in range(k):
        newv = jnp.where(lane128 == t, pairs[t][0], newv)
        newi = jnp.where(lane128 == t, pairs[t][1], newi)
    vout_ref[:] = newv
    iout_ref[:] = newi


# Default KNN block schedule ((256, 2048): best of six in the round-3
# sweep).  knn.py's grid-cell chunking derives its estimates from these —
# keep them as the single source of truth.
KNN_BLOCK_Q = 256
KNN_BLOCK_R = 2048


@partial(jax.jit, static_argnames=("k", "block_q", "block_r", "interpret"))
def knn_pallas(ref, query, k: int, block_q: int = KNN_BLOCK_Q,
               block_r: int = KNN_BLOCK_R, interpret: bool = False):
    """k nearest neighbors by direct coordinate differences (VPU, exact f32).

    Same contract as ``knn_query`` / ``KDTree(ref).query(query, k)``
    (reference ``focusr.py:351-353, 409-412``): returns (Euclidean
    distances [Nq, k], indices [Nq, k]), ascending, ties broken toward the
    lower reference index.  Requires D <= 16 and Nr >= k.
    """
    nq, d_dim = query.shape
    nr = ref.shape[0]
    if d_dim > 16:
        raise ValueError(f"knn_pallas supports D<=16, got {d_dim}")
    if nr < k:
        raise ValueError(f"need at least k={k} reference points, got {nr}")
    if k > 128:
        # The running top-k lives in one 128-lane VMEM block; more
        # neighbors than lanes cannot be represented.  (knn_query routes
        # k > 128 to the XLA path before reaching here.)
        raise ValueError(f"knn_pallas supports k<=128, got {k}")
    d8 = _round_up(d_dim, 8)
    nq_pad = _round_up(max(nq, 1), block_q)
    nr_pad = _round_up(max(nr, 1), block_r)

    q_p = jnp.pad(query.astype(jnp.float32),
                  ((0, nq_pad - nq), (0, d8 - d_dim)))
    # Non-finite reference coordinates (caller data, NaN scan artifacts)
    # would poison jnp.min over the whole tile in-kernel — push them to the
    # huge-but-finite sentinel exactly like the XLA path (ops/knn.py:179);
    # their rows square to inf and can never win.
    ref_f = ref.astype(jnp.float32)
    ref_f = jnp.where(jnp.isfinite(ref_f), ref_f, 1e30)
    # Padded ref rows masked by index in-kernel; padded dims are zero on
    # both sides so they contribute (0-0)^2 = 0.
    rt = jnp.pad(ref_f, ((0, nr_pad - nr), (0, d8 - d_dim))).T

    kernel = partial(_knn_kernel, k=k, d_real=d_dim, n_ref=nr,
                     block_q=block_q, block_r=block_r)
    vals, idxs = pl.pallas_call(
        kernel,
        grid=(nq_pad // block_q, nr_pad // block_r),
        in_specs=[
            pl.BlockSpec((block_q, d8), lambda i, j: (i, 0)),
            pl.BlockSpec((d8, block_r), lambda i, j: (0, j)),
        ],
        out_specs=[
            pl.BlockSpec((block_q, 128), lambda i, j: (i, 0)),
            pl.BlockSpec((block_q, 128), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nq_pad, 128), jnp.float32),
            jax.ShapeDtypeStruct((nq_pad, 128), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q_p, rt)
    d2 = vals[:nq, :k]
    idx = idxs[:nq, :k]
    # Contract parity with the XLA path (ops/knn.py:259-265): a slot whose
    # winner is a padded column (index >= nr, acc = 1e30) or a sentinel/inf
    # row is a MISSING neighbor and reports cKDTree's (index == nr,
    # distance == inf) sentinel, never a finite out-of-range index.
    bad = (idx >= nr) | (d2 >= 1e29) | jnp.isnan(d2)
    d_out = jnp.where(bad, jnp.inf, jnp.sqrt(jnp.maximum(d2, 0.0)))
    return d_out, jnp.where(bad, nr, idx)
