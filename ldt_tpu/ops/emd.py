"""Earth Mover's Distance on TPU, two flavors matching the reference's two uses:

1. ``auction_emd`` — training loss. Replaces the external auction-algorithm CUDA
   lib (reference README.md:24-26, wrapped at evaluation/emd.py:27-78, used by
   `EMD_loss` at evaluation/loss.py:81-85 with eps=0.005, iters=50). Implemented
   as a fixed-iteration parallel (Jacobi) auction inside `lax.scan` — static
   shapes, no host sync, batched. Returns per-point squared distances and the
   assignment; gradients flow to the predicted cloud only, matching the CUDA
   backward (evaluation/emd.py:63-70).

2. ``approx_match_cost`` — evaluation metric. Replaces
   `pytorch_structural_losses`'s ApproxMatch/MatchCost CUDA kernels
   (src/approxmatch.cu, wrapped by StructuralLosses/match_cost.py, used via
   `emd_approx_cuda` at evaluation/evaluation_metrics.py:37-46). Faithful matrix
   re-derivation of the annealed soft-assignment: 9 levels `level = -4^j`,
   j = 7..-1 (the kernel's loop bound `j > -2` — its `j == -2` branch is dead
   code), cost = sum(match * ||x1-x2||).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ldt_tpu.ops.geometry import square_distance


# ---------------------------------------------------------------------------
# Auction EMD (training loss)
# ---------------------------------------------------------------------------


# Compact-phase geometry (round-4). In the regime the training loss runs in
# (decoded cloud vs its own target), the unassigned-row count collapses
# within a handful of Jacobi rounds (measured: 2048 -> 484 -> 93 -> 24 at
# recon noise 0.02; see docs/emd_operating_point.md) — after which a dense
# round burns a full [N, N] pass to serve <128 bidders. The two-phase
# auction below runs dense rounds only while more than `_COMPACT_ENTER`
# rows are unassigned, then switches to rounds over a gathered
# [_COMPACT_TILE, N] row block. A compact round is EXACTLY a dense round
# whenever every unassigned row fits in the tile (assigned rows never
# bid) — and that holds for the WHOLE compact phase, unconditionally: the
# unassigned count is non-increasing (each winning bid assigns one row and
# displaces at most one previous owner; failed bidders stay unassigned),
# so once U <= tile it can never grow past it.
_COMPACT_TILE = 256
_COMPACT_ENTER = 256


def _row_assigned(owner: jax.Array, n: int) -> jax.Array:
    return (
        jnp.zeros((n,), jnp.int32).at[jnp.clip(owner, 0)].max(
            (owner >= 0).astype(jnp.int32)
        )
        > 0
    )


def _dense_round(d, owner, price, eps, neg_inf):
    """One Jacobi auction round, every unassigned row bids (round-2 math,
    unchanged: top-2 via two max-reductions, NOT lax.top_k — XLA lowers
    top_k as a sort, measured 26 ms/round on v5e at N=2048)."""
    n = d.shape[0]
    row_assigned = _row_assigned(owner, n)
    value = -(d + price[None, :])  # [N, N]
    best_j = jnp.argmax(value, axis=1).astype(jnp.int32)
    is_best = jnp.arange(n, dtype=jnp.int32)[None, :] == best_j[:, None]
    best_v = jnp.max(value, axis=1)
    second_v = jnp.max(jnp.where(is_best, neg_inf, value), axis=1)
    incr = best_v - second_v + eps
    bid = jnp.where(
        is_best & (~row_assigned)[:, None],
        incr[:, None],
        neg_inf,
    )  # [N rows, N cols]
    col_max = jnp.max(bid, axis=0)
    col_winner = jnp.argmax(bid, axis=0).astype(jnp.int32)
    has_bid = col_max > neg_inf
    owner = jnp.where(has_bid, col_winner, owner)
    price = jnp.where(has_bid, price + col_max, price)
    return owner, price


def _compact_round(d, owner, price, eps, neg_inf, tile: int):
    """The same Jacobi update restricted to the first `tile` unassigned rows
    (cumsum-compacted gather — no sort). Bitwise-identical to `_dense_round`
    when all unassigned rows fit in the tile: assigned rows contribute no
    bids there, argmax tie-breaks pick the smallest row index in both."""
    n = d.shape[0]
    unassigned = ~_row_assigned(owner, n)
    rank = jnp.cumsum(unassigned.astype(jnp.int32)) - 1
    dest = jnp.where(unassigned & (rank < tile), rank, tile)  # tile = dump
    slots = jnp.full((tile + 1,), n, jnp.int32).at[dest].min(
        jnp.arange(n, dtype=jnp.int32))
    idx = slots[:tile]                      # ascending row ids, n = padding
    valid = idx < n
    idx_c = jnp.minimum(idx, n - 1)
    dg = jnp.take(d, idx_c, axis=0)         # [tile, N]
    value = -(dg + price[None, :])
    best_j = jnp.argmax(value, axis=1).astype(jnp.int32)
    is_best = jnp.arange(n, dtype=jnp.int32)[None, :] == best_j[:, None]
    best_v = jnp.max(value, axis=1)
    second_v = jnp.max(jnp.where(is_best, neg_inf, value), axis=1)
    incr = best_v - second_v + eps
    bid = jnp.where(is_best & valid[:, None], incr[:, None], neg_inf)
    col_max = jnp.max(bid, axis=0)
    col_winner = idx_c[jnp.argmax(bid, axis=0)]
    has_bid = col_max > neg_inf
    owner = jnp.where(has_bid, col_winner, owner)
    price = jnp.where(has_bid, price + col_max, price)
    return owner, price


def _auction_single(x: jax.Array, y: jax.Array, eps: float, iters: int,
                    compact: bool = True, tile: int = _COMPACT_TILE,
                    enter: int = _COMPACT_ENTER):
    """Parallel auction for one cloud pair `[N, 3]` x `[N, 3]`.

    Maintains column ownership (`owner[j]` = row assigned to column j, -1 if
    free) and prices. Each round, every unassigned row bids for its best column
    with increment (best - second + eps); each column takes its max bidder.

    With `compact=True` (default) the fixed `iters`-round Jacobi schedule is
    split into dense rounds while > `enter` rows are unassigned, then
    [tile, N] compacted rounds, and stops early once the assignment is a
    bijection — all three transformations preserve the exact fixed-iters
    result (converged rounds are no-ops: no unassigned rows => no bids =>
    the (owner, price) state is a fixpoint). Total rounds never exceed
    `iters`. Under vmap each batch element advances/freezes independently
    (lax.while_loop batching), so the wall-clock is the per-phase max over
    the batch, not B x 50 dense rounds.
    """
    n = x.shape[0]
    d = jnp.maximum(square_distance(x[None], y[None])[0], 0.0)  # [N, N]
    neg_inf = jnp.finfo(d.dtype).min
    owner0 = jnp.full((n,), -1, jnp.int32)
    price0 = jnp.zeros((n,), d.dtype)

    if not compact:
        def body(state, _):
            owner, price = state
            return _dense_round(d, owner, price, eps, neg_inf), None

        (owner, _), _ = lax.scan(body, (owner0, price0), None, length=iters)
    else:
        # enter=0 degenerates to EARLY-EXIT DENSE: the dense while runs
        # until bijection (or iters) and the compact loop never fires.
        def n_unassigned(owner):
            return n - jnp.sum((owner >= 0).astype(jnp.int32))

        def dense_cond(state):
            i, owner, _ = state
            return (i < iters) & (n_unassigned(owner) > enter)

        def dense_body(state):
            i, owner, price = state
            owner, price = _dense_round(d, owner, price, eps, neg_inf)
            return i + 1, owner, price

        def compact_cond(state):
            i, owner, _ = state
            return (i < iters) & (n_unassigned(owner) > 0)

        def compact_body(state):
            i, owner, price = state
            owner, price = _compact_round(d, owner, price, eps, neg_inf,
                                          tile)
            return i + 1, owner, price

        state = (jnp.int32(0), owner0, price0)
        state = lax.while_loop(dense_cond, dense_body, state)
        _, owner, _ = lax.while_loop(compact_cond, compact_body, state)

    # Rows -> columns. Unconverged rows fall back to their nearest column (the
    # CUDA kernel likewise does not guarantee a bijection after fixed iters).
    assignment = jnp.full((n,), -1, jnp.int32)
    assignment = assignment.at[jnp.clip(owner, 0)].max(
        jnp.where(owner >= 0, jnp.arange(n, dtype=jnp.int32), -1)
    )
    nearest = jnp.argmin(d, axis=1).astype(jnp.int32)
    return jnp.where(assignment >= 0, assignment, nearest)


def auction_emd(x: jax.Array, y: jax.Array, eps: float = 0.005,
                iters: int = 50, compact: Optional[bool] = None):
    """Approximate 1-to-1 assignment EMD.

    Args:
      x: `[B, N, 3]` predictions (gradients flow here).
      y: `[B, N, 3]` targets (treated as constants, like the CUDA backward).
      eps: bid increment slack (reference uses 0.005 for the loss).
      iters: auction rounds (reference uses 50).
      compact: two-phase dense->compacted rounds with early exit (see
        `_auction_single`; result-identical). Default OFF: the v5e
        measurement (same-session controls, trained regime, B=16) put the
        dense 50-round scan at 3.1 ms/step vs 4.2 ms compact and 4.0 ms
        random-regime — the per-round gather/cumsum/scatter overhead of a
        compact round costs as much as the dense reduces it avoids, and
        lax.scan pipelines better than the batched while_loop. Kept as
        `LDT_EMD_COMPACT=1` (+ `LDT_EMD_ENTER=0` for pure early-exit
        dense rounds) — a recorded negative like the grouped-heads kernel.
    Returns:
      (dist `[B, N]` squared distances to assigned target,
       assignment `[B, N]` int32) — the `emdModule` contract
      (reference evaluation/emd.py:29-59).
    """
    # env knobs resolve OUT here (at call time) and enter the jit cache key
    # as static args — a module-level jit reading them at trace time would
    # silently serve the stale first trace after an env flip (the A/B
    # queue scripts use fresh processes, but an in-process sweep must not
    # lie). `enter` > tile would drop unassigned rows past the first
    # _COMPACT_TILE in a compact round, breaking the result-identical
    # guarantee — clamp it.
    if compact is None:
        compact = os.environ.get("LDT_EMD_COMPACT", "0") == "1"
    enter = int(os.environ.get("LDT_EMD_ENTER", str(_COMPACT_ENTER)))
    enter = min(enter, _COMPACT_TILE)
    return _auction_emd_jit(x, y, eps, iters, compact, enter)


@functools.partial(jax.jit, static_argnames=("iters", "compact", "enter"))
def _auction_emd_jit(x: jax.Array, y: jax.Array, eps: float,
                     iters: int, compact: bool, enter: int):
    assignment = lax.stop_gradient(
        jax.vmap(lambda a, b: _auction_single(a, b, eps, iters, compact,
                                              enter=enter))(x, y)
    )
    matched = lax.stop_gradient(
        jnp.take_along_axis(y, assignment[..., None], axis=1)
    )
    dist = jnp.sum((x - matched) ** 2, axis=-1)
    return dist, assignment


def emd_loss(pred: jax.Array, target: jax.Array, eps: float = 0.005,
             iters: int = 50) -> jax.Array:
    """`EMD_loss` parity (reference evaluation/loss.py:81-85):
    mean over sqrt of per-point squared assignment distances."""
    dist, _ = auction_emd(pred, target, eps, iters)
    return jnp.mean(jnp.sqrt(jnp.maximum(dist, 1e-12)))


# ---------------------------------------------------------------------------
# ApproxMatch EMD (evaluation metric)
# ---------------------------------------------------------------------------


def _approx_match_single(x1: jax.Array, x2: jax.Array) -> jax.Array:
    """Annealed soft matching for one pair; returns match `[N, M]`.

    Matrix form of approxmatch.cu:24-180 (n = |x1| rows, m = |x2| cols):
      per level L in (-4^7 .. -4^-1):
        W       = exp(L * D)
        ratioL  = remainL / (1e-9 + W @ remainR)
        sumr    = (W^T @ ratioL) * remainR
        ratioR  = min(remainR/(sumr+1e-9), 1) * remainR
        delta   = W * ratioL[:,None] * ratioR[None,:]
        match  += delta;  remainL -= delta.sum(1);  remainR -= sumr
    """
    n, m = x1.shape[0], x2.shape[0]
    d = jnp.maximum(square_distance(x1[None], x2[None])[0], 0.0)
    multi_l = jnp.asarray(max(1, m // n), d.dtype)
    multi_r = jnp.asarray(max(1, n // m), d.dtype)
    levels = jnp.asarray([-(4.0**j) for j in range(7, -2, -1)], d.dtype)

    def body(state, level):
        match, remain_l, remain_r = state
        w = jnp.exp(level * d)  # [N, M]
        suml = 1e-9 + w @ remain_r
        ratio_l = remain_l / suml
        sumr = (ratio_l @ w) * remain_r
        consumption = jnp.minimum(remain_r / (sumr + 1e-9), 1.0)
        ratio_r = consumption * remain_r
        delta = w * ratio_l[:, None] * ratio_r[None, :]
        match = match + delta
        remain_l = jnp.maximum(0.0, remain_l - jnp.sum(delta, axis=1))
        remain_r = jnp.maximum(0.0, remain_r - sumr)
        return (match, remain_l, remain_r), None

    init = (
        jnp.zeros((n, m), d.dtype),
        jnp.full((n,), multi_l, d.dtype),
        jnp.full((m,), multi_r, d.dtype),
    )
    (match, _, _), _ = lax.scan(body, init, levels)
    return match


def _approx_match_cost_single(x1: jax.Array, x2: jax.Array) -> jax.Array:
    """Cost-only approx match: same 9-level annealing as
    `_approx_match_single` but accumulating `sum(delta * dist)` per level
    instead of materializing the `match` accumulator.

    HBM-traffic restructure (round-4, eval path only): the metric
    (`match_cost`, approxmatch.cu:184-215) consumes ONLY the scalar cost,
    yet the matrix form reads+writes a [N, M] `match` and a [N, M] `delta`
    every level — 4 full-matrix passes of pure accumulator traffic. All
    per-level updates have matvec forms:
      row_drain_i = ratio_l_i * (w @ ratio_r)_i      (= delta.sum(1))
      cost_delta  = ratio_l @ ((w * dist) @ ratio_r) (= sum(delta * dist))
    so only `w` (and the fused w*dist pass) touches [N, M]. NOTE this is
    NOT the round-2 "matrix-free" negative result (which de-materialized
    `w` itself and lost to XLA re-fusing exp per consumer) — `w` stays
    materialized once per level; only the match/delta accumulators go.
    Bitwise: reduction orders differ from the matrix form at f32 rounding;
    the differential test pins them to each other at 1e-5.
    """
    n, m = x1.shape[0], x2.shape[0]
    d = jnp.maximum(square_distance(x1[None], x2[None])[0], 0.0)
    dist = jnp.sqrt(jnp.maximum(d, 1e-20))
    multi_l = jnp.asarray(max(1, m // n), d.dtype)
    multi_r = jnp.asarray(max(1, n // m), d.dtype)
    levels = jnp.asarray([-(4.0**j) for j in range(7, -2, -1)], d.dtype)

    def body(state, level):
        cost, remain_l, remain_r = state
        w = jnp.exp(level * d)  # [N, M], materialized once per level
        suml = 1e-9 + w @ remain_r
        ratio_l = remain_l / suml
        sumr = (ratio_l @ w) * remain_r
        consumption = jnp.minimum(remain_r / (sumr + 1e-9), 1.0)
        ratio_r = consumption * remain_r
        cost = cost + ratio_l @ ((w * dist) @ ratio_r)
        remain_l = jnp.maximum(0.0, remain_l - ratio_l * (w @ ratio_r))
        remain_r = jnp.maximum(0.0, remain_r - sumr)
        return (cost, remain_l, remain_r), None

    init = (
        jnp.zeros((), d.dtype),
        jnp.full((n,), multi_l, d.dtype),
        jnp.full((m,), multi_r, d.dtype),
    )
    (cost, _, _), _ = lax.scan(body, init, levels)
    return cost


# --- streaming Pallas kernel for the eval EMD (VERDICT r3 weak #1) --------
#
# The annealed approx-match is HBM-bound: the XLA form writes+reads the
# [N, M] w matrix ~4x per level on top of reading d. This kernel streams
# PRECOMPUTED f32 d row-tiles from HBM (Pallas double-buffers the fetch)
# and keeps ALL level state (remains / ratios / cost) in VMEM, recomputing
# w = exp(level * d) on the fly per use. HBM traffic drops to exactly
# 2 reads of d per level (phase A: suml/ratio_l/sumr; phase B:
# cost/remain_l) = 18 x [N, M] f32 per pair, with zero intermediate
# materialization. Layouts are chosen so every reduction is axis-natural:
# per-row state is a COLUMN [N, 1], per-col state a ROW [1, M] — no
# in-kernel transposes (Mosaic). Numerics: f32 throughout, same per-level
# math as `_approx_match_cost_single`; reduction orders differ at f32
# rounding (differential-tested).

_EMD_TILE = int(os.environ.get("LDT_EMD_PALLAS_TILE", "256"))
# pairs processed per grid step (unrolled in-kernel loop). >1 amortizes the
# per-grid-step overhead that bounded the round-4 kernel (144 tiny steps per
# pair); VMEM budget = 2 * pairs * tile * m * 4 bytes of double-buffered d
# blocks, so keep pairs * tile <= ~512 at m = 2048 (~16 MB VMEM/core).
_EMD_PAIRS = int(os.environ.get("LDT_EMD_PALLAS_PAIRS", "1"))
# on-the-fly d: keep the CLOUDS in VMEM (24 KB each, CD-kernel style,
# chamfer.py::_pairwise_cd_kernel) and compute each d row-tile per use with
# one [tile, 3] x [3, m] MXU dot — the [P, N, M] d tensor is never
# materialized at all (saves its HBM write + the 18 reads per pair AND the
# 1.6 GB pair-tile temp budget that caps eval tile sizes).
_EMD_OTF = os.environ.get("LDT_EMD_PALLAS_OTF", "0") == "1"
# MXU passes for the OTF k=3 dot. Mosaic's DEFAULT single-bf16 pass gives d
# ~3 decimal digits and exp(level*d) at level -4^7 turns that into ~4e-2
# COST error (v5e, 2026-08-20 parity run); Precision.HIGH is not lowerable
# by Mosaic ("Unsupported dot precision"), so HIGHEST is the only correct
# option. The recompute runs 18x per pair, which is why the accurate OTF
# variant (545 pairs/s) loses to the HBM-streaming kernel (718) — see
# docs/sampler_profile.md.
_OTF_PRECISION = jax.lax.Precision.HIGHEST


def _approx_match_cost_kernel(d_ref, o_ref, remain_l, ratio_l, remain_r,
                              sumr_acc, ratio_r, cost, *, n: int, m: int,
                              tile: int, pairs: int):
    blk = pl.program_id(0)
    lvl = pl.program_id(1)
    phase = pl.program_id(2)
    t = pl.program_id(3)
    n_tiles = n // tile
    level = -jnp.exp2(2.0 * (7.0 - lvl.astype(jnp.float32)))  # -4^(7-l)
    rs = pl.ds(t * tile, tile)

    @pl.when((lvl == 0) & (phase == 0) & (t == 0))
    def _init_blk():
        remain_r[...] = jnp.ones((pairs, m), jnp.float32)

    @pl.when((phase == 0) & (t == 0))
    def _init_level():
        sumr_acc[...] = jnp.zeros((pairs, m), jnp.float32)

    # static per-pair loop: each pair keeps a column of the row-state
    # buffers ([n, pairs]) and a row of the col-state buffers ([pairs, m]);
    # the d block is [pairs, tile, m] and d_ref[i] is a plain 2-D tile, so
    # the per-pair math below is exactly the pairs=1 kernel's.
    for i in range(pairs):
        _emd_pair_step(d_ref[i], i, level, blk, lvl, phase, t, n_tiles, rs,
                       tile, o_ref, remain_l, ratio_l, remain_r, sumr_acc,
                       ratio_r, cost, pairs)


def _emd_pair_step(d, i, level, blk, lvl, phase, t, n_tiles, rs, tile,
                   o_ref, remain_l, ratio_l, remain_r, sumr_acc, ratio_r,
                   cost, pairs):
    """One (level, phase, row-tile) step of the annealed match for pair
    slot `i`, on a [tile, m] d tile (however it was produced)."""
    w = jnp.exp(level * d)

    @pl.when(phase == 0)
    def _phase_a():
        @pl.when((lvl == 0) & (t == 0))
        def _init_cost():
            cost[0, i] = 0.0

        @pl.when(lvl == 0)
        def _init_rows():
            remain_l[rs, i:i + 1] = jnp.ones((tile, 1), jnp.float32)

        suml = 1e-9 + jnp.sum(w * remain_r[i:i + 1, :], axis=1,
                              keepdims=True)
        rl = remain_l[rs, i:i + 1] / suml          # [tile, 1]
        ratio_l[rs, i:i + 1] = rl
        sumr_acc[i:i + 1, :] += jnp.sum(rl * w, axis=0, keepdims=True)

    @pl.when(phase == 1)
    def _phase_b():
        @pl.when(t == 0)
        def _close_level():
            sumr = sumr_acc[i:i + 1, :] * remain_r[i:i + 1, :]
            sumr_acc[i:i + 1, :] = sumr            # reuse as the sumr value
            consumption = jnp.minimum(
                remain_r[i:i + 1, :] / (sumr + 1e-9), 1.0)
            ratio_r[i:i + 1, :] = consumption * remain_r[i:i + 1, :]

        dist = jnp.sqrt(jnp.maximum(d, 1e-20))
        rl = ratio_l[rs, i:i + 1]
        rr = ratio_r[i:i + 1, :]
        cost[0, i] += jnp.sum((w * dist) * rl * rr)
        wr = jnp.sum(w * rr, axis=1, keepdims=True)
        remain_l[rs, i:i + 1] = jnp.maximum(
            0.0, remain_l[rs, i:i + 1] - rl * wr)

        @pl.when(t == n_tiles - 1)
        def _end_level():
            remain_r[i:i + 1, :] = jnp.maximum(
                0.0, remain_r[i:i + 1, :] - sumr_acc[i:i + 1, :])

            @pl.when(lvl == 8)
            def _emit():
                # o_ref is the WHOLE [P, 1] SMEM buffer (constant
                # index_map — a (1, 1) block fails Mosaic's
                # block-mapping check even in SMEM); scalar dynamic
                # store per pair
                o_ref[blk * pairs + i, 0] = cost[0, i]


def _approx_match_cost_otf_kernel(x_ref, y_ref, o_ref, remain_l, ratio_l,
                                  remain_r, sumr_acc, ratio_r, cost, *,
                                  n: int, m: int, tile: int, pairs: int):
    """On-the-fly-d variant: clouds in VMEM, each [tile, m] d tile built per
    use with one k=3 MXU dot (chamfer.py::_pairwise_cd_kernel pattern) —
    zero [N, M] HBM traffic."""
    blk = pl.program_id(0)
    lvl = pl.program_id(1)
    phase = pl.program_id(2)
    t = pl.program_id(3)
    n_tiles = n // tile
    level = -jnp.exp2(2.0 * (7.0 - lvl.astype(jnp.float32)))  # -4^(7-l)
    rs = pl.ds(t * tile, tile)

    @pl.when((lvl == 0) & (phase == 0) & (t == 0))
    def _init_blk():
        remain_r[...] = jnp.ones((pairs, m), jnp.float32)

    @pl.when((phase == 0) & (t == 0))
    def _init_level():
        sumr_acc[...] = jnp.zeros((pairs, m), jnp.float32)

    for i in range(pairs):
        y = y_ref[i]                               # [m, 3] f32 (VMEM)
        xt = x_ref[i, pl.ds(t * tile, tile), :]    # [tile, 3]
        # raised precision on the k=3 dot — see _OTF_PRECISION above;
        # square_distance() makes the same choice for the same reason
        d = (jnp.sum(xt * xt, axis=-1)[:, None]
             - 2.0 * jax.lax.dot_general(
                 xt, y, (((1,), (1,)), ((), ())),
                 preferred_element_type=jnp.float32,
                 precision=_OTF_PRECISION)
             + jnp.sum(y * y, axis=-1)[None, :])   # [tile, m]
        d = jnp.maximum(d, 0.0)
        _emd_pair_step(d, i, level, blk, lvl, phase, t, n_tiles, rs, tile,
                       o_ref, remain_l, ratio_l, remain_r, sumr_acc,
                       ratio_r, cost, pairs)


def _approx_match_cost_pallas(x1: jax.Array, x2: jax.Array,
                              interpret: bool = False) -> jax.Array:
    """[P, N, 3] x [P, M, 3] -> [P] transport costs (n == m path)."""
    p, n, _ = x1.shape
    m = x2.shape[1]
    tile = _EMD_TILE
    pairs = max(1, min(_EMD_PAIRS, p))
    pad = (pairs - p % pairs) % pairs
    p_pad = p + pad
    scratch = [
        pltpu.VMEM((n, pairs), jnp.float32),   # remain_l (col / pair)
        pltpu.VMEM((n, pairs), jnp.float32),   # ratio_l (col / pair)
        pltpu.VMEM((pairs, m), jnp.float32),   # remain_r (row / pair)
        pltpu.VMEM((pairs, m), jnp.float32),   # sumr acc / sumr value
        pltpu.VMEM((pairs, m), jnp.float32),   # ratio_r (row / pair)
        pltpu.SMEM((1, pairs), jnp.float32),   # cost
    ]
    # scalar per-pair outputs: whole-array SMEM block (block shape ==
    # array shape satisfies Mosaic's block-mapping check; (1, 1) blocks
    # are rejected in both VMEM and SMEM), written by dynamic scalar
    # index in _emit
    out_spec = pl.BlockSpec((p_pad, 1), lambda pp, ll, ph, tt: (0, 0),
                            memory_space=pltpu.SMEM)
    out_shape = jax.ShapeDtypeStruct((p_pad, 1), jnp.float32)
    grid = (p_pad // pairs, 9, 2, n // tile)
    if _EMD_OTF:
        # pad the pair axis with zero clouds; d = 0 anneals to finite junk
        # costs the [:p] slice below discards (exp(level*0)=1, no NaN path)
        xp = x1.astype(jnp.float32)
        yp = x2.astype(jnp.float32)
        if pad:
            xp = jnp.concatenate([xp, jnp.zeros((pad, n, 3), jnp.float32)])
            yp = jnp.concatenate([yp, jnp.zeros((pad, m, 3), jnp.float32)])
        kernel = functools.partial(_approx_match_cost_otf_kernel, n=n, m=m,
                                   tile=tile, pairs=pairs)
        out = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            grid=grid,
            in_specs=[
                pl.BlockSpec((pairs, n, 3), lambda pp, ll, ph, tt: (pp, 0, 0)),
                pl.BlockSpec((pairs, m, 3), lambda pp, ll, ph, tt: (pp, 0, 0)),
            ],
            out_specs=out_spec,
            scratch_shapes=scratch,
            interpret=interpret,
        )(xp, yp)
        return out[:p, 0]
    d = jnp.maximum(square_distance(x1, x2), 0.0).astype(jnp.float32)
    if pad:
        # see the OTF branch note on zero-padded pairs
        d = jnp.concatenate([d, jnp.zeros((pad, n, m), jnp.float32)], 0)
    kernel = functools.partial(_approx_match_cost_kernel, n=n, m=m,
                               tile=tile, pairs=pairs)
    out = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=grid,
        in_specs=[pl.BlockSpec((pairs, tile, m),
                               lambda pp, ll, ph, tt: (pp, tt, 0))],
        out_specs=out_spec,
        scratch_shapes=scratch,
        interpret=interpret,
    )(d)
    return out[:p, 0]


def _use_emd_pallas(n: int, m: int) -> bool:
    # DEFAULT ON since 2026-08-20: the HBM-streaming kernel measured 718
    # pairs/s vs 521 XLA on the v5e eval tiles (pairs=1/tile=256, the
    # default operating point; +38%) with on-device parity 9.6e-7 vs the
    # XLA form. LDT_EVAL_EMD_PALLAS=0 restores the XLA tiles.
    if os.environ.get("LDT_EVAL_EMD_PALLAS", "1") != "1":
        return False
    from ldt_tpu.ops.chamfer import eval_pallas_single_tpu  # shared gate
    return (eval_pallas_single_tpu() and n == m and n % _EMD_TILE == 0
            and m % 128 == 0)


@jax.jit
def approx_match_cost(x1: jax.Array, x2: jax.Array) -> jax.Array:
    """Total transport cost sum(match * ||x1-x2||), per batch element.

    The `match_cost` contract (StructuralLosses/match_cost.py, cost kernel
    approxmatch.cu:184-215 uses euclidean — not squared — distance).

    Args:
      x1, x2: `[B, N, 3]`, `[B, M, 3]`.
    Returns:
      `[B]` costs (divide by N for the reference's `emd_approx_cuda`).

    LDT_EVAL_EMD_PALLAS=1 routes aligned n == m shapes through the
    streaming Pallas kernel above (TPU only; differential-tested).
    """
    if _use_emd_pallas(x1.shape[1], x2.shape[1]):
        return _approx_match_cost_pallas(x1, x2)
    return jax.vmap(_approx_match_cost_single)(x1, x2)


def emd_approx(sample: jax.Array, ref: jax.Array) -> jax.Array:
    """`emd_approx_cuda` parity (evaluation/evaluation_metrics.py:41-46):
    normalized matching cost, `[B]`."""
    n = sample.shape[1]
    assert n == ref.shape[1], "EMD requires equal-size clouds"
    return approx_match_cost(sample, ref) / float(n)
