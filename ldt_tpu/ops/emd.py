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

import jax
import jax.numpy as jnp
from jax import lax

from ldt_tpu.ops.geometry import square_distance


# ---------------------------------------------------------------------------
# Auction EMD (training loss)
# ---------------------------------------------------------------------------


def _auction_single(x: jax.Array, y: jax.Array, eps: float, iters: int):
    """Parallel auction for one cloud pair `[N, 3]` x `[N, 3]`.

    Maintains column ownership (`owner[j]` = row assigned to column j, -1 if
    free) and prices. Each round, every unassigned row bids for its best column
    with increment (best - second + eps); each column takes its max bidder.
    """
    n = x.shape[0]
    d = jnp.maximum(square_distance(x[None], y[None])[0], 0.0)  # [N, N]
    neg_inf = jnp.finfo(d.dtype).min

    def body(state, _):
        owner, price = state
        row_assigned = (
            jnp.zeros((n,), jnp.int32).at[jnp.clip(owner, 0)].max(
                (owner >= 0).astype(jnp.int32)
            )
            > 0
        )
        value = -(d + price[None, :])  # [N, N]
        # top-2 via two max-reductions, NOT lax.top_k: XLA lowers top_k as a
        # sort, which measured 26 ms/round on v5e at N=2048 (91% of the whole
        # stage-1 train step); max + masked second max is ~10x cheaper
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
        return (owner, price), None

    owner0 = jnp.full((n,), -1, jnp.int32)
    price0 = jnp.zeros((n,), d.dtype)
    (owner, _), _ = lax.scan(body, (owner0, price0), None, length=iters)

    # Rows -> columns. Unconverged rows fall back to their nearest column (the
    # CUDA kernel likewise does not guarantee a bijection after fixed iters).
    assignment = jnp.full((n,), -1, jnp.int32)
    assignment = assignment.at[jnp.clip(owner, 0)].max(
        jnp.where(owner >= 0, jnp.arange(n, dtype=jnp.int32), -1)
    )
    nearest = jnp.argmin(d, axis=1).astype(jnp.int32)
    return jnp.where(assignment >= 0, assignment, nearest)


@functools.partial(jax.jit, static_argnames=("iters",))
def auction_emd(x: jax.Array, y: jax.Array, eps: float = 0.005,
                iters: int = 50):
    """Approximate 1-to-1 assignment EMD.

    Args:
      x: `[B, N, 3]` predictions (gradients flow here).
      y: `[B, N, 3]` targets (treated as constants, like the CUDA backward).
      eps: bid increment slack (reference uses 0.005 for the loss).
      iters: auction rounds (reference uses 50).
    Returns:
      (dist `[B, N]` squared distances to assigned target,
       assignment `[B, N]` int32) — the `emdModule` contract
      (reference evaluation/emd.py:29-59).
    """
    assignment = lax.stop_gradient(
        jax.vmap(lambda a, b: _auction_single(a, b, eps, iters))(x, y)
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


@jax.jit
def approx_match_cost(x1: jax.Array, x2: jax.Array) -> jax.Array:
    """Total transport cost sum(match * ||x1-x2||), per batch element.

    The `match_cost` contract (StructuralLosses/match_cost.py, cost kernel
    approxmatch.cu:184-215 uses euclidean — not squared — distance).

    Args:
      x1, x2: `[B, N, 3]`, `[B, M, 3]`.
    Returns:
      `[B]` costs (divide by N for the reference's `emd_approx_cuda`).
    """
    def one(a, b):
        match = _approx_match_single(a, b)
        dist = jnp.sqrt(jnp.maximum(square_distance(a[None], b[None])[0], 1e-20))
        return jnp.sum(match * dist)

    return jax.vmap(one)(x1, x2)


def emd_approx(sample: jax.Array, ref: jax.Array) -> jax.Array:
    """`emd_approx_cuda` parity (evaluation/evaluation_metrics.py:41-46):
    normalized matching cost, `[B]`."""
    n = sample.shape[1]
    assert n == ref.shape[1], "EMD requires equal-size clouds"
    return approx_match_cost(sample, ref) / float(n)
