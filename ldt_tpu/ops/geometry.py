"""Point-cloud geometry primitives, pure XLA.

These replace the reference's CUDA extensions (`pointnet2_ops`'s furthest point
sampling, plus the pure-torch helpers in `model/Compressor/layers.py:46-112` of
the reference): everything here is shape-static and compiles into a single XLA
program, so FPS/kNN/grouping fuse into the surrounding model.

Conventions: point clouds are `[B, N, C]` (channels-last, the native TPU layout).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def square_distance(src: jax.Array, dst: jax.Array) -> jax.Array:
    """Pairwise squared euclidean distance.

    Mirrors the semantics of the reference's ``square_distance``
    (model/Compressor/layers.py:65-84): `dist[b, n, m] = ||src[b,n] - dst[b,m]||^2`,
    computed via the expanded form so the inner contraction runs on the MXU.

    Args:
      src: `[B, N, C]` query points.
      dst: `[B, M, C]` target points.
    Returns:
      `[B, N, M]` squared distances.
    """
    # -2 * src @ dst^T  +  ||src||^2  +  ||dst||^2
    # HIGHEST precision: distances feed argmin/metrics, bf16 passes would skew
    # nearest-neighbor decisions on TPU.
    dist = -2.0 * jnp.einsum(
        "bnc,bmc->bnm", src, dst, precision=lax.Precision.HIGHEST
    )
    dist = dist + jnp.sum(src * src, axis=-1, keepdims=True)
    dist = dist + jnp.sum(dst * dst, axis=-1, keepdims=True).transpose(0, 2, 1)
    return dist


def index_points(points: jax.Array, idx: jax.Array) -> jax.Array:
    """Batched gather: `out[b, ..., :] = points[b, idx[b, ...], :]`.

    Equivalent to the reference's ``index_points``
    (model/Compressor/layers.py:46-62) but via `take_along_axis`.

    Args:
      points: `[B, N, C]`.
      idx: `[B, S]` or `[B, S, K]` integer indices into the N axis.
    Returns:
      `[B, S, C]` or `[B, S, K, C]`.
    """
    if idx.ndim == 2:
        return jnp.take_along_axis(points, idx[..., None], axis=1)
    if idx.ndim == 3:
        b, s, k = idx.shape
        flat = jnp.take_along_axis(
            points, idx.reshape(b, s * k)[..., None], axis=1
        )
        return flat.reshape(b, s, k, points.shape[-1])
    raise ValueError(f"idx must be rank 2 or 3, got {idx.shape}")


def knn_point(nsample: int, xyz: jax.Array, new_xyz: jax.Array) -> jax.Array:
    """Indices of the `nsample` nearest neighbors of each query point.

    Mirrors the reference's ``knn_point`` (model/Compressor/layers.py:87-98).

    Args:
      nsample: number of neighbors (static).
      xyz: `[B, N, C]` all points.
      new_xyz: `[B, S, C]` query points.
    Returns:
      `[B, S, nsample]` int32 neighbor indices (sorted by distance).
    """
    sqrdists = square_distance(new_xyz, xyz)
    _, group_idx = lax.top_k(-sqrdists, nsample)
    return group_idx


def _fps_single(pts: jax.Array, n_samples: int) -> jax.Array:
    """FPS for one cloud `[N, C]` -> `[n_samples]` indices.

    Deterministically starts from index 0, like the reference CUDA kernel
    (model/functional/src/sampling/sampling.cu:100-175): each step picks the
    point with max distance-to-selected-set.
    """
    n = pts.shape[0]

    def body(i, state):
        idxs, min_d, last = state
        last_pt = pts[last]
        d = jnp.sum((pts - last_pt[None, :]) ** 2, axis=-1)
        min_d = jnp.minimum(min_d, d)
        nxt = jnp.argmax(min_d).astype(jnp.int32)
        idxs = idxs.at[i].set(nxt)
        return idxs, min_d, nxt

    idxs0 = jnp.zeros((n_samples,), jnp.int32)
    min_d0 = jnp.full((n,), jnp.finfo(pts.dtype).max, pts.dtype)
    idxs, _, _ = lax.fori_loop(1, n_samples, body, (idxs0, min_d0, jnp.int32(0)))
    return idxs


@functools.partial(jax.jit, static_argnums=1)
def furthest_point_sample(xyz: jax.Array, n_samples: int) -> jax.Array:
    """Furthest point sampling over a batch.

    TPU-native replacement of `pointnet2_utils.furthest_point_sample` (the
    external CUDA dependency used at reference model/Compressor/layers.py:106).
    Sequential over `n_samples` (a `fori_loop`), fully parallel over B x N.

    Args:
      xyz: `[B, N, C]` points (only the coordinate channels should be passed).
      n_samples: number of centers (static).
    Returns:
      `[B, n_samples]` int32 indices.
    """
    return jax.vmap(_fps_single, in_axes=(0, None))(xyz, n_samples)


def cluster(xyz: jax.Array, n_groups: int, k: int, center: jax.Array | None = None):
    """FPS centers + kNN groups, mirroring the reference ``cluster``
    (model/Compressor/layers.py:101-112).

    Args:
      xyz: `[B, N, 3]` points.
      n_groups: number of FPS centers (static).
      k: neighbors per group (static).
      center: optional precomputed `[B, S, 3]` centers.
    Returns:
      (new_xyz `[B, S, 3]`, center_idx `[B, S]` or None, group_idx `[B, S, k]`)
    """
    if center is None:
        center_idx = furthest_point_sample(lax.stop_gradient(xyz), n_groups)
        new_xyz = index_points(xyz, center_idx)
    else:
        new_xyz = center
        center_idx = None
    group_idx = knn_point(k, xyz, new_xyz)
    return new_xyz, center_idx, group_idx


def ball_query(radius: float, nsample: int, xyz: jax.Array,
               new_xyz: jax.Array) -> jax.Array:
    """Ball query: up to `nsample` points of `xyz` within `radius` of each query.

    API-parity replacement for the reference PVCNN backend `ball_query`
    (model/functional/ball_query.py:7-19). Points outside the radius are
    replaced by the first in-radius point (standard PointNet++ semantics).

    Returns `[B, S, nsample]` int32 indices.
    """
    sqrdists = square_distance(new_xyz, xyz)  # [B, S, N]
    in_ball = sqrdists <= radius * radius
    n = xyz.shape[1]
    # "First nsample in-ball points in index order" is a compaction, not a
    # sort: rank in-ball points by cumsum and scatter-min their indices
    # into their rank slot (same trick as the auction EMD's compact
    # rounds). The previous lax.top_k over [B, S, N] keys lowered to a
    # full sort — the 26 ms/round trap measured on the auction (VERDICT r3
    # weak #7); nothing on the main path calls ball_query, but the op
    # should not carry a known trap.
    rank = jnp.cumsum(in_ball.astype(jnp.int32), axis=-1) - 1  # [B, S, N]
    dest = jnp.where(in_ball & (rank < nsample), rank, nsample)
    idx_rank = jax.lax.broadcasted_iota(jnp.int32, sqrdists.shape, 2)
    slots = jnp.full(sqrdists.shape[:2] + (nsample + 1,), n, jnp.int32)
    slots = slots.at[
        jax.lax.broadcasted_iota(jnp.int32, dest.shape, 0),
        jax.lax.broadcasted_iota(jnp.int32, dest.shape, 1),
        dest,
    ].min(idx_rank)
    group_idx = slots[..., :nsample]
    # Replace empty slots by the first valid pick (standard PointNet++).
    # A fully-empty ball falls back to index 0 — the reference CUDA's
    # zero-initialized output buffer semantics — not n-1 (which a plain
    # min-clamp of the sentinel would give).
    valid = group_idx < n
    first = group_idx[..., :1]
    first = jnp.where(first < n, first, 0)
    return jnp.where(valid, group_idx, first)


def grouping(features: jax.Array, idx: jax.Array) -> jax.Array:
    """Group features by neighbor indices: `[B, N, C]`, `[B, S, K]` -> `[B, S, K, C]`.

    API-parity replacement for the PVCNN `grouping` op
    (model/functional/grouping.py:9-31), channels-last.
    """
    return index_points(features, idx)


def gather(features: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather features at center indices: `[B, N, C]`, `[B, S]` -> `[B, S, C]`."""
    return index_points(features, idx)


def nearest_neighbor_interpolate(points_coords: jax.Array,
                                 centers_coords: jax.Array,
                                 centers_features: jax.Array) -> jax.Array:
    """3-NN inverse-distance interpolation of center features onto points.

    API-parity replacement for the PVCNN `nearest_neighbor_interpolate`
    (model/functional/interpolatation.py:9-38), channels-last.

    Args:
      points_coords: `[B, N, 3]` target points.
      centers_coords: `[B, M, 3]` source centers.
      centers_features: `[B, M, C]` source features.
    Returns:
      `[B, N, C]` interpolated features.
    """
    d2 = square_distance(points_coords, centers_coords)  # [B, N, M]
    neg_d2, idx = lax.top_k(-d2, 3)
    w = 1.0 / jnp.maximum(-neg_d2, 1e-10)
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    grouped = index_points(centers_features, idx)  # [B, N, 3, C]
    return jnp.sum(grouped * w[..., None], axis=2)


def avg_voxelize(features: jax.Array, coords: jax.Array,
                 resolution: int) -> jax.Array:
    """Average-pool point features into a dense `r^3` voxel grid.

    API-parity replacement for the PVCNN `avg_voxelize`
    (model/functional/voxelization.py:8-40). `coords` are integer voxel
    coordinates in `[0, resolution)`.

    Args:
      features: `[B, N, C]`.
      coords: `[B, N, 3]` int32.
    Returns:
      `[B, resolution, resolution, resolution, C]`.
    """
    r = resolution
    flat = (coords[..., 0] * r + coords[..., 1]) * r + coords[..., 2]  # [B, N]
    num = jax.vmap(
        lambda f, i: jnp.zeros((r * r * r, f.shape[-1]), f.dtype).at[i].add(f)
    )(features, flat)
    cnt = jax.vmap(
        lambda i: jnp.zeros((r * r * r,), features.dtype).at[i].add(1.0)
    )(flat)
    avg = num / jnp.maximum(cnt[..., None], 1.0)
    return avg.reshape(features.shape[0], r, r, r, features.shape[-1])


def trilinear_devoxelize(grid: jax.Array, coords: jax.Array) -> jax.Array:
    """Trilinearly sample a voxel grid at (float) point coordinates.

    API-parity replacement for the PVCNN `trilinear_devoxelize`
    (model/functional/devoxelization.py:9-42).

    Args:
      grid: `[B, R, R, R, C]`.
      coords: `[B, N, 3]` float in `[0, R-1]`.
    Returns:
      `[B, N, C]`.
    """
    r = grid.shape[1]
    c0 = jnp.floor(coords).astype(jnp.int32)
    frac = coords - c0
    out = 0.0
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                corner = jnp.clip(
                    c0 + jnp.array([dx, dy, dz], jnp.int32), 0, r - 1
                )
                w = (
                    jnp.where(dx, frac[..., 0], 1 - frac[..., 0])
                    * jnp.where(dy, frac[..., 1], 1 - frac[..., 1])
                    * jnp.where(dz, frac[..., 2], 1 - frac[..., 2])
                )
                flat = (corner[..., 0] * r + corner[..., 1]) * r + corner[..., 2]
                vals = jax.vmap(lambda g, i: g.reshape(r * r * r, -1)[i])(
                    grid, flat
                )
                out = out + vals * w[..., None]
    return out


def normalize_point_clouds(pc: jax.Array) -> jax.Array:
    """Center each cloud and scale to the unit sphere.

    Mirrors the reference's ``normalize_point_clouds`` (tools/utils.py:16-22).
    `pc`: `[B, N, 3]`.
    """
    centroid = jnp.mean(pc, axis=1, keepdims=True)
    pc = pc - centroid
    furthest = jnp.max(
        jnp.sqrt(jnp.sum(pc**2, axis=-1, keepdims=True)), axis=1, keepdims=True
    )
    return pc / furthest
