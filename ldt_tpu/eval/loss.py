"""Training losses + completion eval scores.

Parity targets:
  * `CD_loss` / `EMD_loss` — reference evaluation/loss.py:71-85
  * `L2_ChamferEval_1000` / `F1Score` — reference
    completion_trainer/Latent_SDE_Trainer.py:41-53
All run on the XLA chamfer/EMD kernels in `ldt_tpu.ops` (no CUDA builds).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ldt_tpu.ops.chamfer import chamfer_distance, chamfer_loss
from ldt_tpu.ops.emd import emd_loss


def CD_loss(pred: jax.Array, target: jax.Array, kind: str = "l1") -> jax.Array:
    """Chamfer training loss (evaluation/loss.py:71-78)."""
    return chamfer_loss(pred, target, kind)


def EMD_loss(pred: jax.Array, target: jax.Array, eps: float = 0.005,
             iters: int = 50) -> jax.Array:
    """Auction-EMD training loss (evaluation/loss.py:81-85)."""
    return emd_loss(pred, target, eps, iters)


def L2_ChamferEval_1000(array1: jax.Array, array2: jax.Array) -> jax.Array:
    """Mean bidirectional squared chamfer x 1000
    (completion_trainer/Latent_SDE_Trainer.py:41-44)."""
    d1, d2, _, _ = chamfer_distance(array1, array2)
    return (jnp.mean(d1) + jnp.mean(d2)) * 1000.0


def fscore(dist1: jax.Array, dist2: jax.Array, threshold: float = 0.001):
    """F-score from precomputed per-point distances
    (reference evaluation/ChamferDistancePytorch/fscore.py:3-16)."""
    precision_1 = jnp.mean((dist1 < threshold).astype(jnp.float32), axis=1)
    precision_2 = jnp.mean((dist2 < threshold).astype(jnp.float32), axis=1)
    denom = precision_1 + precision_2
    f = jnp.where(denom > 0,
                  2 * precision_1 * precision_2 / jnp.maximum(denom, 1e-12),
                  0.0)
    return f, precision_1, precision_2


def kl_softmax_loss(x: jax.Array, y: jax.Array) -> jax.Array:
    """KL(softmax(stop_grad(x)) || softmax(y)) over axis 1
    (reference model/functional/loss.py:7-10)."""
    px = jax.nn.softmax(jax.lax.stop_gradient(x), axis=1)
    log_py = jax.nn.log_softmax(y, axis=1)
    return jnp.mean(jnp.sum(px * (jnp.log(px) - log_py), axis=1))


def huber_loss(error: jax.Array, delta: float) -> jax.Array:
    """Huber loss (reference model/functional/loss.py:13-17)."""
    abs_error = jnp.abs(error)
    quadratic = jnp.minimum(abs_error, delta)
    return jnp.mean(0.5 * quadratic ** 2 + delta * (abs_error - quadratic))


def F1Score(array1: jax.Array, array2: jax.Array, threshold: float = 0.001):
    """Completion F-score (completion_trainer/Latent_SDE_Trainer.py:47-53).

    Returns (fscore [B], precision_1 [B], precision_2 [B]).
    """
    d1, d2, _, _ = chamfer_distance(array1, array2)
    precision_1 = jnp.mean((d1 < threshold).astype(jnp.float32), axis=1)
    precision_2 = jnp.mean((d2 < threshold).astype(jnp.float32), axis=1)
    denom = precision_1 + precision_2
    fscore = jnp.where(denom > 0, 2 * precision_1 * precision_2
                       / jnp.maximum(denom, 1e-12), 0.0)
    return fscore, precision_1, precision_2
