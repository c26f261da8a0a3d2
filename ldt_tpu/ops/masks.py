"""Set-mask utilities + masked batch norm (reference model/Compressor/ops.py).

Variable-cardinality set support: random presence masks (`sample_mask`),
prefix masks (`get_mask`), masked fills, the NaN/Inf `check` assert, and a
masked BatchNorm for padded sets. In the shipped configs all sets are full
(2048 of 2048), but the API surface is preserved.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn


def sample_mask(rng: jax.Array, sample_sizes: Tuple[int, int],
                max_size: int) -> jax.Array:
    """Random “absent” mask: True marks padding slots (ops.py:6-14).

    sample_sizes = (batch, n_present). Each row keeps a random subset of
    `n_present` positions (False) out of `max_size`.
    """
    b, n = sample_sizes
    keys = jax.random.split(rng, b)
    presence = jax.vmap(
        lambda k: jax.random.permutation(k, max_size) < n)(keys)
    return ~presence


def get_mask(sizes: Tuple[int, int], max_size: int) -> jax.Array:
    """Prefix “absent” mask (ops.py:17-25)."""
    b, n = sizes
    return jnp.broadcast_to(jnp.arange(max_size) >= n, (b, max_size))


def masked_fill(tensor_bnc: jax.Array, mask_bn: Optional[jax.Array] = None,
                value: float = 0.0) -> jax.Array:
    """Fill masked positions (ops.py:28-29)."""
    if mask_bn is None:
        return tensor_bnc
    return jnp.where(mask_bn[..., None], value, tensor_bnc)


def check(x: jax.Array) -> None:
    """Host-side NaN/Inf assert (ops.py:32-35)."""
    import numpy as np

    arr = np.asarray(x)
    isinf = np.isinf(arr).any()
    isnan = np.isnan(arr).any()
    assert not (isinf or isnan), (
        f"Tensor of shape [{arr.shape}] is isinf:{isinf} or isnan:{isnan}")


def get_pairwise_distance(x: jax.Array, p: int = 2) -> jax.Array:
    """[N, D] -> [N, N] pairwise p-norm distances (ops.py:45-51)."""
    diff = x[:, None, :] - x[None, :, :]
    if p == 2:
        return jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, -1), 0.0))
    return jnp.sum(jnp.abs(diff) ** p, -1) ** (1.0 / p)


class MaskedBatchNorm(nn.Module):
    """BatchNorm over [B, N, C] sets that ignores masked positions
    (ops.py:54-148). `mask_bn`: True = padding (excluded from statistics)."""

    features: int
    momentum: float = 0.9
    epsilon: float = 1e-5
    use_scale: bool = True
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, mask_bn: Optional[jax.Array] = None, *,
                 train: bool = False) -> jax.Array:
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((self.features,)))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((self.features,)))
        if train:
            if mask_bn is None:
                mean = jnp.mean(x, axis=(0, 1))
                var = jnp.var(x, axis=(0, 1))
            else:
                keep = (~mask_bn)[..., None].astype(x.dtype)
                count = jnp.maximum(jnp.sum(keep), 1.0)
                mean = jnp.sum(x * keep, axis=(0, 1)) / count
                var = jnp.sum(keep * (x - mean) ** 2, axis=(0, 1)) / count
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1 - self.momentum) * var)
        else:
            mean, var = ra_mean.value, ra_var.value
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        if self.use_scale:
            y = y * self.param("scale", nn.initializers.ones,
                               (self.features,))
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros,
                               (self.features,))
        return masked_fill(y, mask_bn)
