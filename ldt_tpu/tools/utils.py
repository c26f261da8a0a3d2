"""Misc host utilities (reference tools/utils.py equivalents)."""

from __future__ import annotations

import os
import random

import jax
import numpy as np


def normalize_point_clouds(pcs):
    """Unit-sphere normalization, array-in array-out (tools/utils.py:16-22)."""
    import jax.numpy as jnp

    pcs = jnp.asarray(pcs)
    centroid = jnp.mean(pcs, axis=1, keepdims=True)
    pcs = pcs - centroid
    furthest = jnp.max(jnp.sqrt(jnp.sum(pcs ** 2, axis=-1, keepdims=True)),
                       axis=1, keepdims=True)
    return pcs / furthest


def enable_compile_cache() -> str | None:
    """Point JAX's persistent compilation cache at a repo-local directory.

    The axon transport compiles remotely at 2-8 min for the flagship
    sampler/train-step programs (CLAUDE.md); the persistent cache makes the
    SECOND process's identical program load in seconds. Probed working on
    the current backend (scripts/compile_cache_probe.py — the round-1
    'appeared to hang' report does not reproduce; measurements in
    docs/runbook.md). Reference N/A: this is the TPU transport tax.

    LDT_COMPILE_CACHE overrides the directory; "0" disables. Returns the
    directory in effect (None when disabled or when the caller already set
    one, e.g. the test conftest).
    """
    env = os.environ.get("LDT_COMPILE_CACHE")
    if env == "0":
        return None
    if jax.config.jax_compilation_cache_dir:
        return None  # respect an explicit prior setting
    cache = env or os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache")
    try:
        os.makedirs(cache, exist_ok=True)
    except OSError:
        return None
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache


def common_init(seed: int) -> jax.Array:
    """Global seeding (tools/utils.py:269-276). Returns the root jax PRNG key;
    JAX randomness is threaded explicitly from here (no global device RNG).

    Also wires multi-host DCN when the standard jax.distributed env is
    present (JAX_COORDINATOR_ADDRESS etc.) — a no-op on single-host runs,
    and the persistent compile cache (enable_compile_cache)."""
    from ldt_tpu.parallel.tp import initialize_distributed

    initialize_distributed()
    enable_compile_cache()
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.key(seed)


def trace_df_dx_hutchinson(f, x, noise):
    """Hutchinson estimator of tr(df/dx): E[noise^T (df/dx) noise]
    (reference tools/utils.py:184-200; used by likelihood-ODE variants).

    f: function of x; x: [B, ...]; noise: same shape as x.
    Returns per-batch-element trace estimates [B].
    """
    import jax
    import jax.numpy as jnp

    _, jvp_val = jax.jvp(f, (x,), (noise,))
    prod = (jvp_val * noise).reshape(x.shape[0], -1)
    return jnp.sum(prod, axis=-1)


def train_dtype(cfg):
    """Resolve `cfg.common.train_dtype` to the models' computation dtype.

    'float32' (default): the reference's numerics — every matmul f32
    (~1/4 the TPU MXU rate). 'bfloat16': mixed precision — flax keeps
    params in f32 (`param_dtype` default) while activations/matmuls run
    bf16; losses promote back to f32 where they mix with f32 operands
    (noise, weights). Standard DiT training practice; the stage-2 score
    update is otherwise f32-MXU-bound (docs/sampler_profile.md roofline).
    Unknown values raise (loud-config-errors convention).
    """
    import jax.numpy as jnp

    name = str(getattr(cfg.common, "train_dtype", None) or "float32")
    table = {"float32": jnp.float32, "f32": jnp.float32,
             "bfloat16": jnp.bfloat16, "bf16": jnp.bfloat16}
    if name not in table:
        raise ValueError(
            f"common.train_dtype={name!r}: expected one of {sorted(table)}")
    return table[name]


def sync_epoch_values(values):
    """One device->host transfer for an epoch's worth of per-step scalars.

    `values`: list of device scalars (or tuples of them) accumulated over an
    epoch by a pipelined training loop. Stacks them on device (ONE dispatch)
    and pulls the stack in ONE transfer — `jax.device_get` on the raw list
    moves each leaf separately, a round-trip per value on remote transports
    (~40-120 ms/call on the tunnel), and a per-step `float()` would serialize
    the async dispatch queue entirely (the 9.4x stage-2 regression).
    Returns a numpy array: [steps] or [steps, k].
    """
    import jax
    import jax.numpy as jnp

    if not values:
        import numpy as _np

        return _np.zeros((0,), _np.float32)
    return jax.device_get(jnp.asarray(values))


class AverageMeter:
    """Running average (tools/utils.py:279-295)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        val = float(val)
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)
