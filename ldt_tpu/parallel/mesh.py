"""Mesh + sharding helpers.

The reference has no distributed layer at all (SURVEY.md §2.3) — single GPU,
DataLoader workers as the only concurrency. The TPU-native scaling story is
SPMD data parallelism: a 1-D `data` mesh over all chips, batch sharded on the
leading axis, params replicated. `jax.jit` then inserts the gradient
all-reduce (psum over ICI) automatically; no explicit collectives needed.
Multi-host DCN extends the same mesh (jax.distributed) without code changes.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_mesh(devices=None, axis_name: str = "data") -> Mesh:
    """1-D mesh over all local devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.array(devices), (axis_name,))


def shard_batch(mesh: Optional[Mesh], batch: Any, axis_name: str = "data"):
    """Place each array in `batch` with its leading axis sharded over the mesh.

    Arrays whose leading dim does not divide the mesh size are replicated.
    No-op (plain device_put) for a 1-device mesh or mesh=None.
    """
    if mesh is None or mesh.size == 1:
        return batch

    def put(x):
        if hasattr(x, "shape") and x.ndim >= 1 and x.shape[0] % mesh.size == 0:
            return jax.device_put(x, NamedSharding(mesh, P(axis_name)))
        if hasattr(x, "shape"):
            return jax.device_put(x, NamedSharding(mesh, P()))
        return x

    return jax.tree_util.tree_map(put, batch)


def replicate(mesh: Optional[Mesh], tree: Any):
    """Replicate a pytree (params) across the mesh."""
    if mesh is None or mesh.size == 1:
        return tree
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding) if hasattr(x, "shape") else x,
        tree)


def shard_leading_axis(mesh: Optional[Mesh], x, axis_name: str = "data"):
    if mesh is None or mesh.size == 1:
        return x
    return jax.device_put(x, NamedSharding(mesh, P(axis_name)))


def device_put_host(mesh: Optional[Mesh], tree: Any):
    """Device-put HOST (numpy) leaves of a pytree; jax.Arrays pass through.

    Restored checkpoints arrive as numpy pytrees
    (training/checkpoint.py::restore_into). Without explicit placement a
    jitted call re-uploads every numpy argument on EVERY invocation —
    measured ~36 s/call for the flagship 457M-param score state over the
    TPU transport, dwarfing the ~1 ms/step of device compute. Training
    self-heals after one step (the update returns device arrays), but
    sampling-only flows (golden eval, gates, valsample-after-resume) never
    write state back and pay the upload per call.

    Placement is replicated over `mesh` when given (pure data parallelism
    keeps params replicated); tensor-parallel placement is
    parallel/tp.py::shard_train_state's job, which handles numpy leaves
    itself.
    """
    sharding = (NamedSharding(mesh, P())
                if mesh is not None and mesh.size > 1 else None)

    def put(x):
        if isinstance(x, np.ndarray):
            return jax.device_put(x, sharding)
        return x

    return jax.tree_util.tree_map(put, tree)
