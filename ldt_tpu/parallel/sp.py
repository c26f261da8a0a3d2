"""Sequence-parallel decode sharding (library feature, repo surplus).

The compressor decode is up-to-2048 *independent* queries cross-attending to
<= 32 latent tokens (reference model/Compressor/Network.py:80-83; SURVEY §5
"shard the 2048-point query axis ... queries are independent given the 32
latents"). Under the 2-D `data x model` mesh the `model` axis is idle during
decode — the compressor is replicated, only the DiT is tensor-parallel
(parallel/tp.py) — so registering the active mesh here repurposes it as a
sequence axis: the decoded set [B, N, D] is constrained to
P("data", "model", None) and GSPMD keeps every per-point op (cross-attention
queries, MLP, output conv) local to its shard, replicating only the tiny
[B, 32, D] latent keys/values. No hand-written collectives; XLA inserts the
single output all-gather where a consumer needs the full set.

Same registry discipline as eval/metrics.py::set_eval_mesh: trainers register
their mesh at construction (training/base.py), i.e. BEFORE any jit traces the
decode, because `sp_shard` reads the registry at trace time.

Note: under a model axis the Attention module keeps the Pallas core only
for the packed SELF-attention path (per-model-shard shard_map, see
ops/pallas_attention.py::fused_attention_packed_tp); the decode's
cross-attention falls back to XLA inside the module, which partitions
cleanly under these SP constraints — no reshard around a replicated
custom call. Single-chip (or no model axis): every constraint is a no-op.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_SP_MESH: Optional[Mesh] = None


def set_sp_mesh(mesh: Optional[Mesh]) -> None:
    """Register (or clear, with None) the mesh decode activations shard over."""
    global _SP_MESH
    _SP_MESH = mesh


def sp_spec(shape, mesh: Mesh) -> Optional[P]:
    """PartitionSpec for one [B, N, D] decoded-set activation, or None when
    nothing shards (axis missing, size 1, or dims that don't divide)."""
    axes = dict(mesh.shape)
    spec = [None, None, None]
    d = axes.get("data", 1)
    if d > 1 and shape[0] % d == 0:
        spec[0] = "data"
    m = axes.get("model", 1)
    if m > 1 and shape[1] % m == 0:
        spec[1] = "model"
    if spec[0] is None and spec[1] is None:
        return None
    return P(*spec)


def sp_shard(x: jax.Array) -> jax.Array:
    """Constrain a [B, N, D] decoded set to (data, model, -) over the
    registered mesh. No-op without a registered mesh, for non-rank-3 values,
    or when neither axis divides."""
    mesh = _SP_MESH
    if mesh is None or getattr(x, "ndim", None) != 3:
        return x
    spec = sp_spec(x.shape, mesh)
    if spec is None:
        return x
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))
