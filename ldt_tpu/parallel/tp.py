"""Tensor-parallel sharding rules + 2-D mesh factory (library feature).

The reference has no distributed layer (single GPU, SURVEY.md §2.3); this is
repo surplus, designed TPU-first: a 2-D `data x model` mesh, Megatron-style
PartitionSpecs on the DiT block weights, and GSPMD/XLA inserting the ICI
collectives. Nothing here hand-writes a collective — parameters are placed
with `jax.device_put(..., NamedSharding)` and every jitted step that
consumes them partitions automatically.

Megatron pairing on each ResidualBlock (column- then row-parallel, one psum
per pair): fc_q / fc_kv / mlp up-projection shard their OUTPUT features over
`model` (bias too); fc_o / mlp down-projection shard their INPUT features
(bias replicated). AdaLN heads are small and feed elementwise gates —
replicated. Head-dim note: sharding the packed head axis over `model`
requires model_parallel | num_heads (16 for the flagship DiT).

Multi-host: `initialize_distributed()` wires `jax.distributed.initialize()`
from the standard env (JAX_COORDINATOR_ADDRESS/NUM_PROCESSES/PROCESS_ID) or
explicit args; the mesh factory then spans all processes' devices over DCN x
ICI exactly as it does single-host.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Dense kernels whose OUTPUT (last) axis is column-parallel over `model`
_COL_PARALLEL = ("fc_q", "fc_kv")
# Dense kernels whose INPUT (first) axis is row-parallel over `model`
_ROW_PARALLEL = ("fc_o",)
# inside `mlp`: Dense_0 is the up-projection (column), Dense_1 the down (row)
_MLP_COL, _MLP_ROW = "Dense_0", "Dense_1"


def make_mesh(model_parallel: int = 1, devices=None,
              data_axis: str = "data", model_axis: str = "model") -> Mesh:
    """`data x model` mesh over `devices` (default: all).

    model_parallel=1 degenerates to the 1-D data mesh. The model axis is the
    FASTER-varying (innermost) axis so its collectives ride neighboring ICI
    links; data-parallel gradient psums cross the slower axis (or DCN on
    multi-host).
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(
            f"model_parallel={model_parallel} must divide {n} devices")
    arr = np.array(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, (data_axis, model_axis))


def has_model_axis(mesh: Optional[Mesh]) -> bool:
    return (mesh is not None and "model" in mesh.axis_names
            and mesh.shape["model"] > 1)


# --- attention TP-mesh registry -------------------------------------------
# Same discipline as eval/metrics.py::set_eval_mesh and sp.py::set_sp_mesh:
# trainers register their mesh at construction, BEFORE any jit traces an
# attention module, because nn/layers.py::Attention reads the registry at
# trace time to route the packed self-attention fast path through
# ops/pallas_attention.py::fused_attention_packed_tp (per-model-shard
# shard_map — whole heads per shard, zero extra collectives).
_TP_MESH: Optional[Mesh] = None


def set_tp_mesh(mesh: Optional[Mesh]) -> None:
    """Register (or clear, with None) the mesh attention shards over."""
    global _TP_MESH
    _TP_MESH = mesh


def attention_tp_mesh() -> Optional[Mesh]:
    """The registered mesh when it has a real model axis; else the AMBIENT
    `with Mesh(...)` context mesh if that one has a model axis (covers
    standalone model applies outside a trainer, which never call
    set_tp_mesh — without this fallback they'd take the single-chip Pallas
    custom call and GSPMD would replicate it per model shard); else None."""
    if has_model_axis(_TP_MESH):
        return _TP_MESH
    try:
        from jax.interpreters.pxla import thread_resources
        ambient = thread_resources.env.physical_mesh
        if not ambient.empty and has_model_axis(ambient):
            return ambient
    except Exception:  # pragma: no cover
        pass
    return None


def _spec_for(path_keys, leaf, model_size: int) -> P:
    """PartitionSpec for one param leaf (see module docstring)."""
    keys = [str(k) for k in path_keys]
    name = keys[-2] if len(keys) >= 2 else ""
    kind = keys[-1]  # kernel | bias | scale | embedding ...
    in_mlp = "mlp" in keys

    def col():  # output features sharded
        if kind == "kernel" and leaf.ndim >= 2 \
                and leaf.shape[-1] % model_size == 0:
            return P(*([None] * (leaf.ndim - 1)), "model")
        if kind == "bias" and leaf.ndim == 1 \
                and leaf.shape[0] % model_size == 0:
            return P("model")
        return P()

    def row():  # input features sharded, bias replicated
        if kind == "kernel" and leaf.ndim >= 2 \
                and leaf.shape[0] % model_size == 0:
            return P("model", *([None] * (leaf.ndim - 1)))
        return P()

    if name in _COL_PARALLEL or (in_mlp and name == _MLP_COL):
        return col()
    if name in _ROW_PARALLEL or (in_mlp and name == _MLP_ROW):
        return row()
    return P()


def param_specs(params: Any, mesh: Mesh) -> Any:
    """Pytree of PartitionSpec matching `params` (replicated when no model
    axis or no rule applies).

    NOTE: PartitionSpec is a tuple subclass, i.e. itself a pytree — the
    returned tree is for inspection; internal placement uses
    `param_shardings` (NamedSharding leaves) to avoid tree_map descending
    into the specs."""
    if not has_model_axis(mesh):
        return jax.tree_util.tree_map(lambda _: P(), params)
    msize = mesh.shape["model"]
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _spec_for(
            [p.key for p in path if hasattr(p, "key")], leaf, msize),
        params)


def param_shardings(params: Any, mesh: Mesh) -> Any:
    """Pytree of NamedSharding (leaf objects) matching `params`."""
    msize = mesh.shape["model"] if has_model_axis(mesh) else 1
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(
            mesh,
            _spec_for([p.key for p in path if hasattr(p, "key")], leaf, msize)
            if msize > 1 else P()),
        params)


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Place `params` on the mesh according to the TP rules."""
    return jax.device_put(params, param_shardings(params, mesh))


def shard_train_state(state, mesh: Mesh):
    """Place a TrainState: params/ema/Adam moments with the TP specs (the
    moments are per-parameter, so they share the param layout), everything
    else replicated."""
    shardings = param_shardings(state.params, mesh)
    param_treedef = jax.tree_util.tree_structure(state.params)
    replicated = NamedSharding(mesh, P())

    def put(tree):
        return jax.device_put(tree, shardings)

    def put_opt(x):
        # optax ScaleByAdamState holds mu/nu pytrees mirroring params plus
        # scalar counts; anything shaped like the param tree gets the param
        # shardings, the rest replicates
        if jax.tree_util.tree_structure(x) == param_treedef:
            return put(x)
        return jax.tree_util.tree_map(
            lambda v: jax.device_put(v, replicated), x)

    opt_state = jax.tree_util.tree_map(
        put_opt, state.opt_state,
        is_leaf=lambda x: jax.tree_util.tree_structure(x) == param_treedef)
    return state.replace(
        params=put(state.params),
        ema_params=(put(state.ema_params)
                    if state.ema_params is not None else None),
        opt_state=opt_state,
        step=jax.device_put(state.step, replicated),
        batch_stats=(jax.tree_util.tree_map(
            lambda v: jax.device_put(v, replicated), state.batch_stats)
            if state.batch_stats is not None else None),
    )


def shard_replicated(tree: Any, mesh: Mesh) -> Any:
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding) if hasattr(x, "shape") else x,
        tree)


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> bool:
    """`jax.distributed.initialize()` when multi-host env/args are present.

    Reads JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID when
    args are omitted. Returns True if initialization happened. Safe no-op on
    single-host runs (the common case — TPU pods set the env automatically).
    """
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator is None and num_processes is None:
        return False
    kwargs = {}
    if coordinator is not None:
        kwargs["coordinator_address"] = coordinator
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "0")) or None
    if process_id is None:
        pid = os.environ.get("JAX_PROCESS_ID")
        process_id = int(pid) if pid is not None else None
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    return True
