"""Checkpoint save/load: msgpack manifests + raw-byte shards, streamed.

Mirrors the reference's torch.save dict contract (trainer/base.py:51-61):
one checkpoint per epoch `checkpt_{epoch}.msgpack` holding {cfg, state,
epoch, itr, time}; "latest epoch" resolution reads the last row of
`training.csv` (trainer/Compressor_Trainer.py:163-167).

Two on-disk formats, sniffed transparently at load:

  * small states (< `shard_threshold` bytes): ONE msgpack file, exactly the
    round-1 format — cheap, human-simple, test-friendly.
  * large states (the flagship stage-2 dual checkpoint is ~7.3 GB f32):
    `checkpt_{epoch}.msgpack` becomes a small manifest (leaf paths, dtypes,
    shapes, chunk offsets) and the tensor bytes land in N sibling
    `checkpt_{epoch}.msgpack.shardK` files written by a thread pool. Big
    leaves are NOT round-tripped through msgpack (which would buffer the
    whole 7.3 GB blob in Python before the first byte hits disk).

Transfer-volume optimizations for the flagship save:
  * `moments_bf16=True` casts Adam mu/nu to bfloat16 ON DEVICE (one jitted
    cast) before the device->host pull — the moments are half the dual
    checkpoint, so this halves their bytes through the transport. Restore
    recasts to the template dtype (`restore_into`); params/EMA stay f32
    bit-exact.
  * the whole tree is pulled with ONE `jax.device_get` (batched transfer)
    instead of a per-leaf `np.asarray` loop.
  * `async_write=True` runs the host-side serialization + file IO on a
    background thread so the training step path only pays the device->host
    transfer; `wait_pending_saves()` joins (called automatically before the
    next save and at interpreter exit).
"""

from __future__ import annotations

import atexit
import csv
import glob
import os
import re
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from ldt_tpu.tools.io import namespace2dict

_SHARD_FORMAT = "ldt-sharded-v1"
_DEFAULT_SHARD_THRESHOLD = 256 * 1024 * 1024  # single-file below this
_SHARD_TARGET_BYTES = 512 * 1024 * 1024       # per-chunk target
_MAX_SHARDS = 16

_pending_saves: list = []
_pending_lock = threading.Lock()


def wait_pending_saves() -> None:
    """Join any in-flight async checkpoint writes (re-raises their errors)."""
    with _pending_lock:
        pending, _pending_saves[:] = _pending_saves[:], []
    for t in pending:
        t.join()
        if getattr(t, "error", None) is not None:
            raise t.error


atexit.register(wait_pending_saves)


def _is_moment_path(path_keys) -> bool:
    return any(k in ("mu", "nu") for k in path_keys)


def _flatten_sd(sd, prefix=()):
    """Yield (path_tuple, leaf) for a nested state dict.

    EMPTY dicts are yielded as leaves: flax serializes stateless pytree nodes
    (e.g. optax `EmptyState` inside a `chain`) to `{}`, and dropping them
    would change the tuple arity `from_state_dict` checks on restore — a
    strict stage-2 resume would then fail at `opt_state` (caught by the CLI
    verify drive, round 2)."""
    if isinstance(sd, dict) and sd:
        for k, v in sd.items():
            yield from _flatten_sd(v, prefix + (str(k),))
    else:
        yield prefix, sd


def _unflatten_sd(items):
    items = list(items)
    if len(items) == 1 and not items[0][0]:
        return items[0][1]  # whole tree is a single (e.g. empty-dict) leaf
    root: Dict[str, Any] = {}
    for path, leaf in items:
        if not path:
            continue  # empty-root marker alongside real leaves (sharded load)
        node = root
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = leaf
    return root


@jax.jit
def _cast_moments_bf16(tree):
    # jitted so the cast happens on device, before the host pull
    return jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, tree)


def _gather_host_state(state_tree, moments_bf16: bool):
    """to_state_dict + optional on-device bf16 moment cast + ONE device_get."""
    sd = serialization.to_state_dict(state_tree)
    if moments_bf16:
        items = list(_flatten_sd(sd))
        moment_paths = [p for p, v in items if _is_moment_path(p)
                        and hasattr(v, "dtype") and v.dtype == jnp.float32]
        if moment_paths:
            moment_set = set(moment_paths)
            casted = _cast_moments_bf16(
                {"/".join(p): v for p, v in items if p in moment_set})
            sd = _unflatten_sd(
                [(p, casted["/".join(p)]) if p in moment_set else (p, v)
                 for p, v in items])
    return jax.device_get(sd)


def _write_file_atomic(path: str, write_fn) -> None:
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        write_fn(f)
    os.replace(tmp, path)


def _save_sharded(path: str, host_sd, meta: Dict[str, Any]) -> None:
    big, small = [], []
    for p, v in _flatten_sd(host_sd):
        # empty-dict leaves (stateless pytree nodes) and None (e.g. absent
        # batch_stats) ride the manifest as-is — msgpack encodes both natively
        if isinstance(v, dict) or v is None:
            small.append((p, v))
            continue
        v = np.asarray(v)
        (big if v.nbytes >= 1 << 20 else small).append((p, v))
    total = sum(v.nbytes for _, v in big)
    nshards = max(1, min(_MAX_SHARDS,
                         (total + _SHARD_TARGET_BYTES - 1)
                         // _SHARD_TARGET_BYTES))
    # greedy size-balanced assignment
    shard_bytes = [0] * nshards
    shard_items: list = [[] for _ in range(nshards)]
    for p, v in sorted(big, key=lambda kv: -kv[1].nbytes):
        i = min(range(nshards), key=lambda j: shard_bytes[j])
        shard_items[i].append((p, v))
        shard_bytes[i] += v.nbytes

    leaves = []
    for i, chunk in enumerate(shard_items):
        offset = 0
        for p, v in chunk:
            leaves.append({"path": list(p), "dtype": v.dtype.name,
                           "shape": list(v.shape), "shard": i,
                           "offset": offset, "nbytes": v.nbytes})
            offset += v.nbytes

    def write_shard(i):
        def write(f):
            for _, v in shard_items[i]:
                try:
                    f.write(np.ascontiguousarray(v).data)  # zero-copy
                except ValueError:
                    # bf16 etc. don't implement the buffer protocol
                    f.write(v.tobytes())
        _write_file_atomic(f"{path}.shard{i}", write)

    with ThreadPoolExecutor(max_workers=min(8, nshards)) as pool:
        list(pool.map(write_shard, range(nshards)))

    manifest = dict(meta)
    manifest.update({
        "format": _SHARD_FORMAT,
        "nshards": nshards,
        "leaves": leaves,
        # small leaves (scalars, counts, tiny tables) ride in the manifest
        "state": _unflatten_sd(small),
    })
    _write_file_atomic(path, lambda f: f.write(
        serialization.msgpack_serialize(manifest)))
    for j in range(nshards, _MAX_SHARDS):  # drop stale shards from prior save
        stale = f"{path}.shard{j}"
        if os.path.exists(stale):
            os.remove(stale)


def save_checkpoint(path: str, state_tree: Dict[str, Any], cfg=None,
                    epoch: int = 0, itr: int = 0, time: float = 0.0,
                    moments_bf16: bool = False, async_write: bool = False,
                    shard_threshold: int = _DEFAULT_SHARD_THRESHOLD) -> None:
    """Serialize {cfg, <state_tree>, epoch, itr, time} to `path`.

    See module docstring for the format selection and the flagship-scale
    optimizations (`moments_bf16`, `async_write`).
    """
    wait_pending_saves()  # never interleave two writes to the same tree
    host_sd = _gather_host_state(state_tree, moments_bf16)
    total = sum(np.asarray(v).nbytes for _, v in _flatten_sd(host_sd)
                if not isinstance(v, dict) and v is not None)
    meta = {
        "cfg": namespace2dict(cfg) if cfg is not None else {},
        "epoch": int(epoch),
        "itr": int(itr),
        "time": float(time),
    }

    def write():
        if total >= shard_threshold:
            _save_sharded(path, host_sd, meta)
        else:
            payload = dict(meta)
            payload["state"] = host_sd
            _write_file_atomic(path, lambda f: f.write(
                serialization.msgpack_serialize(payload)))

    if not async_write:
        write()
        return

    def run():
        try:
            write()
        except BaseException as e:  # surfaced by wait_pending_saves
            t.error = e

    t = threading.Thread(target=run, name=f"ckpt-write:{path}", daemon=False)
    t.error = None
    with _pending_lock:
        _pending_saves.append(t)
    t.start()


def _load_sharded(path: str, manifest: Dict[str, Any]) -> Dict[str, Any]:
    def read(i):
        with open(f"{path}.shard{i}", "rb") as f:
            return i, f.read()

    n = int(manifest["nshards"])
    # parallel reads: a single sequential read() walk measured 0.09 GB/s on
    # a cold page cache for the 5.5 GB flagship dual checkpoint
    with ThreadPoolExecutor(max_workers=min(8, max(n, 1))) as pool:
        shards = dict(pool.map(read, range(n)))
    items = list(_flatten_sd(manifest.get("state", {})))
    for leaf in manifest["leaves"]:
        dtype = (np.dtype(jnp.bfloat16) if leaf["dtype"] == "bfloat16"
                 else np.dtype(leaf["dtype"]))
        buf = shards[int(leaf["shard"])]
        o, n = int(leaf["offset"]), int(leaf["nbytes"])
        arr = np.frombuffer(buf, dtype=dtype, count=n // dtype.itemsize,
                            offset=o).reshape(leaf["shape"])
        items.append((tuple(leaf["path"]), arr))
    return _unflatten_sd(items)


def load_checkpoint(path: str) -> Dict[str, Any]:
    """Load either format; returns {cfg, state, epoch, itr, time}."""
    wait_pending_saves()
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    if isinstance(payload, dict) and payload.get("format") == _SHARD_FORMAT:
        state = _load_sharded(path, payload)
        return {"cfg": payload.get("cfg", {}), "state": state,
                "epoch": payload["epoch"], "itr": payload["itr"],
                "time": payload["time"]}
    return payload


def _merge_non_strict(template_sd, loaded):
    """Overlay `loaded` onto the template state dict: keys present in both
    are taken from `loaded`, keys missing from `loaded` keep the template
    value, extra keys in `loaded` are dropped (torch `strict=False`
    semantics, trainer/Latent_SDE_Trainer.py:249)."""
    if isinstance(template_sd, dict):
        if not isinstance(loaded, dict):
            return loaded
        return {k: (_merge_non_strict(v, loaded[k]) if k in loaded else v)
                for k, v in template_sd.items()}
    return loaded


def _check_no_unexpected(template_sd, loaded, prefix=""):
    if isinstance(template_sd, dict) and isinstance(loaded, dict):
        extra = set(loaded) - set(template_sd)
        if extra:
            raise ValueError(
                f"unexpected checkpoint key(s) at '{prefix or '/'}': "
                f"{sorted(extra)} (pass strict=False to ignore)")
        for k, v in template_sd.items():
            if k in loaded:
                _check_no_unexpected(v, loaded[k], f"{prefix}/{k}")


def restore_into(template, loaded, strict: bool = True):
    """Shape a loaded raw dict back into the structure of `template`.

    strict=True: exact structural match required (flax from_state_dict).
    strict=False: missing keys keep the template's values and unexpected
    keys are ignored — the reference's `load_state_dict(..., strict)` knob
    (trainer/Latent_SDE_Trainer.py:249).

    Loaded leaves are cast back to the template leaf dtype when they differ
    (checkpoints may store Adam moments in bf16 — see `save_checkpoint`).
    """
    if strict:
        _check_no_unexpected(serialization.to_state_dict(template), loaded)
    else:
        loaded = _merge_non_strict(serialization.to_state_dict(template),
                                   loaded)
    restored = serialization.from_state_dict(template, loaded)

    # Leaves allowed to broadcast across a shape drift. ONLY the ActNorm
    # statistics: pre-round-3 checkpoints stored pooled [1, 1, F]
    # shift/log_scale where the model now has per-token [1, z_scales, F]
    # (PARITY.md quirk #5) — broadcasting preserves the math bit-for-bit.
    # Everything else must match exactly: a silently tiled weight from a
    # wrong-config checkpoint would train from wrong values.
    _BROADCAST_OK = ("shift", "log_scale")

    def recast(path, t, r):
        if hasattr(t, "dtype") and hasattr(r, "dtype") and t.dtype != r.dtype:
            r = np.asarray(r).astype(t.dtype)
        if (hasattr(t, "shape") and hasattr(r, "shape")
                and tuple(t.shape) != tuple(r.shape)):
            leaf = next((p.key for p in reversed(path)
                         if hasattr(p, "key")), "")
            if leaf in _BROADCAST_OK:
                try:
                    return np.broadcast_to(np.asarray(r), t.shape).copy()
                except ValueError:
                    pass
            raise ValueError(
                f"checkpoint leaf {leaf!r} has shape {tuple(r.shape)}, "
                f"model expects {tuple(t.shape)}")
        return r

    return jax.tree_util.tree_map_with_path(recast, template, restored)


def latest_epoch_from_csv(save_path: str) -> Optional[int]:
    """Last `epoch` value in training.csv (trainer/Compressor_Trainer.py:163-167)."""
    csv_path = os.path.join(save_path, "training.csv")
    if not os.path.exists(csv_path):
        return None
    last = None
    with open(csv_path, newline="") as f:
        for row in csv.DictReader(f):
            last = row
    if last is None or "epoch" not in last:
        return None
    return int(float(last["epoch"]))


def checkpoint_path(save_path: str, epoch: int) -> str:
    return os.path.join(save_path, f"checkpt_{epoch}.msgpack")


def resolve_checkpoint_epoch(save_path: str,
                             epoch: Optional[int] = None) -> int:
    """Resolve which checkpoint epoch to load under `save_path`.

    An explicitly requested `epoch` must exist (never silently substitute a
    different checkpoint). Otherwise use training.csv's last epoch, falling
    back to the newest on-disk `checkpt_*.msgpack` when the CSV ran past the
    last save (save_epoch_freq > 1) or is absent. Raises FileNotFoundError
    when nothing is loadable.
    """
    if epoch is not None:
        if not os.path.exists(checkpoint_path(save_path, epoch)):
            raise FileNotFoundError(
                f"no checkpoint for epoch {epoch} under {save_path}")
        return epoch
    epoch = latest_epoch_from_csv(save_path)
    if epoch is not None and os.path.exists(checkpoint_path(save_path,
                                                            epoch)):
        return epoch
    found = sorted(
        int(m.group(1)) for f in glob.glob(
            os.path.join(save_path, "checkpt_*.msgpack"))
        if (m := re.search(r"checkpt_(\d+)\.msgpack$", f)))
    if not found:
        raise FileNotFoundError(f"no checkpoints under {save_path}")
    return found[-1]
