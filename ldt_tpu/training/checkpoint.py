"""Checkpoint save/load: single-file msgpack pytrees.

Mirrors the reference's torch.save dict contract (trainer/base.py:51-61):
one file per epoch `checkpt_{epoch}.msgpack` holding {cfg, state, epoch, itr,
time}; "latest epoch" resolution reads the last row of `training.csv`
(trainer/Compressor_Trainer.py:163-167).
"""

from __future__ import annotations

import csv
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization

from ldt_tpu.tools.io import namespace2dict


def _to_host(tree):
    return jax.tree_util.tree_map(np.asarray, tree)


def save_checkpoint(path: str, state_tree: Dict[str, Any], cfg=None,
                    epoch: int = 0, itr: int = 0, time: float = 0.0) -> None:
    """Serialize {cfg, <state_tree>, epoch, itr, time} to `path`."""
    payload = {
        "cfg": namespace2dict(cfg) if cfg is not None else {},
        "state": _to_host(serialization.to_state_dict(state_tree)),
        "epoch": int(epoch),
        "itr": int(itr),
        "time": float(time),
    }
    blob = serialization.msgpack_serialize(payload)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def restore_into(template, loaded):
    """Shape a loaded raw dict back into the structure of `template`
    (flax.serialization.from_state_dict)."""
    return serialization.from_state_dict(template, loaded)


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
