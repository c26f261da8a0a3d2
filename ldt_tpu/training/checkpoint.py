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

    def recast(t, r):
        if hasattr(t, "dtype") and hasattr(r, "dtype") and t.dtype != r.dtype:
            return np.asarray(r).astype(t.dtype)
        return r

    return jax.tree_util.tree_map(recast, template, restored)


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
