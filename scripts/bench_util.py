"""Shared scaffolding for the train-step bench scripts.

Keeps the timing methodology in ONE place so bench_train_step.py (stage 2)
and bench_stage1_step.py (stage 1) cannot drift: config loading, the
compile-vs-steady timing pattern, and input sharding that mirrors the real
`trainer.update()` path (`shard_batch` over the trainer's mesh — feeding
unsharded host arrays to the jitted step on a multi-device mesh would time
a program the real hot loop never executes).
"""

from __future__ import annotations

import os
import time


def load_exp_cfg(exp: str, save_path: str):
    """Load an experiment dir's config.yaml with a scratch save_path."""
    import yaml

    from ldt_tpu.tools.io import dict2namespace

    with open(os.path.join(exp, "config.yaml")) as f:
        cfg = dict2namespace(yaml.safe_load(f))
    cfg.log.save_path = save_path
    os.makedirs(save_path, exist_ok=True)
    return cfg


def shard_inputs(trainer, *arrays):
    """Place bench inputs exactly like trainer.update() does."""
    from ldt_tpu.parallel.mesh import shard_batch

    return shard_batch(trainer.mesh, arrays)


def time_fn(fn, reps: int, label: str):
    """Print compile+first-run time, then the steady per-call mean (ms).

    `fn()` must return a jax array (or tree) to block on.
    """
    import jax

    t0 = time.perf_counter()
    out = jax.block_until_ready(fn())
    print(f"[{label}] compile+run: {time.perf_counter() - t0:.1f} s")
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"[{label}] steady: {ms:.1f} ms/call")
    return ms
