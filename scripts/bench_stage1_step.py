"""Time + profile the stage-1 (Compressor VAE) training step.

The whole update (fwd incl. FPS/kNN grouping, CD + auction-EMD losses,
backward, clip, Adam) is ONE jitted XLA program
(compressor_trainer.py::train_step; reference hot path
trainer/Compressor_Trainer.py:29-52). Round-2 measured ~108 ms blocked @
B=16 after the auction-EMD top-k fix; this script gives the pipelined
steady-state rate and (with --profile) the per-op device self-times, so the
remaining wall (EMD anneal levels? chamfer? attention bwd?) is attributable.

Usage (TPU, one process at a time):
  env JAX_PLATFORMS="" python scripts/bench_stage1_step.py
  env JAX_PLATFORMS="" python scripts/bench_stage1_step.py --profile /tmp/s1
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp",
                    default="experiments/Compressor_Trainer/"
                            "airplane_synth_stability")
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--batch", type=int, default=None,
                    help="override data.batch_size (flagship default 16)")
    ap.add_argument("--profile", default=None,
                    help="trace dir: profile the steady update loop and "
                         "print per-op device self-times")
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    import numpy as np
    import yaml

    import jax
    import jax.numpy as jnp

    from ldt_tpu.models import Compressor
    from ldt_tpu.tools.io import dict2namespace
    from ldt_tpu.training.compressor_trainer import Trainer

    with open(os.path.join(args.exp, "config.yaml")) as f:
        cfg = dict2namespace(yaml.safe_load(f))
    cfg.log.save_path = "/tmp/ldt_bench_stage1"
    os.makedirs(cfg.log.save_path, exist_ok=True)
    if args.batch:
        cfg.data.batch_size = args.batch

    b = cfg.data.batch_size
    n = cfg.data.tr_max_sample_points
    rng = np.random.RandomState(0)
    batch = {"tr_points": rng.randn(b, n, 3).astype(np.float32),
             "cate_idx": np.zeros((b,), np.int32)}

    trainer = Trainer(cfg, model=Compressor(cfg.model),
                      rng=jax.random.key(0))
    t0 = time.perf_counter()
    trainer.maybe_init(batch)
    print(f"[stage1] init: {time.perf_counter() - t0:.1f} s")

    pts = jax.device_put(jnp.asarray(batch["tr_points"]))
    label = trainer._label_of(batch)
    lr = trainer.current_lr()

    t0 = time.perf_counter()
    state, *meters = trainer._train_step(trainer.state, pts, label, lr,
                                         trainer._base_key)
    jax.block_until_ready(meters[0])
    print(f"[stage1] step compile+run: {time.perf_counter() - t0:.1f} s")

    t0 = time.perf_counter()
    for _ in range(args.reps):
        state, *meters = trainer._train_step(state, pts, label, lr,
                                             trainer._base_key)
    jax.block_until_ready(meters[0])
    ms = (time.perf_counter() - t0) / args.reps * 1e3
    print(f"[stage1] update {ms:.1f} ms @ B={b} -> {b / ms * 1e3:.0f} "
          f"clouds/s through training (loss={float(meters[0]):.4f})")

    if args.profile:
        from profile_sampler import report_op_stats

        os.makedirs(args.profile, exist_ok=True)
        with jax.profiler.trace(args.profile):
            for _ in range(args.reps):
                state, *meters = trainer._train_step(state, pts, label, lr,
                                                     trainer._base_key)
            jax.block_until_ready(meters[0])
        return report_op_stats(args.profile, args.top)
    return 0


if __name__ == "__main__":
    sys.exit(main())
