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
    ap.add_argument("--restore", type=int, default=None,
                    help="resume the trainer from this checkpoint epoch so "
                         "the step runs in the TRAINED regime (the auction-"
                         "EMD compact phase only engages when recon is "
                         "close to target — random-init measurements stay "
                         "in the dense phase)")
    ap.add_argument("--real", action="store_true",
                    help="use a real batch from the experiment's dataset "
                         "instead of rng.randn clouds")
    args = ap.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp

    from bench_util import load_exp_cfg, shard_inputs, time_fn
    from ldt_tpu.models import Compressor
    from ldt_tpu.training.compressor_trainer import Trainer

    cfg = load_exp_cfg(args.exp, "/tmp/ldt_bench_stage1")
    if args.batch:
        cfg.data.batch_size = args.batch

    b = cfg.data.batch_size
    n = cfg.data.tr_max_sample_points
    rng = np.random.RandomState(0)
    if args.real:
        from ldt_tpu.data import get_data_loaders
        from ldt_tpu.tools.io import dict2namespace

        loaders = get_data_loaders(cfg.data,
                                   dict2namespace(dict(eval_split="val")))
        data = next(iter(loaders["train_loader"]))
        batch = {"tr_points": np.asarray(data["tr_points"])[:b],
                 "cate_idx": np.asarray(data["cate_idx"])[:b]}
        print(f"[stage1] real batch from {cfg.data.data_dir}")
    else:
        batch = {"tr_points": rng.randn(b, n, 3).astype(np.float32),
                 "cate_idx": np.zeros((b,), np.int32)}

    trainer = Trainer(cfg, model=Compressor(cfg.model),
                      rng=jax.random.key(0))
    t0 = time.perf_counter()
    trainer.maybe_init(batch)
    print(f"[stage1] init: {time.perf_counter() - t0:.1f} s")
    if args.restore is not None:
        cfg.log.save_path = args.exp
        trainer.resume(epoch=args.restore, finetune=False, strict=True,
                       load_optim=True)
        print(f"[stage1] restored epoch {args.restore}")

    # shard exactly like trainer.update() (compressor_trainer.py:146-150)
    pts, label = shard_inputs(trainer, jnp.asarray(batch["tr_points"]),
                              trainer._label_of(batch))
    lr = trainer.current_lr()

    carry = {"state": trainer.state}

    def step():
        carry["state"], loss, *_ = trainer._train_step(
            carry["state"], pts, label, lr, trainer._base_key)
        return loss

    ms = time_fn(step, args.reps, "stage1 update")
    print(f"[stage1] update {ms:.1f} ms @ B={b} -> {b / ms * 1e3:.0f} "
          f"clouds/s through training")

    if args.profile:
        from profile_sampler import report_op_stats

        os.makedirs(args.profile, exist_ok=True)
        with jax.profiler.trace(args.profile):
            loss = None
            for _ in range(args.reps):
                loss = step()
            jax.block_until_ready(loss)
        return report_op_stats(args.profile, args.top)
    return 0


if __name__ == "__main__":
    sys.exit(main())
