"""Time the stage-2 training pipeline (encode + score update) per dtype.

Measures the mixed-precision knobs: `common.train_dtype`
(tools/utils.py::train_dtype — bf16 compute with f32 params) and
`opt.moment_dtype` (state.py::scale_by_adam_q — bf16 Adam-moment STORAGE,
halving the dominant optimizer-state HBM traffic of the flagship update).

Usage (TPU, one process at a time):
  env JAX_PLATFORMS="" python scripts/bench_train_step.py --dtype f32
  env JAX_PLATFORMS="" python scripts/bench_train_step.py --moments bf16
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
    ap.add_argument("--dtype", choices=["f32", "bf16"], default="f32")
    ap.add_argument("--exp",
                    default="experiments/Latent_Diffusion_Trainer/"
                            "airplane_synth_stability")
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--profile", default=None,
                    help="trace dir: profile the steady update loop and "
                         "print per-op device self-times")
    ap.add_argument("--moments", choices=["f32", "bf16"], default="f32",
                    help="Adam moment STORAGE precision "
                         "(opt.moment_dtype, state.py::scale_by_adam_q)")
    args = ap.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp

    from bench_util import load_exp_cfg, shard_inputs, time_fn
    from ldt_tpu.models import Compressor, Score
    from ldt_tpu.training.latent_sde_trainer import Trainer

    cfg = load_exp_cfg(args.exp, "/tmp/ldt_bench_train")
    cfg.common.train_dtype = {"f32": "float32", "bf16": "bfloat16"}[args.dtype]
    cfg.opt.moment_dtype = {"f32": "float32", "bf16": "bfloat16"}[args.moments]

    dt = jnp.float32 if args.dtype == "f32" else jnp.bfloat16
    b = cfg.data.batch_size
    n = cfg.data.tr_max_sample_points
    rng = np.random.RandomState(0)
    batch = {"tr_points": rng.randn(b, n, 3).astype(np.float32),
             "cate_idx": np.zeros((b,), np.int32)}

    trainer = Trainer(cfg, model=Score(cfg.score, dtype=dt),
                      compressor=Compressor(cfg.compressor, dtype=dt),
                      rng=jax.random.key(0))
    tag = f"{args.dtype}/m{args.moments}"
    t0 = time.perf_counter()
    trainer.maybe_init(batch)
    print(f"[{tag}] init: {time.perf_counter() - t0:.1f} s")

    # shard exactly like trainer.update() does
    pts, label = shard_inputs(trainer, jnp.asarray(batch["tr_points"]),
                              trainer._label_of(batch))
    lr = trainer.current_lr()

    # --- encode (frozen compressor fwd) ---
    carry = {"i": 0}

    def enc():
        carry["i"] += 1
        return trainer._encode_at_step(trainer.comp_vars, pts,
                                       trainer._enc_base, carry["i"], label)

    enc_ms = time_fn(enc, args.reps, f"{tag} encode")
    eps = jax.block_until_ready(enc()).astype(jnp.float32)

    # --- score update (fwd+bwd+Adam+EMA) ---
    st = {"state": trainer.state, "loss": None}

    def step():
        st["state"], st["loss"] = trainer._train_step(
            st["state"], eps, label, lr, trainer._base_key)
        return st["loss"]

    upd_ms = time_fn(step, args.reps, f"{tag} update")
    rate = b / ((enc_ms + upd_ms) / 1e3)
    print(f"[{tag}] encode {enc_ms:.1f} ms + update {upd_ms:.1f} ms "
          f"@ B={b} -> {rate:.0f} clouds/s through training "
          f"(loss={float(st['loss']):.4f})")

    if args.profile:
        from profile_sampler import report_op_stats

        os.makedirs(args.profile, exist_ok=True)
        with jax.profiler.trace(args.profile):
            loss = None
            for _ in range(args.reps):
                loss = step()
            jax.block_until_ready(loss)
        return report_op_stats(args.profile, 30)
    return 0


if __name__ == "__main__":
    sys.exit(main())
