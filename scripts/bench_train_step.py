"""Time the stage-2 training pipeline (encode + score update) per dtype.

Measures the mixed-precision knob (`common.train_dtype`, tools/utils.py::
train_dtype): the stage-2 score update is f32-MXU-bound at default numerics
(docs/sampler_profile.md roofline — f32 matmuls run at ~1/4 the bf16 MXU
rate), so bf16 compute with f32 params should recover most of that.

Usage (TPU, one process at a time):
  env JAX_PLATFORMS="" python scripts/bench_train_step.py --dtype f32
  env JAX_PLATFORMS="" python scripts/bench_train_step.py --dtype bf16
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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
    import yaml

    import jax
    import jax.numpy as jnp

    from ldt_tpu.models import Compressor, Score
    from ldt_tpu.tools.io import dict2namespace
    from ldt_tpu.training.latent_sde_trainer import Trainer

    with open(os.path.join(args.exp, "config.yaml")) as f:
        cfg = dict2namespace(yaml.safe_load(f))
    cfg.log.save_path = "/tmp/ldt_bench_train"
    os.makedirs(cfg.log.save_path, exist_ok=True)
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
    t0 = time.perf_counter()
    trainer.maybe_init(batch)
    print(f"[{args.dtype}] init: {time.perf_counter() - t0:.1f} s")

    pts = jax.device_put(jnp.asarray(batch["tr_points"]))
    label = trainer._label_of(batch)  # None for single-category configs
    lr = trainer.current_lr()

    # --- encode (frozen compressor fwd) ---
    enc = lambda step: trainer._encode_at_step(  # noqa: E731
        trainer.comp_vars, pts, trainer._enc_base, step, label)
    t0 = time.perf_counter()
    eps = jax.block_until_ready(enc(0))
    print(f"[{args.dtype}] encode compile+run: {time.perf_counter() - t0:.1f} s")
    t0 = time.perf_counter()
    for i in range(1, args.reps + 1):
        eps = enc(i)
    jax.block_until_ready(eps)
    enc_ms = (time.perf_counter() - t0) / args.reps * 1e3
    eps = eps.astype(jnp.float32)

    # --- score update (fwd+bwd+Adam+EMA) ---
    t0 = time.perf_counter()
    state, loss = trainer._train_step(trainer.state, eps, label, lr,
                                      trainer._base_key)
    jax.block_until_ready(loss)
    print(f"[{args.dtype}] update compile+run: {time.perf_counter() - t0:.1f} s")
    t0 = time.perf_counter()
    for _ in range(args.reps):
        state, loss = trainer._train_step(state, eps, label, lr,
                                          trainer._base_key)
    jax.block_until_ready(loss)
    upd_ms = (time.perf_counter() - t0) / args.reps * 1e3
    rate = b / ((enc_ms + upd_ms) / 1e3)
    print(f"[{args.dtype}] encode {enc_ms:.1f} ms + update {upd_ms:.1f} ms "
          f"@ B={b} -> {rate:.0f} clouds/s through training "
          f"(loss={float(loss):.4f})")

    if args.profile:
        from profile_sampler import report_op_stats

        os.makedirs(args.profile, exist_ok=True)
        with jax.profiler.trace(args.profile):
            for _ in range(args.reps):
                state, loss = trainer._train_step(state, eps, label, lr,
                                                  trainer._base_key)
            jax.block_until_ready(loss)
        return report_op_stats(args.profile, 30)
    return 0


if __name__ == "__main__":
    sys.exit(main())
