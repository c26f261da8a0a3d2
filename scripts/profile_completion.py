"""Device profile of the CONDITIONAL (ViPC completion) sampler step.

Builds the completion trainer from an experiment dir (same preamble as
scripts/int8_golden_gate.py --completion), warms one `trainer.sample` call,
then traces a second and prints per-op device self-times via
scripts/profile_sampler.py::report_op_stats.

Usage (TPU):
  env JAX_PLATFORMS="" [LDT_SERVE_INT8=0|1] python scripts/profile_completion.py \
      --exp experiments/Latent_Diffusion_Trainer/completion/plane_synth_smoke \
      [--epoch 200] [--steps 100]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

from profile_sampler import report_op_stats  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp", required=True)
    ap.add_argument("--epoch", type=int, default=None)
    ap.add_argument("--steps", type=int, default=None,
                    help="override sde.sample_N (default: config value)")
    ap.add_argument("--out", default="/tmp/ldt_prof_completion")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    import time

    import numpy as np  # noqa: F401
    import yaml

    import jax

    from ldt_tpu.data.vipc import get_data_loaders
    from ldt_tpu.models import Compressor, Score
    from ldt_tpu.tools.io import dict2namespace
    from ldt_tpu.training.checkpoint import resolve_checkpoint_epoch
    from ldt_tpu.training.completion_compressor_trainer import fps_to
    from ldt_tpu.training.completion_latent_sde_trainer import Trainer

    with open(os.path.join(args.exp, "config.yaml")) as f:
        cfg = dict2namespace(yaml.safe_load(f))
    cfg.log.save_path = args.exp
    if args.steps:
        cfg.sde.sample_N = args.steps

    epoch = resolve_checkpoint_epoch(args.exp, args.epoch)
    print(f"[profile] checkpoint epoch {epoch}, "
          f"int8={os.environ.get('LDT_SERVE_INT8', '0')}, "
          f"steps={cfg.sde.sample_N}")

    import jax.numpy as jnp

    trainer = Trainer(cfg, Score(cfg.score), Compressor(cfg.compressor),
                      rng=jax.random.key(0))
    loaders = get_data_loaders(cfg.data)
    trainer.maybe_init(next(iter(loaders["train_loader"])))
    trainer.resume(epoch=epoch, strict=False)

    data = next(iter(loaders["test_loader"]))
    cond = {"img": jnp.asarray(data["views"]),
            "pts": fps_to(data["pc_part"], 2048)}
    n = int(np.asarray(data["pc"]).shape[0])

    # warm (compile)
    jax.block_until_ready(trainer.sample(num_samples=n, condition=cond))
    t0 = time.perf_counter()
    jax.block_until_ready(trainer.sample(num_samples=n, condition=cond))
    dt = time.perf_counter() - t0
    print(f"[profile] steady-state: {n} clouds x {cfg.sde.sample_N} steps "
          f"in {dt:.2f} s = {n / dt * 60:.1f} clouds/min "
          f"({dt / cfg.sde.sample_N * 1e3:.2f} ms/step wall)")

    os.makedirs(args.out, exist_ok=True)
    with jax.profiler.trace(args.out):
        jax.block_until_ready(trainer.sample(num_samples=n, condition=cond))
    return report_op_stats(args.out, args.top)


if __name__ == "__main__":
    sys.exit(main())
