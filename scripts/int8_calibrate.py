"""Calibrate STATIC per-step activation scales for int8 serving
(LDT_INT8_STATIC — ldt_tpu/serving/int8.py::calibrate_act_scales).

Runs ONE full ancestral reverse scan with the dynamic-int8 sampler from a
trained stage-2 checkpoint (EMA params, like valsample serving), recording
each quantized GEMM input's amax per step, and writes the resulting
[sample_N, num_blocks, 4] scale table to `<ckpt>.int8_act_scales.npz`.
Serving with LDT_SERVE_INT8=1 LDT_INT8_STATIC=1 then replaces the
per-token amax reduce in the sampling scan with these per-step scalars —
re-gate with scripts/int8_golden_gate.py under the SAME env (the stamp
signature records static_act).

Usage (TPU):
  env JAX_PLATFORMS="" python scripts/int8_calibrate.py \
      --exp experiments/Latent_Diffusion_Trainer/<ds> [--epoch N]
      [--batch 64] [--margin 1.0]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp", required=True)
    ap.add_argument("--epoch", type=int, default=None)
    ap.add_argument("--batch", type=int, default=64,
                    help="calibration batch (amax is max-reduced over it)")
    ap.add_argument("--margin", type=float, default=1.0,
                    help="scale multiplier headroom for runtime "
                    "distributions exceeding the calibration batch")
    args = ap.parse_args()

    import yaml

    import jax
    import jax.numpy as jnp

    from ldt_tpu.diffusion import make_diffusion
    from ldt_tpu.models import Score
    from ldt_tpu.serving.int8 import (
        calibrate_act_scales,
        quantize_score_params,
        save_act_scales,
    )
    from ldt_tpu.tools.io import dict2namespace
    from ldt_tpu.tools.utils import enable_compile_cache
    from ldt_tpu.training.checkpoint import (
        checkpoint_path,
        load_checkpoint,
        resolve_checkpoint_epoch,
    )

    enable_compile_cache()
    with open(os.path.join(args.exp, "config.yaml")) as f:
        cfg = dict2namespace(yaml.safe_load(f))
    if cfg.sde.predictor != "ancestral" or cfg.sde.sample_mode == "continuous":
        raise SystemExit("[calibrate] static int8 scales are "
                         "ancestral/discrete-only (the certified int8 "
                         f"regime); config has predictor={cfg.sde.predictor}"
                         f" sample_mode={cfg.sde.sample_mode}")

    epoch = resolve_checkpoint_epoch(args.exp, args.epoch)
    ckpt_path = checkpoint_path(args.exp, epoch)
    print(f"[calibrate] checkpoint: {ckpt_path}")
    sc = load_checkpoint(ckpt_path)["state"]["score"]
    params = sc.get("ema_params") or sc["params"]
    params = jax.device_put(jax.tree_util.tree_map(jnp.asarray, params))

    on_tpu = jax.default_backend() == "tpu"
    score = Score(cfg.score, dtype=jnp.bfloat16, fused_attention=on_tpu)
    sde = make_diffusion(cfg.sde)
    N = int(cfg.sde.sample_N)

    @jax.jit
    def calib(p, rng):
        schedule = jnp.linspace(1.0, float(cfg.sde.sample_time_eps), N)
        mods = score.apply({"params": p}, schedule,
                           method=Score.precompute_mods)
        qp = quantize_score_params(p, cfg.score.num_blocks)
        scales, x_mean = calibrate_act_scales(
            sde, mods, qp, cfg.score.num_heads, rng, args.batch,
            (cfg.score.z_scale, cfg.score.z_dim), N,
            time_eps=float(cfg.sde.sample_time_eps), interpret=not on_tpu)
        return scales, x_mean

    t0 = time.perf_counter()
    scales, x_mean = calib(params, jax.random.key(7))
    scales = np.asarray(scales) * args.margin
    print(f"[calibrate] {N}-step recording scan: "
          f"{time.perf_counter() - t0:.1f} s; latent amax "
          f"{float(np.abs(np.asarray(x_mean)).max()):.3f}")

    # save_act_scales binds the table to the checkpoint fingerprint + the
    # bf16_tail scheme active NOW; load_act_scales refuses on mismatch
    out = save_act_scales(
        ckpt_path, scales, sample_N=N,
        num_blocks=int(cfg.score.num_blocks), batch=args.batch,
        margin=args.margin, epoch=epoch,
        predictor=str(cfg.sde.predictor),
        sample_time_eps=float(cfg.sde.sample_time_eps))
    print(f"[calibrate] wrote {out} (shape {scales.shape}, "
          f"scale range [{scales.min():.2e}, {scales.max():.2e}])")


if __name__ == "__main__":
    main()
