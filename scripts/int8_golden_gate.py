"""Golden-eval gate for the int8 serving path (ldt_tpu/serving/int8.py).

Samples the SAME noise through the bf16 sampler and the W8A8 int8 sampler
from a trained stage-2 checkpoint, scores both against the test references
with the CD metric family, and reports per-metric deltas. The int8 path is
cleared for a config when every gated metric agrees within 1% (the
BASELINE.md statistical-parity criterion applied to quantization).

Usage (TPU):
  env JAX_PLATFORMS="" python scripts/int8_golden_gate.py \
      --exp experiments/Latent_Diffusion_Trainer/airplane_synth_stability \
      [--epoch 700] [--num 256] [--steps 1000]

With `--completion` the gate runs the CONDITIONAL sampler instead
(ldt_tpu/serving/int8.py::denoise_cond_int8): the experiment dir must be a
ViPC completion run; gated metrics are the completion eval contract
(CD x 1000 + F1, completion_trainer/Latent_SDE_Trainer.py:196-199) plus an
informational direct bf16<->int8 paired CD on identical noise.

Writes docs-ready results to stdout; exit code 0 = gate passed.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp", required=True, help="experiment dir with "
                    "config.yaml + checkpt_{N}.msgpack")
    ap.add_argument("--epoch", type=int, default=None)
    ap.add_argument("--num", type=int, default=256)
    ap.add_argument("--steps", type=int, default=None,
                    help="override sde.sample_N")
    ap.add_argument("--predictor", type=str, default=None,
                    help="override sde.predictor (e.g. ddim for the "
                    "50-step fast-serving mode)")
    ap.add_argument("--threshold", type=float, default=0.01)
    ap.add_argument("--completion", action="store_true",
                    help="gate the CONDITIONAL (ViPC completion) int8 "
                    "sampler; --exp must be a completion run")
    ap.add_argument("--attn-int8", action="store_true",
                    help="also enable the int8 Pallas attention core "
                    "(LDT_ATTN_INT8) on the int8 leg — gates the full "
                    "int8-GEMM + int8-attention serving stack against "
                    "pure bf16")
    args = ap.parse_args()

    import yaml

    import jax
    import jax.numpy as jnp

    from ldt_tpu.eval import compute_CD_metrics
    from ldt_tpu.models import Compressor, Score
    from ldt_tpu.tools.io import dict2namespace
    from ldt_tpu.training.checkpoint import (
        checkpoint_path,
        load_checkpoint,
        resolve_checkpoint_epoch,
    )

    if args.completion:
        from ldt_tpu.data.vipc import get_data_loaders
        from ldt_tpu.training.completion_latent_sde_trainer import Trainer
    else:
        from ldt_tpu.data import get_data_loaders
        from ldt_tpu.training.latent_sde_trainer import Trainer

    with open(os.path.join(args.exp, "config.yaml")) as f:
        cfg = dict2namespace(yaml.safe_load(f))
    cfg.log.save_path = args.exp
    if args.steps:
        cfg.sde.sample_N = args.steps
    if args.predictor:
        cfg.sde.predictor = args.predictor

    epoch = resolve_checkpoint_epoch(args.exp, args.epoch)
    ckpt_path = checkpoint_path(args.exp, epoch)
    print(f"[gate] checkpoint: {ckpt_path}")

    trainer = Trainer(cfg, Score(cfg.score), Compressor(cfg.compressor),
                      rng=jax.random.key(0))

    if args.completion:
        from ldt_tpu.eval.loss import F1Score, L2_ChamferEval_1000
        from ldt_tpu.training.completion_compressor_trainer import fps_to

        loaders = get_data_loaders(cfg.data)
        trainer.maybe_init(next(iter(loaders["train_loader"])))
        trainer.resume(epoch=epoch, strict=False)
        # the gate IS the certification run: suppress the sample-time
        # stamp check for its own legs
        trainer._int8_gate_checked = (trainer._restored_ckpt,)

        batches, total = [], 0
        for data in loaders["test_loader"]:
            ref_pts = np.asarray(fps_to(data["pc"], 2048))
            cond = {"img": jnp.asarray(data["views"]),
                    "pts": fps_to(data["pc_part"], 2048)}
            batches.append((ref_pts, cond))
            total += ref_pts.shape[0]
            if total >= args.num:
                break
        ref = np.concatenate([b[0] for b in batches])[: args.num]
        num = ref.shape[0]
        print(f"[gate] completion: sampling {num} clouds x "
              f"{cfg.sde.sample_N} steps, bf16 vs int8 (same rng)")

        samples, results = {}, {}
        for mode in ("bf16", "int8"):
            os.environ["LDT_SERVE_INT8"] = "1" if mode == "int8" else "0"
            trainer._build_steps()
            trainer.rng = jax.random.key(1234)
            out = []
            for ref_pts, cond in batches:
                smp = trainer.sample(num_samples=ref_pts.shape[0],
                                     condition=cond)
                out.append(np.asarray(smp))
            smp = np.concatenate(out)[: args.num]
            samples[mode] = smp
            # steady-state rate: re-run the first batch with the jit warm
            # (the loop above paid the compile)
            import time as _time

            bs0 = batches[0][0].shape[0]
            t0 = _time.perf_counter()
            jax.block_until_ready(trainer.sample(num_samples=bs0,
                                                 condition=batches[0][1]))
            dt = _time.perf_counter() - t0
            print(f"[gate] {mode} steady-state: {bs0} clouds in {dt:.2f} s "
                  f"= {bs0 / dt * 60:.1f} clouds/min/chip")
            cd = float(L2_ChamferEval_1000(jnp.asarray(smp),
                                           jnp.asarray(ref)))
            f1, _, _ = F1Score(jnp.asarray(smp), jnp.asarray(ref))
            results[mode] = {"cd_x1000": cd, "f1score": float(jnp.mean(f1))}
            print(f"[gate] {mode}: {json.dumps(results[mode])}")
        pair_cd = float(L2_ChamferEval_1000(
            jnp.asarray(samples["int8"]), jnp.asarray(samples["bf16"])))
        print(f"[gate] direct int8<->bf16 paired CD x1000 on identical "
              f"noise (informational): {pair_cd:.6f}")
        gated = list(results["bf16"])
    else:
        loaders = get_data_loaders(cfg.data, dict2namespace(
            dict(eval_split="val")))
        trainer.maybe_init(next(iter(loaders["train_loader"])))
        trainer.resume(epoch=epoch, strict=False)
        # the gate IS the certification run: suppress the sample-time
        # stamp check for its own legs
        trainer._int8_gate_checked = (trainer._restored_ckpt,)

        refs = []
        for b in loaders["test_loader"]:
            refs.append(np.asarray(b["te_points"]))
        ref = np.concatenate(refs)[: args.num]
        num = ref.shape[0]
        print(f"[gate] sampling {num} clouds x {cfg.sde.sample_N} steps, "
              f"bf16 vs int8 (same rng)")

        results = {}
        for mode in ("bf16", "int8"):
            os.environ["LDT_SERVE_INT8"] = "1" if mode == "int8" else "0"
            if args.attn_int8:
                os.environ["LDT_ATTN_INT8"] = \
                    "1" if mode == "int8" else "0"
            # rebuild the jitted sampler so the env flags are re-read at
            # trace time
            trainer._build_steps()
            trainer.rng = jax.random.key(1234)
            out = []
            bs = cfg.data.test_batch_size
            for i in range(0, num, bs):
                n = min(bs, num - i)
                smp, _ = trainer.sample(num_samples=n)
                out.append(np.asarray(smp))
            smp = np.concatenate(out)
            res = compute_CD_metrics(smp, ref, batch_size=64)
            results[mode] = {k: float(v) for k, v in res.items()}
            print(f"[gate] {mode}: {json.dumps(results[mode])}")

        gated = [k for k in results["bf16"]
                 if "mmd" in k or "acc" in k.lower() or "cov" in k.lower()]
    failed = []
    print(f"{'metric':<24}{'bf16':>14}{'int8':>14}{'rel delta':>12}")
    for k in gated:
        a, b = results["bf16"][k], results["int8"][k]
        denom = max(abs(a), 1e-12)
        rel = abs(b - a) / denom
        # nan/inf (non-finite metrics, e.g. a broken probe config) must
        # fail the gate, not slip past a False `rel > threshold`
        ok = np.isfinite(rel) and rel <= args.threshold
        flag = "" if ok else "  <-- FAIL"
        print(f"{k:<24}{a:>14.6f}{b:>14.6f}{rel:>11.4%}{flag}")
        if not ok:
            failed.append(k)
    # record the verdict next to the checkpoint — the serving path checks
    # this stamp before running a checkpoint int8 (serving/int8.py)
    from ldt_tpu.serving.int8 import write_gate_stamp

    stamp = write_gate_stamp(ckpt_path, cfg, args.completion,
                             passed=not failed, results=results,
                             threshold=args.threshold)
    print(f"[gate] stamp written: {stamp}")
    if failed:
        print(f"[gate] FAILED: {failed}")
        return 1
    print(f"[gate] PASSED: all {len(gated)} metrics within "
          f"{args.threshold:.1%}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
