"""End-to-end `compute_all_metrics` wall-clock on device.

The eval wall (VERDICT r3 weak #1) end to end: three pairwise CD+EMD
matrices (ref x smp, ref x ref, smp x smp) + MMD/COV/1-NNA reductions,
at real shapes (2048-point clouds). Round-4c flipped the eval tiles to
the Pallas CD + streaming Pallas EMD kernels by default
(docs/sampler_profile.md "Round-4 closeout"); this script gives the
defaults-vs-XLA wall-clock at a chosen cloud count.

Usage (TPU):
  env JAX_PLATFORMS= python scripts/bench_full_eval.py --num 256
  env JAX_PLATFORMS= LDT_EVAL_CD_PALLAS=0 LDT_EVAL_EMD_PALLAS=0 \
      python scripts/bench_full_eval.py --num 256   # XLA control
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_split(data_dir: str, split: str, num: int, points: int):
    import numpy as np

    d = os.path.join(data_dir, "02691156", split)
    files = sorted(os.listdir(d))[:num]
    if len(files) < num:
        raise SystemExit(f"need {num} clouds in {d}, found {len(files)}")
    rng = np.random.RandomState(38383)
    out = []
    for f in files:
        pc = np.load(os.path.join(d, f))
        idx = rng.choice(pc.shape[0], points, replace=False)
        out.append(pc[idx])
    arr = np.stack(out).astype(np.float32)
    # per-cloud center/scale like the loader's boundary normalization
    arr -= arr.mean(axis=1, keepdims=True)
    arr /= np.abs(arr).max(axis=(1, 2), keepdims=True)
    return arr


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num", type=int, default=256)
    ap.add_argument("--points", type=int, default=2048)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--data", default="data/ShapeNetCore.v2.PC15k")
    ap.add_argument("--cd-only", action="store_true",
                    help="time the CD-only val_sample path "
                    "(compute_CD_metrics) with its symmetric-tile rr/ss "
                    "matrices vs a full-matrix control")
    args = ap.parse_args()

    from ldt_tpu.eval.metrics import compute_all_metrics

    smp = load_split(args.data, "val", args.num, args.points)
    ref = load_split(args.data, "test", args.num, args.points)

    if args.cd_only:
        from ldt_tpu.eval.metrics import compute_CD_metrics, knn, \
            lgan_mmd_cov, pairwise_CD

        # warm the tile jits once so both timings are compile-free
        compute_CD_metrics(smp[:args.batch], ref[:args.batch], args.batch,
                           verbose=False)
        t0 = time.perf_counter()
        res_sym = compute_CD_metrics(smp, ref, args.batch, verbose=False)
        dt_sym = time.perf_counter() - t0
        t0 = time.perf_counter()
        m_rs = pairwise_CD(ref, smp, args.batch)
        full = {f"{k}-CD": v for k, v in lgan_mmd_cov(m_rs.T).items()}
        m_rr = pairwise_CD(ref, ref, args.batch)
        m_ss = pairwise_CD(smp, smp, args.batch)
        full.update({f"1-NN-CD-{k}": v for k, v in
                     knn(m_rr, m_rs, m_ss, 1, sqrt=False).items()
                     if "acc" in k})
        dt_full = time.perf_counter() - t0
        print(f"[cd-eval] {args.num} clouds x {args.points} pts: "
              f"symmetric {dt_sym:.1f} s vs full {dt_full:.1f} s "
              f"({dt_full / dt_sym:.2f}x)")
        for k in ("mmd-CD", "cov-CD", "1-NN-CD-acc"):
            print(f"  {k}: sym {res_sym[k]:.8f} full {full[k]:.8f}")
        return
    mode = "cd={} emd={}".format(
        "pallas" if os.environ.get("LDT_EVAL_CD_PALLAS", "1") == "1"
        else "xla",
        "pallas" if os.environ.get("LDT_EVAL_EMD_PALLAS", "1") == "1"
        else "xla")
    t0 = time.perf_counter()
    res = compute_all_metrics(smp, ref, args.batch, verbose=False)
    dt = time.perf_counter() - t0
    print(f"[full-eval] {mode}: {args.num} clouds x {args.points} pts, "
          f"batch {args.batch}: compute_all_metrics {dt:.1f} s "
          f"({3 * args.num * args.num / dt:.0f} pairs/s effective)")
    for k in ("mmd-CD", "cov-CD", "1-NN-CD-acc", "mmd-EMD", "1-NN-EMD-acc"):
        print(f"  {k} = {res[k]:.8f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
