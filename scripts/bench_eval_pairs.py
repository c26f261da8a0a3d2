"""Time the eval pairwise metric tiles (CD-only and CD+EMD) on device.

The eval wall (VERDICT r3 weak #1): CD+EMD pairwise ran ~550 pairs/s on
v5e, making full `compute_all_metrics` over 405 clouds ~15 min. Round-4
restructures the approx-match EMD to cost-only matvec accumulation
(ldt_tpu/ops/emd.py::_approx_match_cost_single) — this script measures the
pair rates before/after style (run on any commit).

Usage (TPU): env JAX_PLATFORMS= python scripts/bench_eval_pairs.py
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num", type=int, default=64,
                    help="clouds per side (num^2 pairs)")
    ap.add_argument("--points", type=int, default=2048)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--emd-only", action="store_true",
                    help="skip the CD-only row (it does not depend on the "
                         "EMD kernel variant under test)")
    args = ap.parse_args()

    import numpy as np

    import jax

    from ldt_tpu.eval.metrics import pairwise_CD, pairwise_EMD_CD

    rng = np.random.RandomState(0)
    a = rng.randn(args.num, args.points, 3).astype(np.float32)
    a /= np.linalg.norm(a, axis=-1, keepdims=True)
    b = rng.randn(args.num, args.points, 3).astype(np.float32)
    b /= np.linalg.norm(b, axis=-1, keepdims=True)
    pairs = args.num * args.num

    rows = [("CD", lambda: pairwise_CD(a, b, args.batch)),
            ("CD+EMD", lambda: pairwise_EMD_CD(a, b, args.batch))]
    if args.emd_only:
        rows = rows[1:]
    for name, fn in rows:
        out = fn()
        jax.block_until_ready(jax.tree_util.tree_leaves(out))
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = fn()
            jax.block_until_ready(jax.tree_util.tree_leaves(out))
        dt = (time.perf_counter() - t0) / args.reps
        print(f"[eval-pairs] {name}: {pairs} pairs in {dt:.2f} s = "
              f"{pairs / dt:.0f} pairs/s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
