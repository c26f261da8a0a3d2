"""Summarize a long-horizon stability run's CSVs into a markdown report.

Reads training.csv / eval.csv from one or two experiment dirs (stage 1 and
stage 2) and prints trajectory summaries: loss quartiles per phase of the
run, max-activation envelope vs the 10000 watchdog threshold, LR-schedule
checkpoints, metric trajectories, and a PASS/FAIL verdict on the stability
criteria (finite everywhere, no watchdog trips, late-phase loss no worse
than mid-phase).
"""

from __future__ import annotations

import argparse
import csv
import os

import numpy as np


def read_csv(path):
    if not os.path.exists(path):
        return None
    with open(path, newline="") as f:
        rows = list(csv.DictReader(f))
    if not rows:
        return None
    out = {}
    for k in rows[0]:
        try:
            out[k] = np.array([float(r[k]) for r in rows])
        except (TypeError, ValueError):
            pass
    return out


def phase_stats(x, name):
    n = len(x)
    thirds = [x[: n // 3], x[n // 3: 2 * n // 3], x[2 * n // 3:]]
    row = " | ".join(f"{np.mean(t):.4f}" for t in thirds)
    print(f"  {name:14s} mean early|mid|late: {row}   "
          f"min {np.min(x):.4f}  max {np.max(x):.4f}")
    return thirds


def report(tag, d):
    tr = read_csv(os.path.join(d, "training.csv"))
    ev = read_csv(os.path.join(d, "eval.csv"))
    print(f"\n== {tag}: {d}")
    ok = True
    if tr is None:
        print("  no training.csv")
        return False
    epochs = tr.get("epoch")
    print(f"  {int(epochs[-1])} epochs logged, {int(tr['itr'][-1])} steps, "
          f"{tr['time'][-1]:.0f} s wall")
    losses = [k for k in tr if k not in ("epoch", "itr", "time")]
    for k in losses:
        if not np.isfinite(tr[k]).all():
            print(f"  FAIL: non-finite values in {k}")
            ok = False
    loss_key = "loss" if "loss" in tr else losses[0]
    thirds = phase_stats(tr[loss_key], loss_key)
    if np.mean(thirds[2]) > 1.5 * np.mean(thirds[1]):
        print("  FAIL: late-phase loss regressed >1.5x vs mid-phase")
        ok = False
    if "max_feature" in tr:
        mx = tr["max_feature"]
        print(f"  max_feature envelope: median {np.median(mx):.1f}, "
              f"peak {np.max(mx):.1f} (watchdog threshold 10000)")
        if np.max(mx) > 10000:
            print("  FAIL: watchdog threshold crossed")
            ok = False
    if ev is not None and "epoch" in ev:
        print(f"  evals at epochs: {[int(e) for e in ev['epoch']]}")
        for k in ev:
            if k == "epoch":
                continue
            v = ev[k]
            print(f"    {k:16s} first {v[0]:.6f} -> last {v[-1]:.6f}")
            if not np.isfinite(v).all():
                print(f"  FAIL: non-finite eval metric {k}")
                ok = False
    print(f"  verdict: {'PASS' if ok else 'FAIL'}")
    return ok


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("dirs", nargs="+")
    args = ap.parse_args()
    results = [report(f"run{i}", d) for i, d in enumerate(args.dirs)]
    raise SystemExit(0 if all(results) else 1)
