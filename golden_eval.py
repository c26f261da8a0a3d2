"""Golden-eval harness: reproduce reference val.txt rows within tolerance.

BASELINE.md's acceptance criterion is 1-NNA-CD within 1% of the reference's
recorded numbers (/root/reference/val.txt). This script takes a val.txt in
the reference's format (INFO:root:-prefixed blocks, `lgan_`-prefixed LGAN
metric names), the released sample `.npy`s, and the dataset config, replays
every block through THIS repo's `val_sample.py` pipeline
(loader re-slice -> compute_CD_metrics @ batch 256), and asserts each metric
within `--tol` (relative; absolute fallback for near-zero values).

Usage (once real ShapeNet data + released samples are available):

    python golden_eval.py --val_txt /path/to/val.txt \
        --config test/val_config.yaml --sample_path smp --tol 0.01

Exit code 0 = every row within tolerance. The parser + comparison are
exercised today with synthetic stand-ins (tests/test_golden_eval.py), so
the harness is ready the moment the data ships.
"""

from __future__ import annotations

import argparse
import os
import re
import sys

import yaml

from ldt_tpu.tools.io import dict2namespace

# reference val.txt metric name -> compute_CD_metrics key
KEY_MAP = {
    "lgan_mmd-CD": "mmd-CD",
    "lgan_cov-CD": "cov-CD",
    "lgan_mmd_smp-CD": "mmd_smp-CD",
    "1-NN-CD-acc_t": "1-NN-CD-acc_t",
    "1-NN-CD-acc_f": "1-NN-CD-acc_f",
    "1-NN-CD-acc": "1-NN-CD-acc",
    # this repo's own val.txt rows use the un-prefixed names already
    "mmd-CD": "mmd-CD",
    "cov-CD": "cov-CD",
    "mmd_smp-CD": "mmd_smp-CD",
}

_HEADER = re.compile(r"^(?:INFO:root:)?(\w[\w-]*):(.+\.npy)\s*$")
_METRIC = re.compile(
    r"^(?:INFO:root:)?\[val/gen/([\w.-]+)\]\s+([-+0-9.eE]+)\s*$")


def parse_val_txt(path: str):
    """-> list of (dataset, sample_file, {metric_key: value}) blocks."""
    blocks = []
    current = None
    with open(path) as f:
        for line in f:
            m = _HEADER.match(line.strip())
            if m:
                current = (m.group(1), m.group(2), {})
                blocks.append(current)
                continue
            m = _METRIC.match(line.strip())
            if m and current is not None:
                name, value = m.group(1), float(m.group(2))
                if name in KEY_MAP:
                    current[2][KEY_MAP[name]] = value
    return [b for b in blocks if b[2]]


def within(val: float, ref: float, tol: float) -> bool:
    if abs(ref) < 1e-8:
        return abs(val - ref) < tol
    return abs(val - ref) / abs(ref) <= tol


def run(args) -> int:
    import val_sample

    with open(args.config) as f:
        cfg = dict2namespace(yaml.safe_load(f))
    blocks = parse_val_txt(args.val_txt)
    if not blocks:
        print(f"no parseable blocks in {args.val_txt}")
        return 2
    if args.datasets:
        blocks = [b for b in blocks if b[0] in args.datasets]

    failures, n_checked = [], 0
    for dataset, sample_file, want in blocks:
        va = dict2namespace(dict(
            sample=sample_file, dataset=dataset,
            sample_path=args.sample_path, norm=args.norm,
            eval_split=getattr(args, "eval_split", "val")))
        got = val_sample.main(va, cfg)
        got = {k.replace("val/gen/", ""): v for k, v in got.items()}
        for key, ref_val in want.items():
            n_checked += 1
            val = got.get(key)
            ok = val is not None and within(val, ref_val, args.tol)
            status = "ok " if ok else "FAIL"
            print(f"[{status}] {dataset}/{sample_file} {key}: "
                  f"got {val!r} want {ref_val:.8f} (tol {args.tol:.2%})")
            if not ok:
                failures.append((dataset, key, val, ref_val))
    print(f"\n{n_checked - len(failures)}/{n_checked} metrics within "
          f"{args.tol:.2%} across {len(blocks)} block(s)")
    return 1 if failures else 0


def get_parser():
    p = argparse.ArgumentParser("golden eval vs reference val.txt")
    p.add_argument("--val_txt", required=True,
                   help="reference val.txt to reproduce")
    p.add_argument("--config", default=os.path.join("test", "val_config.yaml"))
    p.add_argument("--sample_path", default="smp",
                   help="subdir under test/ holding <dataset>/<sample>.npy")
    p.add_argument("--datasets", nargs="*", default=None)
    p.add_argument("--tol", type=float, default=0.01)
    p.add_argument("--norm", type=eval, default=False, choices=[True, False])
    return p


if __name__ == "__main__":
    sys.exit(run(get_parser().parse_args()))
