"""Offline sample evaluation against the test split.

Parity target: reference `val_sample.py` — load generated `.npy` from
`test/<sample_path>/<dataset>/<sample>`, re-slice to match the test-loader
batch order (:40-48), optional unit-sphere renormalization (:11-17,51-53),
`compute_CD_metrics` at batch 256 (:54-57), results appended to `val.txt`
(:58-66). The recorded numbers in the reference's val.txt are the
1-NNA/MMD/COV baselines in BASELINE.md.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import yaml

from ldt_tpu.data import get_data_loaders
from ldt_tpu.eval import compute_CD_metrics
from ldt_tpu.tools.io import dict2namespace
from ldt_tpu.tools.utils import normalize_point_clouds


def main(args, cfg):
    cfg.data.cates = [args.dataset]
    sample = np.load(os.path.join("test", args.sample_path, args.dataset,
                                  args.sample))
    loaders = get_data_loaders(cfg.data, args)
    test_loader = loaders["test_loader"]

    all_ref, all_smp = [], []
    smp = sample
    for data in test_loader:
        ref_pts = data["te_points"]
        all_smp.append(smp[: ref_pts.shape[0]])
        smp = smp[ref_pts.shape[0]:]
        all_ref.append(ref_pts)
    smp = np.concatenate(all_smp)
    ref = np.concatenate(all_ref)
    if args.norm:
        smp = np.asarray(normalize_point_clouds(smp))
        ref = np.asarray(normalize_point_clouds(ref))
    gen_res = compute_CD_metrics(smp, ref, batch_size=256)

    # append results to the global val.txt (reference val_sample.py:58-66);
    # written directly since logging.basicConfig is a no-op once logging is
    # already configured.
    all_res = {f"val/gen/{k}": float(v) for k, v in gen_res.items()}
    with open("val.txt", "a") as f:
        f.write(args.dataset + ":" + args.sample + "\n")
        for k, v in all_res.items():
            f.write("[%s] %.8f\n" % (k, v))
    return all_res


def get_parser():
    parser = argparse.ArgumentParser("val samples")
    parser.add_argument("--sample", type=str)
    parser.add_argument("--dataset", type=str)
    parser.add_argument("--sample_path", default="smp", type=str)
    parser.add_argument("--norm", default=False, type=eval,
                        choices=[True, False])
    return parser.parse_args()


def get_config():
    path = os.path.join("test", "val_config.yaml")
    with open(path, "r") as f:
        config = yaml.safe_load(f)
    return dict2namespace(config)


if __name__ == "__main__":
    args = get_parser()
    cfg = get_config()
    main(args, cfg)
