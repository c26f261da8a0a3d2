"""Fabricate a synthetic ShapeNet-ViPC tree in the reference's layout.

Writes `<out>/ShapeNetViPC-{GT,Partial,View}/<synset>/<model>/...` plus
train/test list files, so the completion pipeline (view image + partial
cloud conditioned generation) can run end-to-end through the REAL
`ldt_tpu/data/vipc.py` loader when the real dataset is absent. Geometry
reuses the airplane composites from make_synth_data; partials are
view-dependent half-space cuts (the crude analog of self-occlusion), views
are orthographic splats of the cloud rendered to 224x224 PNGs.

Usage:
    python scripts/make_synth_vipc.py --out data/ShapeNetViPC-Dataset \
        --train 24 --test 8 --views 8
"""

from __future__ import annotations

import argparse
import os
import pickle

import numpy as np

SYNSET = "02691156"  # plane


def _render_view(pts: np.ndarray, az_deg: float, el_deg: float,
                 size: int = 224) -> np.ndarray:
    """Orthographic point splat from (azimuth, elevation), uint8 RGB."""
    az, el = np.radians(az_deg), np.radians(el_deg)
    ry = np.array([[np.cos(az), 0, np.sin(az)], [0, 1, 0],
                   [-np.sin(az), 0, np.cos(az)]], np.float32)
    rx = np.array([[1, 0, 0], [0, np.cos(el), -np.sin(el)],
                   [0, np.sin(el), np.cos(el)]], np.float32)
    p = pts @ ry.T @ rx.T
    xy = p[:, :2]
    depth = p[:, 2]
    uv = ((xy / (np.abs(xy).max() + 1e-6)) * (size // 2 - 2)
          + size // 2).astype(np.int32)
    img = np.full((size, size), 255, np.uint8)
    order = np.argsort(-depth)  # far first, near overwrites
    shade = (120 + 100 * (depth - depth.min())
             / (np.ptp(depth) + 1e-6)).astype(np.uint8)
    img[uv[order, 1], uv[order, 0]] = shade[order]
    return np.stack([img] * 3, axis=-1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="data/ShapeNetViPC-Dataset")
    ap.add_argument("--train", type=int, default=24)
    ap.add_argument("--test", type=int, default=8)
    ap.add_argument("--views", type=int, default=8)
    ap.add_argument("--gt_points", type=int, default=2048)
    ap.add_argument("--part_points", type=int, default=1024)
    ap.add_argument("--lists_dir", default="datasets/ViPC",
                    help="where train_list2.txt/test_list2.txt go (the "
                         "shipped configs' path)")
    ap.add_argument("--list_views", type=int, default=1,
                    help="views per model in the TEST list (more rows = "
                         "more samples for the int8 golden gate; train "
                         "stays 1 view/model)")
    args = ap.parse_args()
    if args.list_views > args.views:
        ap.error(f"--list_views {args.list_views} > --views {args.views}: "
                 "the test list would reference views that were never "
                 "rendered and the loader would crash mid-epoch")

    from PIL import Image

    from make_synth_data import make_airplane

    os.makedirs(args.lists_dir, exist_ok=True)
    for split, count, offset in (("train", args.train, 0),
                                 ("test", args.test, 500_000)):
        lines = []
        for i in range(count):
            mid = f"synth_{split}_{i:04d}"
            seed = offset + i
            cloud = make_airplane(seed)
            sub = cloud[np.random.RandomState(seed).choice(
                len(cloud), args.gt_points, replace=False)]
            gt_dir = os.path.join(args.out, "ShapeNetViPC-GT", SYNSET, mid)
            part_dir = os.path.join(args.out, "ShapeNetViPC-Partial",
                                    SYNSET, mid)
            view_dir = os.path.join(args.out, "ShapeNetViPC-View", SYNSET,
                                    mid, "rendering")
            for d in (gt_dir, part_dir, view_dir):
                os.makedirs(d, exist_ok=True)
            meta = np.zeros((args.views, 5), np.float32)
            meta[:, 0] = np.arange(args.views) * (360.0 / args.views)
            meta[:, 1] = 25.0
            np.savetxt(os.path.join(args.out, "ShapeNetViPC-View", SYNSET,
                                    mid, "rendering",
                                    "rendering_metadata.txt"), meta)
            for v in range(args.views):
                vv = str(v).rjust(2, "0")
                az = np.radians(meta[v, 0])
                # half-space cut facing the camera = crude self-occlusion
                normal = np.array([np.sin(az), 0.25, np.cos(az)], np.float32)
                vis = sub @ normal > np.percentile(sub @ normal, 40)
                part = sub[vis]
                rng = np.random.RandomState(seed * 100 + v)
                sel = rng.choice(len(part), args.part_points,
                                 replace=len(part) < args.part_points)
                with open(os.path.join(gt_dir, f"{vv}.dat"), "wb") as f:
                    pickle.dump(sub.astype(np.float32), f)
                with open(os.path.join(part_dir, f"{vv}.dat"), "wb") as f:
                    pickle.dump(part[sel].astype(np.float32), f)
                Image.fromarray(_render_view(sub, meta[v, 0], meta[v, 1])
                                ).save(os.path.join(view_dir, f"{vv}.png"))
            n_list = args.list_views if split == "test" else 1
            for v in range(n_list):
                lines.append(f"{SYNSET};{mid};{str(v).rjust(2, '0')}\n")
        with open(os.path.join(args.lists_dir, f"{split}_list2.txt"),
                  "w") as f:
            f.writelines(lines)
        print(f"{split}: {count} models x {args.views} views "
              f"({len(lines)} list rows)")


if __name__ == "__main__":
    main()
