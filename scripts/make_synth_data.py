"""Fabricate a structured synthetic ShapeNet-like dataset on disk.

Writes `<out>/<synsetid>/{train,val,test}/<id>.npy` clouds of 15000 points in
the exact layout `ldt_tpu/data/shapenet55.py` (and the reference
`datasets/ShapeNet_55.py:64-120`) expects, so long-horizon training runs
exercise the REAL data pipeline end-to-end (load, seed-38383 shuffle,
normalize, random 2048-subsample) when no real ShapeNetCore.v2.PC15k is
available in the image.

The clouds are airplane-ish parametric composites (ellipsoid fuselage +
swept wings + tailplane + fin), deterministic per (split, index): a learnable
distribution with real multi-part structure — a VAE trained on it has
something non-trivial to compress, unlike i.i.d. noise.

Usage:
    python scripts/make_synth_data.py --out data/ShapeNetCore.v2.PC15k \
        --cate airplane --train 512 --val 64 --test 64
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

# Runnable as `python scripts/make_synth_data.py` from anywhere: put the
# repo root (this file's parent's parent) ahead of scripts/ on sys.path so
# the ldt_tpu import below resolves without PYTHONPATH.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_POINTS = 15000


def _unit_sphere(rng, n):
    v = rng.normal(size=(n, 3))
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def _ellipsoid(rng, n, radii):
    return _unit_sphere(rng, n) * np.asarray(radii)


def _box(rng, n, half):
    """Points on the surface of an axis-aligned box with half-extents."""
    half = np.asarray(half, np.float64)
    # pick faces proportional to area
    areas = np.array([half[1] * half[2], half[0] * half[2],
                      half[0] * half[1]])
    areas = np.repeat(areas, 2)
    face = rng.choice(6, size=n, p=areas / areas.sum())
    u = rng.uniform(-1, 1, size=(n, 3)) * half
    axis = face // 2
    sign = np.where(face % 2 == 0, 1.0, -1.0)
    u[np.arange(n), axis] = sign * half[axis]
    return u


def make_airplane(seed: int) -> np.ndarray:
    """One 15000-point airplane-ish composite, deterministic in `seed`."""
    rng = np.random.RandomState(seed)
    # per-shape latent factors
    fuse_len = rng.uniform(0.7, 1.1)
    fuse_r = rng.uniform(0.08, 0.16)
    span = rng.uniform(0.6, 1.0)
    chord = rng.uniform(0.15, 0.3)
    sweep = rng.uniform(0.0, 0.35)
    wing_x = rng.uniform(-0.15, 0.1)
    tail_span = span * rng.uniform(0.3, 0.45)
    fin_h = rng.uniform(0.15, 0.3)

    n_fuse, n_wing, n_tail, n_fin = 6000, 5500, 2000, 1500
    fuse = _ellipsoid(rng, n_fuse, (fuse_len, fuse_r, fuse_r))

    # curved (flattened-ellipsoid) lifting surfaces rather than boxes:
    # axis-aligned flat patches + tiny noise make degenerate kNN
    # neighborhoods with outlier standardized features; curvature keeps the
    # geometry statistics closer to surface-sampled ShapeNet.
    wing = _ellipsoid(rng, n_wing, (chord / 2, 0.02, span / 2))
    wing[:, 0] += wing_x - sweep * np.abs(wing[:, 2]) / (span / 2 + 1e-9)

    tail = _ellipsoid(rng, n_tail, (chord * 0.35, 0.015, tail_span / 2))
    tail[:, 0] -= fuse_len * 0.85

    fin = _ellipsoid(rng, n_fin, (chord * 0.3, fin_h / 2, 0.015))
    fin[:, 0] -= fuse_len * 0.85
    fin[:, 1] += fin_h / 2

    pts = np.concatenate([fuse, wing, tail, fin]).astype(np.float32)
    # random yaw so clouds are not axis-aligned like the parametrization
    th = rng.uniform(0.0, 2.0 * np.pi)
    rot = np.array([[np.cos(th), 0.0, np.sin(th)], [0.0, 1.0, 0.0],
                    [-np.sin(th), 0.0, np.cos(th)]], np.float32)
    pts = pts @ rot.T
    pts += rng.normal(scale=0.006, size=pts.shape).astype(np.float32)
    assert pts.shape == (N_POINTS, 3)
    return pts[rng.permutation(N_POINTS)]


def make_blob(seed: int) -> np.ndarray:
    """One 15000-point RBF-deformed ellipsoid, deterministic in `seed`.

    Smooth closed surface with per-shape latent structure (axis ratios + a
    random smooth radial displacement field) and near-uniform point density.
    Kept as the maximally-benign geometry family: comparing encoder
    activation statistics between blobs and the airplane composites is what
    exposed the flax-vs-torch default-init divergence fixed in
    `ldt_tpu/nn/layers.py::Dense` (activations scale with geometry
    degeneracy, but the ~1000x init blowup dominated both).
    """
    rng = np.random.RandomState(seed)
    n_centers = 8
    centers = _unit_sphere(rng, n_centers)
    amps = rng.uniform(-0.35, 0.35, n_centers)
    width = rng.uniform(0.5, 0.9)
    radii = rng.uniform(0.5, 1.0, 3)

    d = _unit_sphere(rng, N_POINTS)
    # smooth radial field: sum of spherical RBF bumps
    dots = d @ centers.T                       # [N, C] cos(angle)
    bump = np.exp((dots - 1.0) / (width ** 2))  # geodesic-ish RBF
    r = 1.0 + bump @ amps
    pts = (d * r[:, None] * radii).astype(np.float32)
    pts += rng.normal(scale=0.01, size=pts.shape).astype(np.float32)
    return pts


MAKERS = {"airplane": make_airplane, "blob": make_blob}

SPLIT_OFFSET = {"train": 0, "val": 1_000_000, "test": 2_000_000}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="data/ShapeNetCore.v2.PC15k")
    ap.add_argument("--cate", default="airplane",
                    help="category (synset dir) the clouds are written under")
    ap.add_argument("--shape", default="airplane", choices=sorted(MAKERS),
                    help="generator family (see MAKERS)")
    ap.add_argument("--train", type=int, default=512)
    ap.add_argument("--val", type=int, default=64)
    ap.add_argument("--test", type=int, default=64)
    args = ap.parse_args()

    from ldt_tpu.data.shapenet55 import cate_to_synsetid

    sid = cate_to_synsetid[args.cate]
    make = MAKERS[args.shape]
    for split, count in (("train", args.train), ("val", args.val),
                         ("test", args.test)):
        d = os.path.join(args.out, sid, split)
        os.makedirs(d, exist_ok=True)
        for i in range(count):
            path = os.path.join(d, f"synth_{i:05d}.npy")
            if os.path.exists(path):
                continue
            np.save(path, make(SPLIT_OFFSET[split] + i))
        print(f"{split}: {count} clouds at {d}")


if __name__ == "__main__":
    main()
