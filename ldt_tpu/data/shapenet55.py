"""ShapeNetCore.v2.PC15k dataset (torch-free numpy pipeline).

Parity target: reference `datasets/ShapeNet_55.py`. Semantics preserved
exactly:
  * synsetid<->category maps (:13-36)
  * per-cloud unit-sphere normalization returning shift/scale (:39-61)
  * deterministic shuffle with `random.Random(38383)` (:106-111)
  * `tr_points` drawn from the FULL 15k cloud (random 2048-subsample when
    `random_subsample`), `te_points` from the last-5k split (:150-163)
  * `get_data_loaders(cfg, args)` contract (:224-240)
"""

from __future__ import annotations

import os
import random
from typing import Optional

import numpy as np

from ldt_tpu.data.loader import DataLoader

synsetid_to_cate = {
    "02691156": "airplane", "02773838": "bag", "02801938": "basket",
    "02808440": "bathtub", "02818832": "bed", "02828884": "bench",
    "02876657": "bottle", "02880940": "bowl", "02924116": "bus",
    "02933112": "cabinet", "02747177": "can", "02942699": "camera",
    "02954340": "cap", "02958343": "car", "03001627": "chair",
    "03046257": "clock", "03207941": "dishwasher", "03211117": "monitor",
    "04379243": "table", "04401088": "telephone", "02946921": "tin_can",
    "04460130": "tower", "04468005": "train", "03085013": "keyboard",
    "03261776": "earphone", "03325088": "faucet", "03337140": "file",
    "03467517": "guitar", "03513137": "helmet", "03593526": "jar",
    "03624134": "knife", "03636649": "lamp", "03642806": "laptop",
    "03691459": "speaker", "03710193": "mailbox", "03759954": "microphone",
    "03761084": "microwave", "03790512": "motorcycle", "03797390": "mug",
    "03928116": "piano", "03938244": "pillow", "03948459": "pistol",
    "03991062": "pot", "04004475": "printer", "04074963": "remote_control",
    "04090263": "rifle", "04099429": "rocket", "04225987": "skateboard",
    "04256520": "sofa", "04330267": "stove", "04530566": "vessel",
    "04554684": "washer", "02992529": "cellphone",
    "02843684": "birdhouse", "02871439": "bookshelf",
}
cate_to_synsetid = {v: k for k, v in synsetid_to_cate.items()}


def normalize_point_cloud(inputs: np.ndarray, verbose: bool = False):
    """Per-cloud center + unit-sphere scale (ShapeNet_55.py:39-61)."""
    c = inputs.shape[-1]
    pc = inputs[:, :, :3]
    centroid = np.mean(pc, axis=1, keepdims=True)
    pc = inputs[:, :, :3] - centroid
    furthest = np.amax(np.sqrt(np.sum(pc ** 2, axis=-1, keepdims=True)),
                       axis=1, keepdims=True)
    pc = pc / furthest
    if c > 3:
        return np.concatenate([pc, inputs[:, :, 3:]], axis=-1)
    if verbose:
        return pc, [centroid, furthest]
    return pc


class Uniform15KPC:
    """RAM-resident 15k-point clouds (ShapeNet_55.py:64-175)."""

    def __init__(self, root_dir, subdirs, tr_sample_size=10000,
                 te_sample_size=10000, split="train",
                 random_subsample=False, boundary=True, rng_seed=0):
        self.root_dir = root_dir
        self.split = split
        self.subdirs = subdirs
        self.random_subsample = random_subsample
        self.input_dim = 3
        self._rng = np.random.RandomState(rng_seed)
        self.all_cate_mids = []
        self.cate_idx_lst = []
        entries = []  # (path, cate_idx, (subd, mid))
        for cate_idx, subd in enumerate(subdirs):
            sub_path = os.path.join(root_dir, subd, split)
            if not os.path.isdir(sub_path):
                print(f"Directory missing : {sub_path}")
                continue
            all_mids = [os.path.join(split, x[:-len(".npy")])
                        for x in sorted(os.listdir(sub_path))
                        if x.endswith(".npy")]
            for mid in all_mids:
                entries.append((os.path.join(root_dir, subd, mid + ".npy"),
                                cate_idx, (subd, mid)))
        # Bulk-load on the native thread pool (ldt_tpu/data/fastload.py);
        # files the fast path can't parse fall back to np.load inside
        # load_npy_batch, unreadable ones are skipped — exactly the
        # reference's per-file try/except semantics (ShapeNet_55.py:96-99) —
        # while readable-but-wrong-shape files RAISE, matching the
        # reference's hard 15000-point assert (ShapeNet_55.py:101).
        from ldt_tpu.data.fastload import load_npy_batch

        block, ok = load_npy_batch([e[0] for e in entries], (15000, 3),
                                   strict_shape=True)
        keep = np.nonzero(ok)[0]
        self.cate_idx_lst = [entries[i][1] for i in keep]
        self.all_cate_mids = [entries[i][2] for i in keep]

        # deterministic shuffle, seed 38383 (ShapeNet_55.py:106-111)
        self.shuffle_idx = list(range(len(keep)))
        random.Random(38383).shuffle(self.shuffle_idx)
        self.cate_idx_lst = [self.cate_idx_lst[i] for i in self.shuffle_idx]
        self.all_cate_mids = [self.all_cate_mids[i] for i in self.shuffle_idx]

        self.all_points = block[keep[self.shuffle_idx]] if len(keep) \
            else np.zeros((0, 15000, 3), np.float32)
        if boundary and len(self.all_points):
            self.all_points, [self.per_points_shift, self.per_points_scale] = \
                normalize_point_cloud(self.all_points, verbose=True)
        else:
            n = self.all_points.shape[0]
            # [N,1,3] ones, matching the reference's no-boundary placeholder
            # (ShapeNet_55.py:119-120) so the item dict's `scale` is [1,3]
            # here vs [1,1] under boundary=True, exactly like the reference
            self.per_points_shift = np.zeros((n, 1, 3), np.float32)
            self.per_points_scale = np.ones((n, 1, 3), np.float32)

        self.train_points = self.all_points[:, :10000]
        self.test_points = self.all_points[:, 10000:]
        self.tr_sample_size = min(10000, tr_sample_size)
        self.te_sample_size = min(5000, te_sample_size)
        self.display_axis_order = [0, 1, 2]
        print(f"Total number of data:{len(self.train_points)}")
        print(f"Min number of points: (train){self.tr_sample_size} "
              f"(test){self.te_sample_size}")

    def get_standardize_stats(self, idx):
        shift = self.per_points_shift[idx].reshape(1, self.input_dim)
        scale = self.per_points_scale[idx].reshape(1, -1)
        return shift, scale

    def __len__(self):
        return len(self.train_points)

    def __getitem__(self, idx):
        # NOTE: training points subsample from the FULL 15k cloud
        # (ShapeNet_55.py:151-156), not the 10k train split.
        tr_out = self.all_points[idx]
        if self.random_subsample:
            tr_idxs = self._rng.choice(tr_out.shape[0], self.tr_sample_size)
        else:
            tr_idxs = np.arange(self.tr_sample_size)
        tr_out = tr_out[tr_idxs, :].astype(np.float32)
        te_out = self.test_points[idx]
        if self.random_subsample:
            te_idxs = self._rng.choice(te_out.shape[0], self.te_sample_size)
        else:
            te_idxs = np.arange(self.te_sample_size)
        te_out = te_out[te_idxs, :].astype(np.float32)
        sid, mid = self.all_cate_mids[idx]
        shift, scale = self.get_standardize_stats(idx)
        return {
            "idx": idx,
            "tr_points": tr_out,
            "te_points": te_out,
            "cate_idx": self.cate_idx_lst[idx],
            "sid": sid, "mid": mid,
            "shift": shift.astype(np.float32),
            "scale": scale.astype(np.float32),
        }


class ShapeNet15kPointClouds(Uniform15KPC):
    """Category-filtered wrapper (ShapeNet_55.py:178-203)."""

    def __init__(self, root_dir="data/ShapeNetCore.v2.PC15k",
                 categories=("airplane",), tr_sample_size=10000,
                 te_sample_size=2048, split="train", random_subsample=False,
                 boundary=True):
        assert split in ["train", "test", "val"]
        self.cates = list(categories)
        if "all" in self.cates:
            synset_ids = list(cate_to_synsetid.values())
        else:
            synset_ids = [cate_to_synsetid[c] for c in self.cates]
        self.gravity_axis = 1
        super().__init__(root_dir, synset_ids, tr_sample_size=tr_sample_size,
                         te_sample_size=te_sample_size, split=split,
                         random_subsample=random_subsample, boundary=boundary)
        self.display_axis_order = [0, 2, 1]


def get_datasets(cfg, args):
    """ShapeNet_55.py:206-221."""
    tr_dataset = ShapeNet15kPointClouds(
        categories=cfg.cates, split="train",
        tr_sample_size=cfg.tr_max_sample_points,
        te_sample_size=cfg.te_max_sample_points,
        root_dir=cfg.data_dir, random_subsample=True, boundary=cfg.boundary)
    eval_split = getattr(args, "eval_split", "val")
    te_dataset = ShapeNet15kPointClouds(
        categories=cfg.cates, split=eval_split,
        tr_sample_size=cfg.tr_max_sample_points,
        te_sample_size=cfg.te_max_sample_points,
        root_dir=cfg.data_dir, boundary=cfg.boundary)
    return tr_dataset, te_dataset


def get_data_loaders(cfg, args):
    """ShapeNet_55.py:224-240 contract."""
    tr_dataset, te_dataset = get_datasets(cfg, args)
    train_loader = DataLoader(tr_dataset, batch_size=cfg.batch_size,
                              shuffle=True, drop_last=True,
                              seed=getattr(cfg, "seed", 0))
    test_loader = DataLoader(te_dataset, batch_size=cfg.test_batch_size,
                             shuffle=False, drop_last=False)
    return {"train_loader": train_loader, "test_loader": test_loader}
