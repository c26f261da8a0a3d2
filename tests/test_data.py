"""Tests for the torch-free data pipeline and config-driven CSV logging."""

import os

import numpy as np
import pytest

from ldt_tpu.data import DataLoader, ShapeNet15kPointClouds, get_data_loaders
from ldt_tpu.tools.io import dict2namespace
from ldt_tpu.tools.log import logger as csv_logger


@pytest.fixture(scope="module")
def fake_shapenet(tmp_path_factory):
    root = tmp_path_factory.mktemp("PC15k")
    rng = np.random.RandomState(0)
    synset = "02691156"  # airplane
    for split in ("train", "val"):
        d = root / synset / split
        d.mkdir(parents=True)
        for i in range(4 if split == "train" else 3):
            np.save(d / f"model{i}.npy",
                    rng.randn(15000, 3).astype(np.float32) * 2 + 1)
    return str(root)


class TestShapeNet:
    def test_dataset_contract(self, fake_shapenet):
        ds = ShapeNet15kPointClouds(
            root_dir=fake_shapenet, categories=["airplane"], split="train",
            tr_sample_size=2048, te_sample_size=2048, random_subsample=True)
        assert len(ds) == 4
        item = ds[0]
        assert item["tr_points"].shape == (2048, 3)
        assert item["te_points"].shape == (2048, 3)
        assert item["shift"].shape == (1, 3)
        assert item["sid"] == "02691156"
        assert item["cate_idx"] == 0

    def test_unit_sphere_normalization_roundtrip(self, fake_shapenet):
        ds = ShapeNet15kPointClouds(
            root_dir=fake_shapenet, categories=["airplane"], split="train",
            tr_sample_size=2048, te_sample_size=2048)
        # normalized clouds live in the unit sphere
        r = np.sqrt((ds.all_points ** 2).sum(-1)).max()
        assert r <= 1.0 + 1e-5
        # shift/scale undo the normalization per cloud
        item = ds[1]
        denorm = item["te_points"] * item["scale"] + item["shift"]
        orig_r = np.sqrt(((denorm - denorm.mean(0)) ** 2).sum(-1)).max()
        assert orig_r > 1.0  # original scale restored (clouds were std=2)

    def test_deterministic_shuffle(self, fake_shapenet):
        a = ShapeNet15kPointClouds(root_dir=fake_shapenet,
                                   categories=["airplane"], split="train",
                                   tr_sample_size=128, te_sample_size=128)
        b = ShapeNet15kPointClouds(root_dir=fake_shapenet,
                                   categories=["airplane"], split="train",
                                   tr_sample_size=128, te_sample_size=128)
        assert a.shuffle_idx == b.shuffle_idx
        assert [m for _, m in a.all_cate_mids] == [m for _, m in b.all_cate_mids]

    def test_get_data_loaders(self, fake_shapenet):
        cfg = dict2namespace(dict(
            cates=["airplane"], tr_max_sample_points=256,
            te_max_sample_points=256, data_dir=fake_shapenet, batch_size=2,
            test_batch_size=2, boundary=True, num_workers=0))
        args = dict2namespace(dict(eval_split="val"))
        loaders = get_data_loaders(cfg, args)
        batch = next(iter(loaders["train_loader"]))
        assert batch["tr_points"].shape == (2, 256, 3)
        assert batch["cate_idx"].shape == (2,)
        n_test = sum(b["te_points"].shape[0]
                     for b in loaders["test_loader"])
        assert n_test == 3  # val split size, no drop_last


class TestLoader:
    def test_drop_last_and_shapes(self):
        data = [{"x": np.full((2,), i, np.float32)} for i in range(5)]
        dl = DataLoader(data, batch_size=2, drop_last=True)
        batches = list(dl)
        assert len(batches) == 2
        assert batches[0]["x"].shape == (2, 2)

    def test_shuffle_covers_all(self):
        data = [{"x": np.float32(i)} for i in range(10)]
        dl = DataLoader(data, batch_size=3, shuffle=True, seed=1)
        seen = np.sort(np.concatenate([b["x"] for b in dl]))
        np.testing.assert_array_equal(seen, np.arange(10, dtype=np.float32))

    def test_worker_pool_same_batches(self):
        """num_workers item fetch preserves batch contents AND order."""
        data = [{"x": np.full((2,), i, np.float32)} for i in range(11)]
        want = [b["x"] for b in DataLoader(data, batch_size=3, seed=0)]
        got = [b["x"] for b in DataLoader(data, batch_size=3, seed=0,
                                          num_workers=4)]
        assert len(want) == len(got)
        for w, g in zip(want, got):
            np.testing.assert_array_equal(w, g)

    def test_worker_pool_parallelizes_io(self):
        """IO-bound items (GIL released, like PIL/pickle reads on the
        non-preload ViPC path) overlap under the thread pool — the
        reference's num_workers=4 DataLoader semantics."""
        import time

        class SlowDS:
            def __len__(self):
                return 16

            def __getitem__(self, i):
                time.sleep(0.02)  # stands in for file IO
                return {"x": np.float32(i)}

        t0 = time.time()
        list(DataLoader(SlowDS(), batch_size=8))
        serial = time.time() - t0
        t0 = time.time()
        list(DataLoader(SlowDS(), batch_size=8, num_workers=8))
        pooled = time.time() - t0
        assert pooled < serial / 2, (serial, pooled)

    def test_worker_pool_propagates_errors(self):
        class BadDS:
            def __len__(self):
                return 4

            def __getitem__(self, i):
                if i == 2:
                    raise RuntimeError("corrupt item")
                return {"x": np.float32(i)}

        import pytest

        with pytest.raises(RuntimeError, match="corrupt item"):
            list(DataLoader(BadDS(), batch_size=4, num_workers=2))


class TestCsvLogger:
    def test_schema_driven_write(self, tmp_path):
        cfg = dict2namespace(dict(log=dict(
            save_path=str(tmp_path),
            traincolumns=["epoch", "loss", "time"],
            trainformat=[None, "{:.4f}", "{:.0f}"],
            evalcolumns=["epoch", "mmd-CD"],
            evalformat=[None, "{:.8f}"],
        )))
        lg = csv_logger(cfg)
        lg.write([1, 0.123456, 12.7], mode="train")
        lg.write([1, 0.00012345], mode="eval")
        train_rows = open(tmp_path / "training.csv").read().strip().split("\n")
        assert train_rows[0] == "epoch,loss,time"
        assert train_rows[1] == "1,0.1235,13"
        eval_rows = open(tmp_path / "eval.csv").read().strip().split("\n")
        assert eval_rows[1] == "1,0.00012345"


class TestWriteEval:
    """BaseTrainer.write_eval name-matches evalcolumns against the metric
    dict (the reference's positional write loses the row whenever counts
    differ — its shipped stage-2 configs list 7 columns for 12 metrics)."""

    def _trainer(self, tmp_path, evalcolumns, evalformat):
        from ldt_tpu.training.base import BaseTrainer

        cfg = dict2namespace(dict(
            log=dict(save_path=str(tmp_path),
                     traincolumns=["epoch"], trainformat=[None],
                     evalcolumns=evalcolumns, evalformat=evalformat,
                     save_epoch_freq=1),
            opt=dict(lr=1e-3, warmup_iters=0),
            common=dict(epochs=1),
        ))
        return BaseTrainer(cfg)

    def test_name_matched_subset(self, tmp_path):
        tr = self._trainer(tmp_path, ["epoch", "mmd-CD", "cov-CD"],
                           [None, "{:.8f}", "{:.6f}"])
        # 12-metric dict, prefixed keys, different order than columns
        res = {"val/gen/cov-CD": 0.5, "val/gen/mmd-CD": 0.25,
               "val/gen/1-NN-CD-acc": 0.9}
        tr.write_eval(7, res)
        rows = open(tmp_path / "eval.csv").read().strip().split("\n")
        assert rows[1] == "7,0.25000000,0.500000"

    def test_positional_fallback(self, tmp_path):
        tr = self._trainer(tmp_path, ["epoch", "cd", "f1score"],
                           [None, "{:.4f}", "{:.4f}"])
        res = {"cd": 1.5, "f1score": 0.5}
        tr.write_eval(3, res)
        rows = open(tmp_path / "eval.csv").read().strip().split("\n")
        assert rows[1] == "3,1.5000,0.5000"
        # unknown names, matching count -> reference's positional order
        tr.write_eval(4, {"a": 1.0, "b": 2.0})
        rows = open(tmp_path / "eval.csv").read().strip().split("\n")
        assert rows[2] == "4,1.0000,2.0000"
