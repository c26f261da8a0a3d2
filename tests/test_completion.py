"""ViPC completion pipeline tests: dataset, conditional trainers, e2e."""

import os
import pickle

import jax.numpy as jnp
import numpy as np
import pytest

from ldt_tpu.data.vipc import ViPCDataLoader, get_data_loaders
from ldt_tpu.models import Compressor, Score
from ldt_tpu.tools.io import dict2namespace
from ldt_tpu.training import (
    completion_compressor_trainer,
    completion_latent_sde_trainer,
)
from ldt_tpu.training.completion_compressor_trainer import fps_to

N_PTS = 64
SYNSET = "02691156"


@pytest.fixture(scope="module")
def vipc_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("vipc")
    rng = np.random.RandomState(0)
    try:
        from PIL import Image
    except ImportError:
        pytest.skip("PIL unavailable")
    mids = ["modelA", "modelB"]
    lines = []
    for mid in mids:
        gt_dir = root / "ShapeNetViPC-GT" / SYNSET / mid
        part_dir = root / "ShapeNetViPC-Partial" / SYNSET / mid
        view_dir = root / "ShapeNetViPC-View" / SYNSET / mid / "rendering"
        for d in (gt_dir, part_dir, view_dir):
            d.mkdir(parents=True)
        meta = np.zeros((24, 5), np.float32)
        meta[:, 0] = np.arange(24) * 15.0  # azimuth degrees
        meta[:, 1] = 25.0
        np.savetxt(str(root / "ShapeNetViPC-View" / SYNSET / mid /
                       "rendering" / "rendering_metadata.txt"), meta)
        for v in range(24):
            vv = str(v).rjust(2, "0")
            with open(gt_dir / f"{vv}.dat", "wb") as f:
                pickle.dump(rng.randn(800, 3).astype(np.float32), f)
            with open(part_dir / f"{vv}.dat", "wb") as f:
                pickle.dump(rng.randn(200, 3).astype(np.float32), f)
            Image.fromarray(
                (rng.rand(32, 32, 3) * 255).astype(np.uint8)).save(
                view_dir / f"{vv}.png")
        lines.append(f"{SYNSET};{mid};00\n")
    for split in ("train_list2.txt", "test_list2.txt"):
        with open(root / split, "w") as f:
            f.writelines(lines)
    return root


def completion_cfg(tmp_path, root, condition=True):
    model = dict(
        outsize=N_PTS, max_outputs=N_PTS, input_dim=3, z_dim=4, z_scales=8,
        p_dim=16, n_layers=2, hidden_dim=32, num_heads=2, activation="swish",
        encoder_dropout_p=0.0, decoder_dropout_p=0.0, norm="layer_norm",
        neighbors=8, encoder_layers=1, mlp_ratio=2.0, min_sigma=-30,
        cluster_norm="anchor", norm_input=False, pre_group=False,
        decoder_act=None, ActNorm=True, AdaLN=True, pos_embedding="center",
        class_condition=False, num_categorys=1, pretrain_path=None)
    cfg = dict(
        data=dict(train_cate="plane", test_cate="plane", train_preload=False,
                  test_preload=False, data_dir=str(root),
                  train_list=str(root / "train_list2.txt"),
                  test_list=str(root / "test_list2.txt"),
                  tr_max_sample_points=N_PTS, te_max_sample_points=N_PTS,
                  batch_size=2, test_batch_size=2, num_categorys=1,
                  num_workers=0),
        opt=dict(adj_lr="warm_up", warmup_iters=2, lr=1e-3, beta1=0.9,
                 beta2=0.999, ema_decay=0.99, weight_decay=0.0,
                 grad_norm_clip_value=1.0, kl_weight=1e-6, loss_type="l2",
                 discrete=True),
        log=dict(save_epoch_freq=1, save_path=str(tmp_path),
                 traincolumns=["epoch", "itr", "loss", "time"],
                 trainformat=[None, None, "{:.4f}", "{:.0f}"],
                 evalcolumns=["epoch", "cd", "f1score"],
                 evalformat=[None, "{:.8f}", "{:.8f}"],
                 log_epoch_freq=1, eval_epoch_freq=1000),
        common=dict(epochs=2, num_points=N_PTS, seed=0),
        model=model, compressor=model,
        score=dict(num_steps=8, z_dim=8, z_scale=8, hidden_size=32,
                   num_heads=4, num_blocks=2, num_categorys=1, t_dim=16,
                   dropout=0.0, norm="layer_norm", learn_sigma=False,
                   act="swish", unet=False, AdaLN=True, condition=condition),
        sde=dict(beta_start=0.1, beta_end=20.0, sde_type="vpsde",
                 sigma2_0=0.0, iw_sample_p_mode="drop_all_iw",
                 iw_sample_q_mode="drop_all_iw", time_eps=0.01, ode_tol=1e-4,
                 sample_time_eps=1e-6, sample_mode="discrete",
                 predictor="ancestral", corrector=None, train_N=8,
                 sample_N=64, snr=0.01, corrector_steps=1, denoise=True,
                 probability_flow=False, alpha=1.0),
    )
    return dict2namespace(cfg)


class TestViPCDataset:
    def test_item_contract(self, vipc_root):
        ds = ViPCDataLoader(str(vipc_root / "train_list2.txt"),
                            str(vipc_root), status="train", category="plane",
                            preload=False)
        assert len(ds) == 2
        item = ds[0]
        assert item["views"].shape == (224, 224, 3)
        assert item["pc"].shape == (800, 3)
        assert item["pc_part"].shape == (3500, 3)  # pad-repeat from 200
        # joint normalization: GT inside unit sphere
        assert np.sqrt((item["pc"] ** 2).sum(-1)).max() <= 1.0 + 1e-5

    def test_preload_roundtrip(self, vipc_root):
        ds = ViPCDataLoader(str(vipc_root / "train_list2.txt"),
                            str(vipc_root), status="train", category="plane",
                            preload=True)
        item = ds[0]
        assert item["views"].shape == (224, 224, 3)

    def test_loaders(self, vipc_root):
        cfg = dict2namespace(dict(
            train_cate="plane", test_cate="plane", train_preload=False,
            test_preload=False, data_dir=str(vipc_root),
            train_list=str(vipc_root / "train_list2.txt"),
            test_list=str(vipc_root / "test_list2.txt"),
            batch_size=2, test_batch_size=2, num_workers=0))
        loaders = get_data_loaders(cfg)
        batch = next(iter(loaders["train_loader"]))
        assert batch["pc"].shape == (2, 800, 3)
        assert batch["views"].shape == (2, 224, 224, 3)


class TestCompletionTrainers:
    def test_fps_to(self):
        pc = np.random.RandomState(0).randn(2, 300, 3).astype(np.float32)
        out = fps_to(pc, 64)
        assert out.shape == (2, 64, 3)

    def test_completion_compressor_update(self, vipc_root, tmp_path):
        cfg = completion_cfg(tmp_path, vipc_root)
        t = completion_compressor_trainer.Trainer(cfg, Compressor(cfg.model))
        pc = np.random.RandomState(0).randn(2, N_PTS, 3).astype(np.float32)
        loss, kl, rec, mx = t.update(pc)
        assert np.isfinite(float(loss))

    def test_conditional_sde_update_and_sample(self, vipc_root, tmp_path):
        cfg = completion_cfg(tmp_path, vipc_root)
        t = completion_latent_sde_trainer.Trainer(
            cfg, Score(cfg.score), Compressor(cfg.compressor))
        loaders = get_data_loaders(cfg.data)
        batch = next(iter(loaders["train_loader"]))
        loss = t.update(batch)
        assert np.isfinite(float(loss))
        # conditional score must carry ConditionNet batch stats
        assert t.state.batch_stats is not None
        res = t.valsample(loaders["test_loader"])
        assert np.isfinite(res["cd"])
        assert 0.0 <= res["f1score"] <= 1.0


class TestViPCViewAlign:
    def test_preload_view_align_matches_nonpreload(self, vipc_root):
        """view_align under preload (surplus over the reference, which
        raises NotImplementedError there — ViPC.py:216-219) must produce
        exactly the non-preload aligned fetch."""
        kw = dict(data_path=str(vipc_root), status="train", category="plane",
                  view_align=True)
        ds_pre = ViPCDataLoader(str(vipc_root / "train_list2.txt"),
                                preload=True, **kw)
        ds_lazy = ViPCDataLoader(str(vipc_root / "train_list2.txt"),
                                 preload=False, **kw)
        for idx in range(len(ds_pre)):
            a, b = ds_pre[idx], ds_lazy[idx]
            np.testing.assert_array_equal(a["views"], b["views"])
            np.testing.assert_array_equal(a["pc"], b["pc"])
            np.testing.assert_array_equal(a["pc_part"], b["pc_part"])

    def test_preload_random_view_uses_true_view_ids(self, vipc_root):
        ds = ViPCDataLoader(str(vipc_root / "train_list2.txt"),
                            str(vipc_root), status="train", category="plane",
                            preload=True, view_align=False)
        fname = ds.key[0].split(";")[1]
        assert ds.view_ids[fname] == list(range(24))
        item = ds[0]
        assert item["views"].shape == (224, 224, 3)
