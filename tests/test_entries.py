"""End-to-end CLI smoke tests: tiny configs + fake ShapeNet data.

The three training stages and the offline eval run through their real
`main()` entry points (the reference's de-facto integration test is
training-time eval, SURVEY.md §4.5).
"""

import os
import sys

import numpy as np
import pytest
import yaml

import train_Compressor
import train_Hybrid
import train_Latent_Diffusion
import val_sample
from ldt_tpu.tools.io import dict2namespace

pytestmark = pytest.mark.slow

N_PTS = 64


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    """Fake 15k-point ShapeNet tree + tiny experiments configs."""
    root = tmp_path_factory.mktemp("ws")
    data_dir = root / "PC15k"
    rng = np.random.RandomState(0)
    for split in ("train", "val"):
        d = data_dir / "02691156" / split
        d.mkdir(parents=True)
        for i in range(3):
            np.save(d / f"m{i}.npy", rng.randn(15000, 3).astype(np.float32))
    return root


def tiny_cfg(root, trainer, extra):
    model = dict(
        outsize=N_PTS, max_outputs=N_PTS, input_dim=3, z_dim=4, z_scales=8,
        p_dim=16, n_layers=2, hidden_dim=32, num_heads=2, activation="swish",
        encoder_dropout_p=0.0, decoder_dropout_p=0.0, norm="layer_norm",
        neighbors=8, encoder_layers=1, mlp_ratio=2.0, min_sigma=-30,
        cluster_norm="anchor", norm_input=False, pre_group=False,
        decoder_act=None, ActNorm=True, AdaLN=True, pos_embedding="center",
        class_condition=False, num_categorys=1, pretrain_path=None)
    cfg = dict(
        data=dict(cates=["airplane"], num_categorys=1,
                  tr_max_sample_points=N_PTS, te_max_sample_points=N_PTS,
                  data_dir=str(root / "PC15k"), batch_size=2,
                  test_batch_size=2, boundary=True, num_workers=0),
        opt=dict(adj_lr="warm_up", warmup_iters=2, lr=1e-3, beta1=0.9,
                 beta2=0.999, ema_decay=0.99, weight_decay=0.0,
                 grad_norm_clip_value=1.0, kl_weight=1e-6, loss_type="l2",
                 discrete=True, compressor_beta1=0.9, compressor_beta2=0.999,
                 compressor_warmup=0, alpha=0.1, pretrain_path=None),
        log=dict(save_epoch_freq=1,
                 save_path=str(root / "experiments" / trainer / "airplane"),
                 log_epoch_freq=1, eval_epoch_freq=1000, **extra),
        common=dict(epochs=2, num_points=N_PTS, seed=0),
        model=model, compressor=model,
        score=dict(num_steps=8, z_dim=8, z_scale=8, hidden_size=32,
                   num_heads=4, num_blocks=2, num_categorys=1, t_dim=16,
                   dropout=0.0, norm="layer_norm", learn_sigma=False,
                   act="swish", unet=False, AdaLN=True, condition=False),
        sde=dict(beta_start=0.1, beta_end=20.0, sde_type="vpsde",
                 sigma2_0=0.0, iw_sample_p_mode="drop_all_iw",
                 iw_sample_q_mode="drop_all_iw", time_eps=0.01, ode_tol=1e-4,
                 sample_time_eps=1e-6, sample_mode="discrete",
                 predictor="ancestral", corrector=None, train_N=8,
                 sample_N=64, snr=0.01, corrector_steps=1, denoise=True,
                 probability_flow=False, alpha=1.0),
    )
    os.makedirs(cfg["log"]["save_path"], exist_ok=True)
    return dict2namespace(cfg)


def make_args(**over):
    base = dict(dataset="airplane", save="experiments", resume=False,
                resume_epoch=None, load_optimizer=True, evaluate=False,
                strict=True, finetune=False, eval_split="val")
    base.update(over)
    return dict2namespace(base)


TRAIN_LOG = dict(traincolumns=["epoch", "itr", "loss", "kl_loss", "rec_loss",
                               "max_feature", "time"],
                 trainformat=[None, None, "{:.4f}", "{:.4f}", "{:.4f}",
                              "{:.4f}", "{:.0f}"],
                 evalcolumns=["epoch", "mmd-CD"],
                 evalformat=[None, "{:.8f}"])
SDE_LOG = dict(traincolumns=["epoch", "itr", "loss", "time"],
               trainformat=[None, None, "{:.4f}", "{:.0f}"],
               evalcolumns=["epoch", "mmd-CD"],
               evalformat=[None, "{:.8f}"])
HYBRID_LOG = dict(traincolumns=["epoch", "itr", "loss_score", "kl", "rec",
                                "time"],
                  trainformat=[None, None, "{:.4f}", "{:.4f}", "{:.4f}",
                               "{:.0f}"],
                  evalcolumns=["epoch", "mmd-CD"],
                  evalformat=[None, "{:.8f}"])


class TestEntryPoints:
    def test_stage1_then_stage2(self, workspace):
        cfg1 = tiny_cfg(workspace, "Compressor_Trainer", TRAIN_LOG)
        train_Compressor.main(make_args(), cfg1)
        save1 = cfg1.log.save_path
        assert os.path.exists(os.path.join(save1, "training.csv"))
        ckpts = [f for f in os.listdir(save1) if f.startswith("checkpt_")]
        assert ckpts, "stage-1 produced no checkpoints"

        cfg2 = tiny_cfg(workspace, "Latent_Diffusion_Trainer", SDE_LOG)
        cfg2.compressor.pretrain_path = os.path.join(save1, sorted(ckpts)[-1])
        train_Latent_Diffusion.main(make_args(), cfg2)
        assert os.path.exists(os.path.join(cfg2.log.save_path, "training.csv"))

    def test_hybrid(self, workspace):
        cfg = tiny_cfg(workspace, "Hybrid_Trainer", HYBRID_LOG)
        train_Hybrid.main(make_args(), cfg)
        rows = open(os.path.join(cfg.log.save_path,
                                 "training.csv")).read().strip().split("\n")
        assert len(rows) >= 2  # header + >=1 epoch row

    def test_val_cate_plumbed(self, workspace, monkeypatch):
        """--val_cate / cfg.common.val_cate reaches valsample (the reference
        hard-codes 14/13 at train_Latent_Diffusion.py:60,85)."""
        from ldt_tpu.training.latent_sde_trainer import Trainer

        seen = {}

        def fake_valsample(self, test_loader, val_cate=0, vis=False):
            seen["val_cate"] = val_cate
            return {"val/gen/mmd-CD": 0.0}

        monkeypatch.setattr(Trainer, "valsample", fake_valsample)
        monkeypatch.setattr(Trainer, "load_pretrain", lambda self: None)
        cfg = tiny_cfg(workspace, "Latent_Diffusion_Trainer", SDE_LOG)
        train_Latent_Diffusion.main(
            make_args(evaluate=True, val_cate=7), cfg)
        assert seen["val_cate"] == 7
        # config fallback when the CLI flag is absent
        cfg2 = tiny_cfg(workspace, "Latent_Diffusion_Trainer", SDE_LOG)
        cfg2.common.val_cate = 3
        train_Latent_Diffusion.main(make_args(evaluate=True), cfg2)
        assert seen["val_cate"] == 3

    def test_hybrid_load_pretrain_rejects_non_dual(self, workspace):
        """A stage-1 (compressor-only) checkpoint at opt.pretrain_path must
        fail loudly, not start the finetune from random score weights."""
        import jax

        from ldt_tpu.data import get_data_loaders
        from ldt_tpu.models import Compressor, Score
        from ldt_tpu.training.checkpoint import save_checkpoint
        from ldt_tpu.training.hybrid_trainer import Trainer

        cfg = tiny_cfg(workspace, "Hybrid_Trainer", HYBRID_LOG)
        loaders = get_data_loaders(cfg.data, make_args())
        trainer = Trainer(cfg, model=Score(cfg.score),
                          compressor=Compressor(cfg.compressor))
        trainer.maybe_init(next(iter(loaders["train_loader"])))
        bad = os.path.join(cfg.log.save_path, "stage1.msgpack")
        save_checkpoint(bad, {"state": jax.device_get(trainer.comp_state)},
                        cfg=cfg, epoch=1, itr=0, time=0.0)
        cfg.opt.pretrain_path = bad
        with pytest.raises(ValueError, match="DUAL"):
            trainer.load_pretrain()

    def test_hybrid_valrecon(self, workspace):
        """Hybrid reconstruction eval (reference Hybrid_Trainer.py:249-307;
        we use the compressor where the reference's single-category branch
        mistakenly calls the score net on raw points)."""
        cfg = tiny_cfg(workspace, "Hybrid_Trainer", HYBRID_LOG)
        from ldt_tpu.data import get_data_loaders
        from ldt_tpu.models import Compressor, Score
        from ldt_tpu.training.hybrid_trainer import Trainer

        loaders = get_data_loaders(cfg.data, make_args())
        trainer = Trainer(cfg, model=Score(cfg.score),
                          compressor=Compressor(cfg.compressor))
        trainer.maybe_init(next(iter(loaders["train_loader"])))
        res = trainer.valrecon(loaders["test_loader"])
        assert np.isfinite(res["val/gen/mmd-CD"])
        assert os.path.exists(os.path.join(
            cfg.log.save_path, f"rec_ep{trainer.epoch}.npy"))

    def test_val_sample(self, workspace, monkeypatch, tmp_path):
        # generated samples identical to refs -> near-perfect metrics
        monkeypatch.chdir(tmp_path)
        cfg = tiny_cfg(workspace, "Latent_Diffusion_Trainer", SDE_LOG)
        from ldt_tpu.data import get_data_loaders
        loaders = get_data_loaders(cfg.data, make_args())
        refs = np.concatenate([b["te_points"]
                               for b in loaders["test_loader"]])
        os.makedirs("test/smp/airplane", exist_ok=True)
        np.save("test/smp/airplane/gen.npy", refs)
        args = dict2namespace(dict(sample="gen.npy", dataset="airplane",
                                   sample_path="smp", norm=False,
                                   eval_split="val"))
        res = val_sample.main(args, cfg)
        assert res["val/gen/mmd-CD"] < 1e-4
        assert os.path.exists("val.txt")
