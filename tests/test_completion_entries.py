"""End-to-end CLI smoke tests for the completion entries.

Mirrors tests/test_entries.py for `train_Completion_Compressor.py` and
`train_Completion_Latent_Diffusion.py`: tiny synthetic ViPC tree, real
`main()` calls, CSV/eval/checkpoint artifacts asserted (the eval rows are
the reference's try/except write contract,
train_Completion_Compressor.py:84-87)."""

import os
import pickle

import numpy as np
import pytest
import yaml

import train_Completion_Compressor
import train_Completion_Latent_Diffusion
from ldt_tpu.tools.io import dict2namespace

pytestmark = pytest.mark.slow

SYNSET = "02691156"
N_PTS = 64


@pytest.fixture(scope="module")
def ws(tmp_path_factory):
    pytest.importorskip("PIL")
    from PIL import Image

    root = tmp_path_factory.mktemp("vipc_entries")
    rng = np.random.RandomState(0)
    lines = []
    for mid in ("modelA", "modelB", "modelC"):
        gt_dir = root / "ShapeNetViPC-GT" / SYNSET / mid
        part_dir = root / "ShapeNetViPC-Partial" / SYNSET / mid
        view_dir = root / "ShapeNetViPC-View" / SYNSET / mid / "rendering"
        for d in (gt_dir, part_dir, view_dir):
            d.mkdir(parents=True)
        meta = np.zeros((24, 5), np.float32)
        meta[:, 0] = np.arange(24) * 15.0
        meta[:, 1] = 25.0
        np.savetxt(str(root / "ShapeNetViPC-View" / SYNSET / mid /
                       "rendering" / "rendering_metadata.txt"), meta)
        for v in range(24):
            vv = str(v).rjust(2, "0")
            with open(gt_dir / f"{vv}.dat", "wb") as f:
                pickle.dump(rng.randn(300, 3).astype(np.float32), f)
            with open(part_dir / f"{vv}.dat", "wb") as f:
                pickle.dump(rng.randn(100, 3).astype(np.float32), f)
            Image.fromarray((rng.rand(16, 16, 3) * 255).astype(
                np.uint8)).save(view_dir / f"{vv}.png")
        lines.append(f"{SYNSET};{mid};00\n")
    for split in ("train_list2.txt", "test_list2.txt"):
        with open(root / split, "w") as f:
            f.writelines(lines)
    return root


def _cfg(root, save_root, trainer, pretrain=None):
    model = dict(
        outsize=N_PTS, max_outputs=N_PTS, input_dim=3, z_dim=4, z_scales=8,
        p_dim=16, n_layers=2, hidden_dim=32, num_heads=2, activation="swish",
        encoder_dropout_p=0.0, decoder_dropout_p=0.0, norm="layer_norm",
        neighbors=8, encoder_layers=1, mlp_ratio=2.0, min_sigma=-30,
        cluster_norm="anchor", norm_input=False, pre_group=False,
        decoder_act=None, ActNorm=True, AdaLN=True, pos_embedding="center",
        class_condition=False, num_categorys=1, pretrain_path=pretrain)
    save_path = os.path.join(save_root, trainer, "completion", "plane")
    cfg = dict(
        data=dict(type="ldt_tpu.data.vipc", train_cate="plane",
                  test_cate="plane", train_preload=False, test_preload=False,
                  data_dir=str(root), train_list=str(root / "train_list2.txt"),
                  test_list=str(root / "test_list2.txt"),
                  tr_max_sample_points=N_PTS, te_max_sample_points=N_PTS,
                  batch_size=3, test_batch_size=3, num_categorys=1,
                  num_workers=0),
        opt=dict(adj_lr="warm_up", warmup_iters=2, lr=1e-3, beta1=0.9,
                 beta2=0.999, ema_decay=0.99, weight_decay=0.0,
                 grad_norm_clip_value=1.0, kl_weight=1e-6, loss_type="l2",
                 discrete=True),
        log=dict(save_epoch_freq=1, save_path=save_path, log_epoch_freq=1,
                 eval_epoch_freq=1,
                 traincolumns=(["epoch", "itr", "loss", "kl_loss", "rec_loss",
                                "max_feature", "time"]
                               if trainer == "Compressor_Trainer"
                               else ["epoch", "itr", "loss", "time"]),
                 trainformat=([None, None] + ["{:.4f}"] * 4 + ["{:.0f}"]
                              if trainer == "Compressor_Trainer"
                              else [None, None, "{:.4f}", "{:.0f}"]),
                 evalcolumns=(["epoch", "cd", "f1score"]
                              if trainer == "Compressor_Trainer"
                              else ["epoch", "cd", "f1"]),
                 evalformat=[None, "{:.8f}", "{:.8f}"]),
        common=dict(epochs=2, num_points=N_PTS, seed=0),
        model=model, compressor=model,
        score=dict(num_steps=8, z_dim=8, z_scale=8, hidden_size=32,
                   num_heads=4, num_blocks=2, num_categorys=1, t_dim=16,
                   dropout=0.0, norm="layer_norm", learn_sigma=False,
                   act="swish", unet=False, AdaLN=True, condition=True),
        sde=dict(beta_start=0.1, beta_end=20.0, sde_type="vpsde",
                 sigma2_0=0.0, iw_sample_p_mode="drop_all_iw",
                 iw_sample_q_mode="drop_all_iw", time_eps=0.01, ode_tol=1e-4,
                 sample_time_eps=1e-6, sample_mode="discrete",
                 predictor="ancestral", corrector=None, train_N=8,
                 sample_N=64, snr=0.01, corrector_steps=1, denoise=True,
                 probability_flow=False, alpha=1.0),
    )
    os.makedirs(save_path, exist_ok=True)
    with open(os.path.join(save_path, "config.yaml"), "w") as f:
        yaml.safe_dump(cfg, f)
    return dict2namespace(cfg)


def _args(save):
    return dict2namespace(dict(
        dataset="plane", trainer_type=None, save=str(save), resume=False,
        resume_epoch=None, load_optimizer=True, evaluate=False, strict=True,
        finetune=False))


def _seed_stage1_checkpoint(cfg, ws):
    """Write a stage-1-format compressor checkpoint for the completion
    finetune to load_pretrain from (the real workflow chains from a
    `train_Compressor.py` run; reference train_Completion_Compressor.py:38)."""
    import jax

    from ldt_tpu.training.completion_compressor_trainer import (
        Trainer,
        fps_to,
    )

    seed_dir = os.path.join(os.path.dirname(cfg.log.save_path), "seed")
    os.makedirs(seed_dir, exist_ok=True)
    seed_cfg = dict2namespace(
        yaml.safe_load(open(os.path.join(cfg.log.save_path, "config.yaml"))))
    seed_cfg.log.save_path = seed_dir
    tr = Trainer(seed_cfg, __import__("ldt_tpu.models", fromlist=["x"]
                                      ).Compressor(seed_cfg.model),
                 rng=jax.random.key(7))
    pc = np.asarray(fps_to(np.random.RandomState(3).randn(
        2, 128, 3).astype(np.float32), N_PTS))
    tr.maybe_init({"tr_points": pc, "cate_idx": np.zeros((2,), np.int32)})
    tr.save()
    ckpt = sorted(f for f in os.listdir(seed_dir)
                  if f.startswith("checkpt_") and f.endswith(".msgpack"))[-1]
    return os.path.join(seed_dir, ckpt)


def test_completion_stage1_then_stage2_entries(ws, tmp_path):
    cfg1 = _cfg(ws, str(tmp_path), "Compressor_Trainer")
    cfg1.model.pretrain_path = _seed_stage1_checkpoint(cfg1, ws)
    train_Completion_Compressor.main(_args(tmp_path), cfg1)
    s1 = cfg1.log.save_path
    assert os.path.exists(os.path.join(s1, "training.csv"))
    # eval rows written (reference try/except contract)
    with open(os.path.join(s1, "eval.csv")) as f:
        assert len(f.readlines()) >= 2
    ckpts = sorted(f for f in os.listdir(s1) if f.startswith("checkpt_"))
    assert ckpts

    cfg2 = _cfg(ws, str(tmp_path), "Latent_Diffusion_Trainer",
                pretrain=os.path.join(s1, ckpts[-1]))
    train_Completion_Latent_Diffusion.main(_args(tmp_path), cfg2)
    s2 = cfg2.log.save_path
    assert os.path.exists(os.path.join(s2, "training.csv"))
    with open(os.path.join(s2, "eval.csv")) as f:
        assert len(f.readlines()) >= 2
