"""Continuous-ODE trainer sampling + CSV-driven latest-epoch resume."""

import os

import jax
import numpy as np
import pytest

from ldt_tpu.models import Compressor, Score
from ldt_tpu.tools.io import dict2namespace
from ldt_tpu.tools.log import logger as csv_logger
from ldt_tpu.training import compressor_trainer, latent_sde_trainer

N_PTS = 64
BATCH = 4


def make_cfg(tmp_path, sample_mode="discrete"):
    model = dict(
        outsize=N_PTS, max_outputs=N_PTS, input_dim=3, z_dim=4, z_scales=8,
        p_dim=16, n_layers=2, hidden_dim=32, num_heads=2, activation="swish",
        encoder_dropout_p=0.0, decoder_dropout_p=0.0, norm="layer_norm",
        neighbors=8, encoder_layers=1, mlp_ratio=2.0, min_sigma=-30,
        cluster_norm="anchor", norm_input=False, pre_group=False,
        decoder_act=None, ActNorm=True, AdaLN=True, pos_embedding="center",
        class_condition=False, num_categorys=1, pretrain_path=None)
    return dict2namespace(dict(
        data=dict(cates=["airplane"], num_categorys=1,
                  tr_max_sample_points=N_PTS, te_max_sample_points=N_PTS,
                  batch_size=BATCH, test_batch_size=BATCH, boundary=True,
                  num_workers=0),
        opt=dict(adj_lr="warm_up", warmup_iters=2, lr=1e-3, beta1=0.9,
                 beta2=0.999, ema_decay=0.99, weight_decay=0.0,
                 grad_norm_clip_value=1.0, kl_weight=1e-6, loss_type="l2",
                 discrete=True),
        log=dict(save_epoch_freq=1, save_path=str(tmp_path),
                 traincolumns=["epoch", "itr", "loss", "time"],
                 trainformat=[None, None, "{:.4f}", "{:.0f}"],
                 evalcolumns=["epoch", "mmd-CD"],
                 evalformat=[None, "{:.8f}"],
                 log_epoch_freq=1, eval_epoch_freq=1000),
        common=dict(epochs=3, num_points=N_PTS, seed=0),
        model=model, compressor=model,
        score=dict(num_steps=8, z_dim=8, z_scale=8, hidden_size=32,
                   num_heads=4, num_blocks=2, num_categorys=1, t_dim=16,
                   dropout=0.0, norm="layer_norm", learn_sigma=False,
                   act="swish", unet=False, AdaLN=True, condition=False),
        sde=dict(beta_start=0.1, beta_end=20.0, sde_type="vpsde",
                 sigma2_0=0.0, iw_sample_p_mode="drop_all_iw",
                 iw_sample_q_mode="drop_all_iw", time_eps=0.01, ode_tol=1e-3,
                 sample_time_eps=1e-5, sample_mode=sample_mode,
                 predictor="ancestral", corrector=None, train_N=8,
                 sample_N=64, snr=0.01, corrector_steps=1, denoise=True,
                 probability_flow=False, alpha=1.0),
    ))


def fake_batch(seed=0):
    rng = np.random.RandomState(seed)
    return {"tr_points": rng.randn(BATCH, N_PTS, 3).astype(np.float32),
            "te_points": rng.randn(BATCH, N_PTS, 3).astype(np.float32),
            "cate_idx": np.zeros((BATCH,), np.int32)}


def test_continuous_ode_sampling_through_trainer(tmp_path):
    """sample_mode='continuous' routes through the on-device RK45
    (trainer/Latent_SDE_Trainer.py:148-152 path)."""
    cfg = make_cfg(tmp_path, sample_mode="continuous")
    t = latent_sde_trainer.Trainer(cfg, Score(cfg.score),
                                   Compressor(cfg.compressor))
    t.maybe_init(fake_batch())
    smp, eps = t.sample(num_samples=2)
    assert smp.shape == (2, N_PTS, 3)
    assert np.isfinite(np.asarray(smp)).all()


@pytest.mark.slow
def test_resume_latest_epoch_from_csv(tmp_path):
    """resume(epoch=None) reads the last epoch from training.csv
    (trainer/Compressor_Trainer.py:163-167)."""
    cfg = make_cfg(tmp_path)
    t = compressor_trainer.Trainer(cfg, Compressor(cfg.model))
    batch = fake_batch()
    t.update(batch)
    # save checkpoints for epochs 1 and 2 and log both to the CSV
    t.epoch = 1
    t.save()
    t.write_log([1, t.itr, 0.5, 0.0], mode="train")
    t.update(batch)
    t.epoch = 2
    t.save()
    t.write_log([2, t.itr, 0.4, 0.0], mode="train")

    t2 = compressor_trainer.Trainer(cfg, Compressor(cfg.model),
                                    rng=jax.random.key(9))
    t2.maybe_init(batch)
    t2.resume()  # epoch=None -> CSV says 2
    assert t2.epoch == 3
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(t.state.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(t2.state.params)[0]))
