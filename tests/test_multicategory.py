"""Class-conditional (multi-category) paths: label embeddings end-to-end."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldt_tpu.models import Compressor, Score
from ldt_tpu.tools.io import dict2namespace
from ldt_tpu.training import latent_sde_trainer

N_PTS = 64
BATCH = 4
N_CATES = 5


def cond_cfg(tmp_path):
    model = dict(
        outsize=N_PTS, max_outputs=N_PTS, input_dim=3, z_dim=4, z_scales=8,
        p_dim=16, n_layers=2, hidden_dim=32, num_heads=2, activation="swish",
        encoder_dropout_p=0.0, decoder_dropout_p=0.0, norm="layer_norm",
        neighbors=8, encoder_layers=1, mlp_ratio=2.0, min_sigma=-30,
        cluster_norm="anchor", norm_input=False, pre_group=False,
        decoder_act=None, ActNorm=True, AdaLN=True, pos_embedding="center",
        class_condition=True, num_categorys=N_CATES, pretrain_path=None)
    return dict2namespace(dict(
        data=dict(cates=["all"], num_categorys=N_CATES,
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
        common=dict(epochs=2, num_points=N_PTS, seed=0),
        model=model, compressor=model,
        score=dict(num_steps=8, z_dim=8, z_scale=8, hidden_size=32,
                   num_heads=4, num_blocks=2, num_categorys=N_CATES,
                   t_dim=16, dropout=0.0, norm="layer_norm",
                   learn_sigma=False, act="swish", unet=False, AdaLN=True,
                   condition=False),
        sde=dict(beta_start=0.1, beta_end=20.0, sde_type="vpsde",
                 sigma2_0=0.0, iw_sample_p_mode="drop_all_iw",
                 iw_sample_q_mode="drop_all_iw", time_eps=0.01, ode_tol=1e-4,
                 sample_time_eps=1e-6, sample_mode="discrete",
                 predictor="ancestral", corrector=None, train_N=8,
                 sample_N=64, snr=0.01, corrector_steps=1, denoise=True,
                 probability_flow=False, alpha=1.0),
    ))


def batch_with_labels(seed=0):
    rng = np.random.RandomState(seed)
    return {
        "tr_points": rng.randn(BATCH, N_PTS, 3).astype(np.float32),
        "te_points": rng.randn(BATCH, N_PTS, 3).astype(np.float32),
        "cate_idx": rng.randint(0, N_CATES, (BATCH,)).astype(np.int32),
        "shift": np.zeros((BATCH, 1, 3), np.float32),
        "scale": np.ones((BATCH, 1, 1), np.float32),
    }


class TestClassConditionalCompressor:
    def test_forward_uses_labels(self, tmp_path):
        cfg = cond_cfg(tmp_path)
        model = Compressor(cfg.model)
        pts = jnp.asarray(batch_with_labels()["tr_points"])
        labels = jnp.array([0, 1, 2, 3])
        variables = model.init(
            {"params": jax.random.key(0), "sample": jax.random.key(1)},
            pts, label=labels)
        assert "label_embedding" in variables["params"]
        out_a = model.apply(variables, pts, label=labels,
                            rngs={"sample": jax.random.key(2)})
        out_b = model.apply(variables, pts, label=labels[::-1],
                            rngs={"sample": jax.random.key(2)})
        # different labels change the decoded sets
        assert not np.allclose(np.asarray(out_a["set"]),
                               np.asarray(out_b["set"]))


class TestClassConditionalDiffusion:
    def test_update_and_label_sample(self, tmp_path):
        cfg = cond_cfg(tmp_path)
        t = latent_sde_trainer.Trainer(cfg, Score(cfg.score),
                                       Compressor(cfg.compressor))
        batch = batch_with_labels()
        loss = t.update(batch)
        assert np.isfinite(float(loss))
        labels = jnp.zeros((2,), jnp.int32)
        smp, eps = t.sample(num_samples=2, label=labels)
        assert smp.shape == (2, N_PTS, 3)
        assert np.isfinite(np.asarray(smp)).all()

    def test_valsample_per_category(self, tmp_path):
        cfg = cond_cfg(tmp_path)
        t = latent_sde_trainer.Trainer(cfg, Score(cfg.score),
                                       Compressor(cfg.compressor))
        batch = batch_with_labels()
        t.update(batch)
        # per-category valsample path (trainer/Latent_SDE_Trainer.py:188-205)
        cate = int(batch["cate_idx"][0])
        res = t.valsample([batch], val_cate=cate)
        assert "val/gen/mmd-CD" in res
