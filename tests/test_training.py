"""End-to-end trainer tests on synthetic data (tiny configs, CPU).

Covers the reference's training-time integration-test role (SURVEY.md §4.5):
stage-1 VAE steps, stage-2 score steps with EMA, sampling, checkpointing and
resume.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldt_tpu.models import Compressor, Score
from ldt_tpu.tools.io import dict2namespace
from ldt_tpu.training import compressor_trainer, latent_sde_trainer
from ldt_tpu.training.state import make_lr_fn


N_PTS = 64
BATCH = 4


def make_cfg(tmp_path, **log_over):
    model = dict(
        outsize=N_PTS, max_outputs=N_PTS, input_dim=3, z_dim=4, z_scales=8,
        p_dim=16, n_layers=2, hidden_dim=32, num_heads=2, activation="swish",
        encoder_dropout_p=0.0, decoder_dropout_p=0.0, norm="layer_norm",
        neighbors=8, encoder_layers=1, mlp_ratio=2.0, min_sigma=-30,
        cluster_norm="anchor", norm_input=False, pre_group=False,
        decoder_act=None, ActNorm=True, AdaLN=True, pos_embedding="center",
        class_condition=False, num_categorys=1, pretrain_path=None,
    )
    cfg = dict(
        data=dict(cates=["airplane"], num_categorys=1,
                  tr_max_sample_points=N_PTS, te_max_sample_points=N_PTS,
                  batch_size=BATCH, test_batch_size=BATCH, boundary=True,
                  num_workers=0),
        opt=dict(adj_lr="warm_up", warmup_iters=4, lr=1e-3, beta1=0.9,
                 beta2=0.999, ema_decay=0.99, weight_decay=0.0,
                 grad_norm_clip_value=1.0, kl_weight=1e-6, loss_type="l2",
                 discrete=True),
        log=dict(save_epoch_freq=1, save_path=str(tmp_path),
                 traincolumns=["epoch", "itr", "loss", "time"],
                 trainformat=[None, None, "{:.4f}", "{:.0f}"],
                 evalcolumns=["epoch", "mmd-CD"],
                 evalformat=[None, "{:.8f}"],
                 log_epoch_freq=1, eval_epoch_freq=100),
        common=dict(epochs=4, num_points=N_PTS, seed=0),
        model=model,
        compressor=model,
        score=dict(num_steps=8, z_dim=8, z_scale=8, hidden_size=32,
                   num_heads=4, num_blocks=2, num_categorys=1, t_dim=16,
                   dropout=0.0, norm="layer_norm", learn_sigma=False,
                   act="swish", unet=False, AdaLN=True, condition=False),
        sde=dict(beta_start=0.1, beta_end=20.0, sde_type="vpsde",
                 sigma2_0=0.0, iw_sample_p_mode="drop_all_iw",
                 iw_sample_q_mode="drop_all_iw", time_eps=0.01,
                 ode_tol=1e-4, sample_time_eps=1e-6, sample_mode="discrete",
                 # sample_N must keep beta_end / N < 1 for the discrete
                 # ancestral tables (diffusion_continuous.py:649-653)
                 predictor="ancestral", corrector=None, train_N=8,
                 sample_N=64, snr=0.01, corrector_steps=1, denoise=True,
                 probability_flow=False, alpha=1.0),
    )
    return dict2namespace(cfg)


def fake_batch(seed=0):
    rng = np.random.RandomState(seed)
    return {
        "tr_points": rng.randn(BATCH, N_PTS, 3).astype(np.float32),
        "te_points": rng.randn(BATCH, N_PTS, 3).astype(np.float32),
        "cate_idx": np.zeros((BATCH,), np.int32),
        "shift": np.zeros((BATCH, 1, 3), np.float32),
        "scale": np.ones((BATCH, 1, 1), np.float32),
    }


class TestLrSchedule:
    def test_warmup_then_cosine(self):
        lr_fn = make_lr_fn(1.0, warmup_iters=10, epochs=100)
        assert lr_fn(0, 1) == pytest.approx(0.1)
        assert lr_fn(9, 1) == pytest.approx(1.0)
        assert lr_fn(50, 50) == pytest.approx(0.5, abs=1e-6)
        assert lr_fn(50, 100) == pytest.approx(0.0, abs=1e-9)


class TestCompressorTrainer:
    @pytest.fixture()
    def trainer(self, tmp_path):
        cfg = make_cfg(tmp_path)
        return compressor_trainer.Trainer(cfg, Compressor(cfg.model))

    def test_update_decreases_loss(self, trainer):
        batch = fake_batch()
        losses = []
        for i in range(5):
            loss, kl, rec, max_f = trainer.update(batch)
            losses.append(float(loss))
            assert np.isfinite(losses[-1])
        assert trainer.itr == 5
        assert losses[-1] < losses[0]

    def test_sample_shape(self, trainer):
        trainer.maybe_init(fake_batch())
        smp = trainer.sample(3, N_PTS)
        assert smp.shape == (3, N_PTS, 3)

    def test_save_resume_roundtrip(self, trainer, tmp_path):
        batch = fake_batch()
        trainer.update(batch)
        trainer.update(batch)
        trainer.epoch = 3
        trainer.save()
        p_before = jax.tree_util.tree_leaves(trainer.state.params)[0].copy()

        # a fresh trainer with different init resumes to identical params
        cfg = trainer.cfg
        t2 = compressor_trainer.Trainer(cfg, Compressor(cfg.model),
                                        rng=jax.random.key(123))
        t2.maybe_init(batch)
        t2.resume(epoch=3)
        p_after = jax.tree_util.tree_leaves(t2.state.params)[0]
        np.testing.assert_allclose(np.asarray(p_before), np.asarray(p_after))
        assert t2.epoch == 4
        assert t2.itr == 2

    def test_reconstruction_runs(self, trainer, tmp_path):
        batch = fake_batch()
        trainer.maybe_init(batch)
        res = trainer.reconstruction([batch])
        assert "val/gen/mmd-CD" in res


class TestLatentSDETrainer:
    @pytest.fixture()
    def trainer(self, tmp_path):
        cfg = make_cfg(tmp_path)
        return latent_sde_trainer.Trainer(cfg, Score(cfg.score),
                                          Compressor(cfg.compressor))

    def test_update_and_ema(self, trainer):
        batch = fake_batch()
        for _ in range(3):
            loss = trainer.update(batch)
            assert np.isfinite(float(loss))
        # EMA params must differ from raw params but stay close
        p = jax.tree_util.tree_leaves(trainer.state.params)[0]
        e = jax.tree_util.tree_leaves(trainer.state.ema_params)[0]
        assert not np.allclose(np.asarray(p), np.asarray(e))

    def test_continuous_iw_update(self, tmp_path):
        cfg = make_cfg(tmp_path)
        cfg.opt.discrete = False
        t = latent_sde_trainer.Trainer(cfg, Score(cfg.score),
                                       Compressor(cfg.compressor))
        loss = t.update(fake_batch())
        assert np.isfinite(float(loss))

    def test_val_loss(self, trainer):
        batch = fake_batch()
        trainer.update(batch)
        assert np.isfinite(float(trainer.val_loss(batch)))

    def test_sample_end_to_end(self, trainer):
        trainer.maybe_init(fake_batch())
        smp, eps = trainer.sample(num_samples=2)
        assert smp.shape == (2, N_PTS, 3)
        assert eps.shape == (2, 8, 8)
        assert np.isfinite(np.asarray(smp)).all()

    def test_pretrain_load(self, trainer, tmp_path):
        # stage-1 checkpoint -> stage-2 load_pretrain
        cfg = trainer.cfg
        ct = compressor_trainer.Trainer(cfg, Compressor(cfg.model))
        batch = fake_batch()
        ct.update(batch)
        ct.epoch = 1
        ct.save()
        cfg.compressor.pretrain_path = os.path.join(
            cfg.log.save_path, "checkpt_1.msgpack")
        trainer.maybe_init(batch)
        trainer.load_pretrain()
        want = jax.tree_util.tree_leaves(ct.state.params)[0]
        got = jax.tree_util.tree_leaves(trainer.comp_vars["params"])[0]
        np.testing.assert_allclose(np.asarray(want), np.asarray(got))

    def test_save_resume(self, trainer, tmp_path):
        batch = fake_batch()
        trainer.update(batch)
        trainer.epoch = 2
        trainer.save()
        cfg = trainer.cfg
        t2 = latent_sde_trainer.Trainer(cfg, Score(cfg.score),
                                        Compressor(cfg.compressor),
                                        rng=jax.random.key(77))
        t2.maybe_init(batch)
        t2.resume(epoch=2)
        np.testing.assert_allclose(
            np.asarray(jax.tree_util.tree_leaves(trainer.state.params)[0]),
            np.asarray(jax.tree_util.tree_leaves(t2.state.params)[0]))
        assert t2.epoch == 3
        # restored state must be DEVICE-resident: a host numpy leaf makes
        # every jitted call re-upload the whole tree (measured ~36 s/call
        # for the flagship score state over the TPU transport — sampling
        # flows never write state back, so they pay it per call)
        for tree in (t2.state, t2.comp_vars):
            for leaf in jax.tree_util.tree_leaves(tree):
                assert not isinstance(leaf, np.ndarray), (
                    "resume left a host numpy leaf in the train state")


class TestMixedPrecision:
    """common.train_dtype: 'bfloat16' = mixed precision (f32 params, bf16
    compute); models are constructed with dtype=train_dtype(cfg) by every
    entry. The stage-2 score update is otherwise f32-MXU-bound on TPU."""

    def test_train_dtype_knob(self, tmp_path):
        from ldt_tpu.tools.utils import train_dtype

        cfg = make_cfg(tmp_path)
        assert train_dtype(cfg) == jnp.float32
        cfg.common.train_dtype = "bfloat16"
        assert train_dtype(cfg) == jnp.bfloat16
        cfg.common.train_dtype = "fp17"
        with pytest.raises(ValueError, match="train_dtype"):
            train_dtype(cfg)

    def test_bf16_stage2_step_matches_f32(self, tmp_path):
        batch = fake_batch()
        losses = {}
        for name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
            cfg = make_cfg(tmp_path / name)
            tr = latent_sde_trainer.Trainer(
                cfg, model=Score(cfg.score, dtype=dt),
                compressor=Compressor(cfg.compressor, dtype=dt),
                rng=jax.random.key(0))
            tr.maybe_init(batch)
            # params are MASTER f32 regardless of the compute dtype
            for leaf in jax.tree_util.tree_leaves(tr.state.params):
                assert leaf.dtype == jnp.float32
            ls = [float(tr.update(batch)) for _ in range(3)]
            assert all(np.isfinite(v) for v in ls)
            losses[name] = ls
        # same seeds and data: bf16 compute tracks the f32 losses closely
        np.testing.assert_allclose(losses["bf16"], losses["f32"],
                                   rtol=0.05, atol=0.02)

    def test_bf16_stage1_step(self, tmp_path):
        cfg = make_cfg(tmp_path)
        tr = compressor_trainer.Trainer(
            cfg, Compressor(cfg.model, dtype=jnp.bfloat16))
        loss, kl, rec, max_f = tr.update(fake_batch())
        assert np.isfinite(float(loss))
        for leaf in jax.tree_util.tree_leaves(tr.state.params):
            assert leaf.dtype == jnp.float32


class TestMomentDtype:
    """opt.moment_dtype: Adam moment STORAGE precision (state.py::
    scale_by_adam_q). f32 keeps stock optax; bf16 halves the per-step
    mu/nu HBM traffic of the flagship update (the measured bottleneck)."""

    def _tx(self, md):
        from ldt_tpu.training.state import make_optimizer

        return make_optimizer(0.9, 0.999, 0.0, None, moment_dtype=md)

    def test_adam_q_f32_matches_optax(self):
        """The custom transform at f32 is numerically the stock optax adam
        (same bias correction / eps placement) over a multi-step run."""
        import optax

        from ldt_tpu.training.state import scale_by_adam_q

        params = {"w": jnp.asarray(np.random.RandomState(0).randn(8, 4),
                                   jnp.float32),
                  "b": jnp.zeros((4,), jnp.float32)}
        tx_ref = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)
        tx_q = scale_by_adam_q(0.9, 0.999, 1e-8, "float32")
        s_ref, s_q = tx_ref.init(params), tx_q.init(params)
        rng = np.random.RandomState(1)
        for _ in range(10):
            g = jax.tree_util.tree_map(
                lambda p: jnp.asarray(rng.randn(*p.shape), jnp.float32),
                params)
            u_ref, s_ref = tx_ref.update(g, s_ref, params)
            u_q, s_q = tx_q.update(g, s_q, params)
            jax.tree_util.tree_map(
                lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5,
                                                        atol=1e-7),
                u_ref, u_q)

    def test_bf16_moments_track_f32(self):
        """bf16 moment storage: same least-squares problem converges to the
        f32 trajectory within a few percent; state dtypes are bf16."""
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(64, 16), jnp.float32)
        w_true = jnp.asarray(rng.randn(16, 4), jnp.float32)
        y = x @ w_true

        def loss_fn(w):
            return jnp.mean(jnp.square(x @ w - y))

        finals = {}
        for md in ("float32", "bfloat16"):
            tx = self._tx(md)
            w = jnp.zeros((16, 4), jnp.float32)
            opt_state = tx.init(w)
            for _ in range(200):
                loss, g = jax.value_and_grad(loss_fn)(w)
                u, opt_state = tx.update(g, opt_state, w)
                w = w - 0.05 * u
            finals[md] = float(loss_fn(w))
            if md == "bfloat16":
                adam_state = opt_state[0]  # chain: (scale_by_adam_q,)
                for leaf in jax.tree_util.tree_leaves(adam_state.mu):
                    assert leaf.dtype == jnp.bfloat16
                for leaf in jax.tree_util.tree_leaves(adam_state.nu):
                    assert leaf.dtype == jnp.bfloat16
        assert finals["bfloat16"] < 1e-2, finals
        np.testing.assert_allclose(finals["bfloat16"], finals["float32"],
                                   rtol=0.5, atol=1e-3)

    def test_stage2_trainer_bf16_moments_and_resume(self, tmp_path):
        """Trainer integration: losses track the f32 run; a checkpoint
        save/resume round-trips the bf16 moment dtype; and an f32-moment
        checkpoint restores into a bf16-moment config (restore_into's dtype
        recast)."""
        from ldt_tpu.training.checkpoint import (
            load_checkpoint,
            restore_into,
            save_checkpoint,
        )

        batch = fake_batch()
        losses = {}
        trainers = {}
        for md in ("float32", "bfloat16"):
            cfg = make_cfg(tmp_path / md)
            cfg.opt.moment_dtype = md
            tr = latent_sde_trainer.Trainer(
                cfg, model=Score(cfg.score),
                compressor=Compressor(cfg.compressor),
                rng=jax.random.key(0))
            tr.maybe_init(batch)
            losses[md] = [float(tr.update(batch)) for _ in range(3)]
            trainers[md] = tr
        np.testing.assert_allclose(losses["bfloat16"], losses["float32"],
                                   rtol=0.05, atol=0.02)

        tr = trainers["bfloat16"]
        path = os.path.join(str(tmp_path), "m.msgpack")
        save_checkpoint(path, {"state": tr.state}, epoch=1, itr=1, time=0.0)
        restored = restore_into({"state": tr.state},
                                load_checkpoint(path)["state"])["state"]
        mds = {leaf.dtype
               for leaf in jax.tree_util.tree_leaves(restored.opt_state)
               if hasattr(leaf, "dtype") and leaf.ndim > 0}
        assert jnp.dtype(jnp.bfloat16) in mds, mds

        # f32-moment checkpoint -> bf16-moment template: recast, not error
        tr32 = trainers["float32"]
        path32 = os.path.join(str(tmp_path), "m32.msgpack")
        save_checkpoint(path32, {"state": tr32.state}, epoch=1, itr=1,
                        time=0.0)
        cross = restore_into({"state": tr.state},
                             load_checkpoint(path32)["state"])["state"]
        adam_state = cross.opt_state[1]  # chain: (clip, adam)
        for leaf in jax.tree_util.tree_leaves(adam_state.mu):
            assert leaf.dtype == jnp.bfloat16


class TestTrainFusedWedgeGuard:
    """The fused-bwd TRAIN-step compile wedge guard (VERDICT r4 weak #1).

    Flagship-scale update programs (457M score, B=64) have hung the tunnel
    compiler indefinitely; resolve_train_fused must auto-fallback there
    with NO environment variable, while small configs keep the fused core
    and explicit LDT_TRAIN_FUSED wins in both directions.
    """

    def test_flagship_auto_fallback(self):
        fused, why = latent_sde_trainer.resolve_train_fused(
            True, False, 64, 24, 1024, None)
        assert not fused and why == "auto-flagship"

    def test_b8_twin_stays_fused(self):
        # the B=8 completion twin compiled fine the same day the flagship
        # wedged (CLAUDE.md round-4) — it must keep the fused train step
        fused, why = latent_sde_trainer.resolve_train_fused(
            True, False, 8, 24, 1024, None)
        assert fused and why == "auto"

    def test_tiny_config_stays_fused(self):
        fused, _ = latent_sde_trainer.resolve_train_fused(
            True, False, 2, 2, 32, None)
        assert fused

    def test_env_forces_fused_at_flagship(self):
        fused, why = latent_sde_trainer.resolve_train_fused(
            True, False, 64, 24, 1024, "1")
        assert fused and why == "env"

    def test_env_disables_everywhere(self):
        fused, _ = latent_sde_trainer.resolve_train_fused(
            True, False, 2, 2, 32, "0")
        assert not fused

    def test_cpu_and_tp_never_fused(self):
        assert latent_sde_trainer.resolve_train_fused(
            False, False, 2, 2, 32, "1") == (False, "cpu")
        assert latent_sde_trainer.resolve_train_fused(
            True, True, 2, 2, 32, "1") == (False, "tp")
