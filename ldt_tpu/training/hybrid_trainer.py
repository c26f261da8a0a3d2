"""Stage-3 trainer: joint (Hybrid) finetuning of Compressor + Score.

Parity target: reference `trainer/Hybrid_Trainer.py` —
  * `clc_compressor` (:115-160): compressor loss = (CD + EMD) + alpha * KL,
    with KL = mean(logqz - logpz), logqz from the VAE posterior and
    logpz = -(||eta - score(xt,t)||^2 * weight_q + cross_entropy_const) the
    diffusion-prior likelihood; gradients flow through the (frozen-in-this-
    term) score net into the compressor.
  * separate score step on detached latents (:88-113) with EMA(Adam).
  * alpha/10 during the compressor warm-up epochs (:149-153).
  * separate Adam for the compressor with its own betas (:58-60).

The reference discards the score grads produced by clc_compressor
(zero_grad-then-step, :157-159); here the score gradient is simply never
taken in the compressor loss — same effect, no wasted backward.

TPU design: two jitted programs per step (joint compressor update; score
update on the detached latents via the parent stage-2 jit) — split because
monolithic programs compile an order of magnitude slower on remote-compile
transports. The score step samples discrete t like the reference's
`update_score` regardless of opt.discrete.
"""

from __future__ import annotations

import functools
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ldt_tpu.diffusion import make_diffusion
from ldt_tpu.eval import compute_all_metrics
from ldt_tpu.eval.loss import CD_loss, EMD_loss
from ldt_tpu.models import Compressor, Score
from ldt_tpu.parallel.mesh import device_put_host, shard_batch
from ldt_tpu.training.base import BaseTrainer
from ldt_tpu.training.checkpoint import (
    checkpoint_path,
    latest_epoch_from_csv,
    load_checkpoint,
    restore_into,
    save_checkpoint,
)
from ldt_tpu.training.latent_sde_trainer import Trainer as LatentSDETrainer
from ldt_tpu.training.state import TrainState, apply_update, make_optimizer


def hybrid_comp_loss(compressor, score, c_params, batch_stats, score_params,
                     pts, label, k_s, t, var, e2int, weight_q, ce_const,
                     eta, alpha, rec_fn=None):
    """Joint compressor loss (reference Hybrid_Trainer.py:116-153):

        comp_loss = rec + alpha * KL,
        rec = CD + EMD on the VAE reconstruction,
        KL  = mean(logqz - logpz) with
        logpz = -(||eta - score(xt, t)||^2 * weight_q + ce_const),
        xt = eps * e2int + sqrt(var) * eta.

    Score params are held fixed in this term (the reference computes then
    throws its score grads away, Hybrid_Trainer.py:157-159). Module-level so
    the code-vs-code differential tests can drive the SAME composition with
    pinned (t, eta) draws and a stub `rec_fn`; the training jit closes over
    it with `rec_fn=None` (the real CD+EMD).
    """
    variables = {"params": c_params}
    if batch_stats is not None:
        variables["batch_stats"] = batch_stats
    out, mutated = compressor.apply(
        variables, pts, label=label, train=True,
        rngs={"sample": k_s}, mutable=["batch_stats"])
    recon = out["set"]
    logqz = jnp.concatenate(out["all_logqz"], axis=-1)
    eps = out["all_eps"]
    xt = eps * e2int + jnp.sqrt(var) * eta
    pred = score.apply(
        {"params": jax.lax.stop_gradient(score_params)}, xt, t, label, None)
    distance = jnp.square(eta - pred)
    logpz = -(distance * weight_q + ce_const)
    kl_loss = jnp.mean(logqz - logpz)
    if rec_fn is None:
        rec_loss = CD_loss(recon, pts) + EMD_loss(recon, pts)
    else:
        rec_loss = rec_fn(recon, pts)
    comp_loss = rec_loss + kl_loss * alpha
    return comp_loss, (kl_loss, rec_loss, eps, mutated.get("batch_stats"))


class Trainer(LatentSDETrainer):
    """Extends the stage-2 trainer with the joint compressor update."""

    def __init__(self, cfg, model: Score, compressor: Compressor,
                 rng: Optional[jax.Array] = None, mesh=None):
        super().__init__(cfg, model, compressor, rng=rng, mesh=mesh)
        self.alpha = cfg.opt.alpha
        self.compressor_warmup = cfg.opt.compressor_warmup
        self.comp_tx = make_optimizer(
            cfg.opt.compressor_beta1, cfg.opt.compressor_beta2,
            cfg.opt.weight_decay, cfg.opt.grad_norm_clip_value,
            getattr(cfg.opt, "moment_dtype", "float32"))
        self.comp_state: Optional[TrainState] = None
        # the reference's Hybrid score step ALWAYS samples discrete t
        # (Hybrid_Trainer.py:93-95 has no continuous branch) even when the
        # compressor KL uses continuous importance sampling (opt.discrete
        # False); rebuild the parent score-update jit in discrete mode,
        # keeping cfg.opt.discrete for the KL term below.
        cfg_discrete = self.discrete
        self.discrete = True
        self._build_steps()
        self.discrete = cfg_discrete
        # separate fixed base for the joint-compressor jit's on-device
        # fold_in(base, step) keys (see latent_sde_trainer.py:80-86)
        self.rng, self._hyb_base = jax.random.split(self.rng)
        self._build_hybrid_step()

    def _build_hybrid_step(self):
        cfg, score, compressor = self.cfg, self.model, self.compressor
        sde = self.SDE
        timesteps, train_N = self.timesteps, self.N
        comp_tx, tx = self.comp_tx, self.tx
        ema_decay = self.ema_decay
        loss_type = cfg.opt.loss_type
        iw_q = cfg.sde.iw_sample_q_mode
        subvp_like = getattr(cfg.sde, "iw_subvp_like_vp_sde",
                             self.sde_type == "sub_vpsde")
        time_eps = self.time_eps
        discrete = self.discrete  # captured at build time (cfg.opt.discrete)

        def diffuse_quantities(k, size):
            if discrete:
                idx = jax.random.randint(k, (size,), 0, train_N)
                t = timesteps[idx]
                e2int = sde.e2int_f(t)[:, None, None]
                var = sde.var(t)[:, None, None]
                weight_q = sde.g2(t)[:, None, None] / (2 * var)
            else:
                t, var_c, e2int_c, weight_c, _, _ = sde.iw_quantities(
                    k, size, time_eps, iw_q, subvp_like)
                var, e2int, weight_q = (var_c[..., None], e2int_c[..., None],
                                        weight_c[..., None])
            return t, var, e2int, weight_q

        @functools.partial(jax.jit, donate_argnums=(0,))
        def hybrid_comp_step(comp_state: TrainState, score_params, pts, label,
                             comp_lr, alpha, base):
            """Joint compressor update (needs the score fwd inside for the
            diffusion-prior KL). The score's own update runs in the parent's
            separate `_train_step` jit on the detached latents — smaller
            programs compile an order of magnitude faster on the remote
            transport, same math. Per-step randomness is derived ON DEVICE
            as fold_in(base, step): a host-side random.split per step costs
            ~100 ms on the tunnel transport."""
            rng = jax.random.fold_in(base, comp_state.step)
            k_s, k_t1, k_eta1 = jax.random.split(rng, 3)
            size = pts.shape[0]
            t, var, e2int, weight_q = diffuse_quantities(k_t1, size)
            eta = jax.random.normal(
                k_eta1, (size, cfg.score.z_scale, cfg.score.z_dim))
            ce_const = 0.5 * (1.0 + jnp.log(
                2.0 * jnp.pi * sde.var(jnp.asarray(time_eps))))

            def comp_loss_fn(c_params):
                return hybrid_comp_loss(
                    compressor, score, c_params, comp_state.batch_stats,
                    score_params, pts, label, k_s, t, var, e2int, weight_q,
                    ce_const, eta, alpha)

            (c_loss, (kl_loss, rec_loss, eps, new_bs)), c_grads = \
                jax.value_and_grad(comp_loss_fn, has_aux=True)(
                    comp_state.params)
            comp_state = apply_update(comp_state, c_grads, comp_tx, comp_lr,
                                      ema_decay=0.0, new_batch_stats=new_bs)
            return comp_state, jax.lax.stop_gradient(eps), kl_loss, rec_loss

        self._hybrid_comp_step = hybrid_comp_step

        @jax.jit
        def recon_step(comp_vars, pts, label, rng):
            out = compressor.apply(comp_vars, pts, label=label,
                                   rngs={"sample": rng})
            return out["set"]

        self._recon_step = recon_step

    # ------------------------------------------------------------ lifecycle
    def maybe_init(self, batch):
        super().maybe_init(batch)
        if self.comp_state is None:
            self.comp_state = TrainState.create(
                self.comp_vars["params"], self.comp_tx,
                batch_stats=self.comp_vars.get("batch_stats"), ema=False)

    def _sync_comp_vars(self):
        """Refresh the decode-path variables from the trained state."""
        self.comp_vars = {"params": self.comp_state.params}
        if self.comp_state.batch_stats is not None:
            self.comp_vars["batch_stats"] = self.comp_state.batch_stats

    def _place_state(self):
        """Also place the compressor's own train state (hybrid trains it)."""
        super()._place_state()
        if self.comp_state is not None:
            self.comp_state = device_put_host(self.mesh, self.comp_state)
            self._sync_comp_vars()

    # -------------------------------------------------------------- update
    def update(self, data, condition=None, train_individual=True):
        self.maybe_init(data)
        pts = jnp.asarray(data["tr_points"])
        label = self._label_of(data)
        pts, label = shard_batch(self.mesh, (pts, label))
        lr = self.current_lr()
        # alpha warm-up (Hybrid_Trainer.py:149-153)
        alpha = (self.alpha / 10.0 if self.epoch < self.compressor_warmup
                 else self.alpha)
        # zero host-side RNG dispatches and zero blocking pulls per step:
        # both jits fold the on-device step counter into fixed base keys,
        # and the meter scalars are returned as DEVICE arrays — they only
        # feed epoch-level CSV rows (no per-step watchdog in this stage),
        # so the entry syncs them once per epoch.
        self.comp_state, eps, kl, rec = self._hybrid_comp_step(
            self.comp_state, self.state.params, pts, label, lr, alpha,
            self._hyb_base)
        # score step on detached latents (Hybrid_Trainer.py:88-113), via the
        # parent stage-2 update jit
        self.state, loss_score = self._train_step(self.state, eps, label, lr,
                                                  self._base_key)
        self._sync_comp_vars()
        self.itr += 1
        return loss_score, kl, rec

    # ----------------------------------------------------------------- eval
    def valrecon(self, test_loader, val_cate=0, **_):
        """Compressor reconstruction eval during the joint finetune
        (reference trainer/Hybrid_Trainer.py:249-307): encode-decode the
        test split, denormalize per cloud, dump rec_ep{N}.npy, score with
        compute_all_metrics(batch_size=256).

        Intentional divergences (see README):
          * the reference's single-category branch calls `self.model(ref_pts)`
            — the SCORE net — on raw points (Hybrid_Trainer.py:260), which
            only runs because `Score.forward` never validates its input; the
            reconstruction there is meaningless. We use the compressor, which
            is evidently what was meant (the multi-category branch does).
          * the reference's multi-category branch denormalizes with
            `data['mean']/data['std']`; our loader emits the same statistics
            under the 'shift'/'scale' keys everywhere.
        """
        variables = dict(self.comp_vars)
        all_ref, all_rec = [], []
        if self.cfg.data.num_categorys == 1:
            for data in test_loader:
                ref_pts = jnp.asarray(data["te_points"])
                rec_pts = self._recon_step(variables, ref_pts, None,
                                           jax.random.key(0))
                shift = jnp.asarray(data["shift"])
                scale = jnp.asarray(data["scale"])
                all_ref.append(np.asarray(ref_pts * scale + shift))
                all_rec.append(np.asarray(rec_pts * scale + shift))
        else:
            pts_l, shift_l, scale_l, label_l = [], [], [], []
            for data in test_loader:
                idx = np.asarray(data["cate_idx"]) == val_cate
                if not idx.any():
                    continue
                pts_l.append(np.asarray(data["te_points"])[idx])
                shift_l.append(np.asarray(data["shift"])[idx])
                scale_l.append(np.asarray(data["scale"])[idx])
                label_l.append(np.asarray(data["cate_idx"])[idx])
            pts = np.concatenate(pts_l)
            shift = np.concatenate(shift_l)
            scale = np.concatenate(scale_l)
            label = np.concatenate(label_l)
            bsize = self.cfg.data.test_batch_size
            for i in range(0, pts.shape[0], bsize):
                chunk = jnp.asarray(pts[i:i + bsize])
                rec_pts = self._recon_step(
                    variables, chunk, jnp.asarray(label[i:i + bsize]),
                    jax.random.key(0))
                all_rec.append(np.asarray(rec_pts))
            rec_n = np.concatenate(all_rec)
            all_rec = [rec_n * scale + shift]
            all_ref = [pts * scale + shift]
        rec = np.concatenate(all_rec)
        ref = np.concatenate(all_ref)
        np.save(os.path.join(self.cfg.log.save_path,
                             f"rec_ep{self.epoch}.npy"), rec)
        gen_res = compute_all_metrics(rec, ref, batch_size=256)
        all_res = {f"val/gen/{k}": float(v) for k, v in gen_res.items()}
        print(f"Validation Sample (unit) Epoch:{self.epoch} ", gen_res)
        return all_res

    # --------------------------------------------------------- checkpoints
    def save(self):
        """Both nets + both optimizers (Hybrid_Trainer.py:310-323)."""
        path = checkpoint_path(self.cfg.log.save_path, self.epoch)
        save_checkpoint(path, {"score": self.state,
                               "compressor_state": self.comp_state},
                        cfg=self.cfg, epoch=self.epoch, itr=self.itr,
                        time=self.time, moments_bf16=True, async_write=True)

    def resume(self, epoch=None, strict=False, load_optim=True,
               finetune=False, pretrain=None, **_):
        if epoch is None and pretrain is None:
            epoch = latest_epoch_from_csv(self.cfg.log.save_path)
            assert epoch is not None, "no training.csv to resume from"
        path = pretrain if pretrain is not None else checkpoint_path(
            self.cfg.log.save_path, epoch)
        ckpt = load_checkpoint(path)
        assert self.state is not None and self.comp_state is not None
        restored = restore_into(
            {"score": self.state, "compressor_state": self.comp_state},
            ckpt["state"], strict=strict)
        self.state = restored["score"]
        self.comp_state = restored["compressor_state"]
        # origin for the int8 golden-gate stamp check (sample-time)
        self._restored_ckpt = path
        self._place_state()  # restored leaves are host numpy
        if finetune:
            self.epoch, self.itr = 1, 0
        else:
            self.epoch = ckpt["epoch"] + 1
            self.itr = ckpt["itr"]
            # epoch-boundary resume: see compressor_trainer.resume
            self._itr_epoch_start = self.itr
        self.time = ckpt["time"]

    def load_pretrain(self):
        """Bootstrap from a stage-2 dual checkpoint (cfg.opt.pretrain_path)."""
        if not self.cfg.opt.pretrain_path:
            raise ValueError(
                "hybrid finetune bootstraps from a stage-2 dual checkpoint: "
                "set opt.pretrain_path in config.yaml (or pass --resume to "
                "continue this run)")
        ckpt = load_checkpoint(self.cfg.opt.pretrain_path)
        state = ckpt["state"]
        if "score" not in state:
            raise ValueError(
                f"{self.cfg.opt.pretrain_path}: not a stage-2 DUAL "
                f"checkpoint (top-level keys {sorted(state)}); hybrid "
                "finetune needs the score+compressor checkpoint written by "
                "train_Latent_Diffusion.py, not a stage-1 compressor one")
        self.state = restore_into(self.state, state["score"])
        comp = state.get("compressor")
        if comp is not None:
            self.comp_vars = restore_into(self.comp_vars, comp)
            self.comp_state = TrainState.create(
                self.comp_vars["params"], self.comp_tx,
                batch_stats=self.comp_vars.get("batch_stats"), ema=False)
        self._place_state()  # restored leaves are host numpy
