"""ViPC completion stage-2 trainer: condition-guided latent diffusion.

Parity target: reference `completion_trainer/Latent_SDE_Trainer.py` — the
Score net is conditioned on a partial cloud + rendered view image through
`ConditionNet`; the condition is pre-encoded ONCE per sampling run
(:150-151) and reused across all denoise steps; eval = CD x 1000 + F1
(:41-53, 196-199); val capped at 1000 samples unless `full` (:202-204).

The conditional Score carries BatchNorm state (ConditionNet's grouper +
ResNet trunk), threaded through `TrainState.batch_stats`.
"""

from __future__ import annotations

import functools
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ldt_tpu.diffusion.sampling import sample_discrete, sample_model_ode
from ldt_tpu.eval.loss import F1Score, L2_ChamferEval_1000
from ldt_tpu.models import Compressor, Score
from ldt_tpu.parallel.mesh import shard_batch
from ldt_tpu.training.completion_compressor_trainer import fps_to
from ldt_tpu.training.latent_sde_trainer import Trainer as LatentSDETrainer
from ldt_tpu.training.state import TrainState, apply_update


class Trainer(LatentSDETrainer):
    def _build_steps(self):
        super()._build_steps()
        cfg, model, compressor = self.cfg, self.model, self.compressor
        sde, tx = self.SDE, self.tx
        timesteps, train_N = self.timesteps, self.N
        loss_type = cfg.opt.loss_type
        ema_decay = self.ema_decay
        iw_mode = cfg.sde.iw_sample_p_mode
        subvp_like = getattr(cfg.sde, "iw_subvp_like_vp_sde",
                             self.sde_type == "sub_vpsde")
        discrete = self.discrete

        @functools.partial(jax.jit, donate_argnums=(0,))
        def cond_train_step(state: TrainState, eps, condition, lr, base):
            # encode runs in the parent class's separate `_encode_at_step`
            # jit (see latent_sde_trainer.py for why the jits are split).
            # Per-step randomness derived ON DEVICE as fold_in(base, step) —
            # a host-side random.split per step costs ~100 ms on the tunnel.
            rng = jax.random.fold_in(base, state.step)
            _, k_t, k_eta = jax.random.split(rng, 3)
            size = eps.shape[0]
            if discrete:
                idx = jax.random.randint(k_t, (size,), 0, train_N)
                t = timesteps[idx]
                e2int = sde.e2int_f(t)[:, None, None]
                var = sde.var(t)[:, None, None]
                weight = jnp.ones((size, 1, 1))
            else:
                t, var_c, e2int_c, weight_c, _, _ = sde.iw_quantities(
                    k_t, size, self.time_eps, iw_mode, subvp_like)
                var, e2int, weight = (var_c[..., None], e2int_c[..., None],
                                      weight_c[..., None])
            eta = jax.random.normal(k_eta, eps.shape)
            xt = eps * e2int + jnp.sqrt(var) * eta

            def loss_fn(params):
                variables = {"params": params}
                if state.batch_stats is not None:
                    variables["batch_stats"] = state.batch_stats
                pred, mutated = model.apply(
                    variables, xt, t, None, condition, train=True,
                    mutable=["batch_stats"])
                if loss_type == "l1":
                    d = jnp.abs(eta - pred)
                else:
                    d = jnp.square(eta - pred)
                return jnp.mean(d * weight), mutated.get("batch_stats")

            (loss, new_bs), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            state = apply_update(state, grads, tx, lr, ema_decay=ema_decay,
                                 new_batch_stats=new_bs)
            return state, loss

        self._cond_train_step = cond_train_step

        z_shape = (cfg.score.z_scale, cfg.score.z_dim)
        sde_cfg = cfg.sde

        sample_model = self.sample_model

        @functools.partial(jax.jit, static_argnums=(4, 5))
        def cond_sample_step(params, batch_stats, comp_vars, rng, num_samples,
                             num_points, condition):
            variables = {"params": params}
            if batch_stats is not None:
                variables["batch_stats"] = batch_stats
            # pre-encode the condition ONCE (reference :150-151)
            cond_enc = model.apply(variables, condition,
                                   method=Score.encode_condition)

            from ldt_tpu.serving.int8 import int8_cond_serving_active

            serve_int8 = int8_cond_serving_active(
                cfg, self.sample_mode, cond_enc[0] is not None)
            if serve_int8:
                # W8A8 conditional serving (ldt_tpu/serving/int8.py):
                # weights quantized once per run; the static condition KV
                # and the schedule's time embeddings hoisted out of the
                # scan; AdaLN mods computed per step (c depends on the
                # per-sample image embedding). Changes sampler numerics —
                # gate with scripts/int8_golden_gate.py --completion first.
                from ldt_tpu.serving.int8 import (
                    denoise_cond_int8,
                    precompute_cond_kv,
                    quantize_cond_score_params,
                )

                schedule = jnp.linspace(1.0, self.sample_time_eps,
                                        sde_cfg.sample_N)
                t_embs = model.apply(variables, schedule,
                                     method=Score.embed_times)
                qp = quantize_cond_score_params(params,
                                                cfg.score.num_blocks)
                kv_cache = precompute_cond_kv(qp, cond_enc[0])
                interp = jax.default_backend() != "tpu"

                def score_fn(t, x, step):
                    p = denoise_cond_int8(
                        x, t_embs[step], cond_enc[1], kv_cache, qp,
                        cfg.score.num_heads, interpret=interp)
                    std = sde.std(t)[:, None, None]
                    return -p.astype(jnp.float32) / std, p
            else:
                def score_fn(t, x, step=None):
                    # fused Pallas attention applies to the cross-attention
                    # too: condition tokens == z_scale == query tokens
                    p = sample_model.apply(variables, x, t, None, cond_enc)
                    std = sde.std(t)[:, None, None]
                    return -p / std, p

            k_sde, k_dec = jax.random.split(rng)
            if self.sample_mode == "continuous":
                eps, _ = sample_model_ode(
                    sde, score_fn, k_sde, num_samples, z_shape,
                    ode_eps=self.sample_time_eps,
                    ode_solver_tol=self.ode_tol)
            else:
                eps = sample_discrete(
                    sde, score_fn, k_sde, num_samples, z_shape,
                    N=sde_cfg.sample_N, predictor=sde_cfg.predictor,
                    corrector=sde_cfg.corrector,
                    corrector_steps=sde_cfg.corrector_steps,
                    time_eps=self.sample_time_eps,
                    probability_flow=sde_cfg.probability_flow,
                    denoise=sde_cfg.denoise, snr=sde_cfg.snr)
            sample = compressor.apply(
                comp_vars, (num_samples, num_points), eps,
                method=Compressor.sample, rngs={"sample": k_dec})
            return sample

        self._cond_sample_step = cond_sample_step

    # ------------------------------------------------------------ lifecycle
    def maybe_init(self, batch):
        """batch: ViPC dict with views/pc/pc_part (or a stage-2 dict)."""
        if self.state is not None:
            return
        if "pc" in batch:
            pts = fps_to(batch["pc"], self.num_points)
            pc_part = fps_to(batch["pc_part"], self.num_points)
            condition = {"img": jnp.asarray(batch["views"]), "pts": pc_part}
        else:
            pts = jnp.asarray(batch["tr_points"])
            condition = None
        b = pts.shape[0]
        z = jnp.zeros((b, self.cfg.score.z_scale, self.cfg.score.z_dim))
        t = jnp.ones((b,))
        self.rng, k = jax.random.split(self.rng)
        variables = jax.jit(self.model.init)(k, z, t, None, condition)
        self.state = TrainState.create(
            variables["params"], self.tx,
            batch_stats=variables.get("batch_stats"), ema=True)
        if self.comp_vars is None:
            self.rng, k1, k2 = jax.random.split(self.rng, 3)
            self.comp_vars = jax.jit(self.compressor.init)(
                {"params": k1, "sample": k2}, pts)

    # -------------------------------------------------------------- update
    def update(self, data, condition=None):
        """data: [B, N, 3] GT points (already FPS'd by the entry) or a ViPC
        dict; condition: {'img','pts'}."""
        if isinstance(data, dict):
            pts = fps_to(data["pc"], self.num_points)
            pc_part = fps_to(data["pc_part"], self.num_points)
            condition = {"img": jnp.asarray(data["views"]), "pts": pc_part}
            self.maybe_init(data)
        else:
            pts = jnp.asarray(data)
            self.maybe_init({"pc": pts, "pc_part": pts,
                             "views": jnp.zeros(
                                 (pts.shape[0], 224, 224, 3))})
        pts, condition = shard_batch(self.mesh, (pts, condition))
        lr = self.current_lr()
        # zero host-side RNG dispatches per step: both jits fold the
        # on-device step counter into fixed base keys
        eps = self._encode_at_step(self.comp_vars, pts, self._enc_base,
                                   self.state.step, None)
        self.state, loss = self._cond_train_step(self.state, eps, condition,
                                                 lr, self._base_key)
        self.itr += 1
        return loss

    # ------------------------------------------------------------ sampling
    def sample(self, num_samples, num_points=None, label=None,
               condition=None):
        from ldt_tpu.serving.int8 import int8_cond_serving_active

        self._maybe_verify_int8_gate(
            int8_cond_serving_active(self.cfg, self.sample_mode,
                                     condition is not None),
            completion=True)
        self.rng, k = jax.random.split(self.rng)
        return self._cond_sample_step(
            self.state.eval_params(), self.state.batch_stats, self.comp_vars,
            k, int(num_samples),
            int(self.num_points if num_points is None else num_points),
            condition)

    def valsample(self, test_loader, vis=False, full=False):
        """completion_trainer/Latent_SDE_Trainer.py:171-231."""
        all_ref, all_part, all_smp = [], [], []
        use_time = 0.0
        for data in test_loader:
            ref_pts = fps_to(data["pc"], 2048)
            pc_part = fps_to(data["pc_part"], 2048)
            condition = {"img": jnp.asarray(data["views"]), "pts": pc_part}
            t0 = time.time()
            smp_pts = self.sample(num_samples=ref_pts.shape[0],
                                  condition=condition)
            smp_pts.block_until_ready()
            use_time += time.time() - t0
            all_smp.append(np.asarray(smp_pts))
            all_ref.append(np.asarray(ref_pts))
            all_part.append(np.asarray(pc_part))
            if not full and sum(s.shape[0] for s in all_smp) > 1000:
                break
        smp = np.concatenate(all_smp)
        ref = np.concatenate(all_ref)
        part = np.concatenate(all_part)
        if vis:
            from ldt_tpu.tools.vis_utils import render_3D

            render_3D(os.path.join(self.cfg.log.save_path, "vis"), smp)
        cd = L2_ChamferEval_1000(jnp.asarray(smp), jnp.asarray(ref))
        f1, _, _ = F1Score(jnp.asarray(smp), jnp.asarray(ref))
        for name, arr in (("part", part), ("smp", smp), ("ref", ref)):
            np.save(os.path.join(self.cfg.log.save_path,
                                 f"{name}_ep{self.epoch}.npy"), arr)
        all_res = {"cd": float(cd), "f1score": float(jnp.mean(f1))}
        print(f"Validation Sample (unit) Epoch:{self.epoch} ", all_res)
        return all_res

    def reconstruction(self, test_loader):
        """completion_trainer/Latent_SDE_Trainer.py:235-263."""
        all_ref, all_rec = [], []
        for data in test_loader:
            ref_pts = fps_to(data["pc"], 2048)
            out = self.compressor.apply(
                self.comp_vars, ref_pts,
                rngs={"sample": jax.random.key(0)})
            all_rec.append(np.asarray(out["set"]))
            all_ref.append(np.asarray(ref_pts))
        rec = np.concatenate(all_rec)
        ref = np.concatenate(all_ref)
        np.save(os.path.join(self.cfg.log.save_path,
                             f"rec_ep{self.epoch}.npy"), rec)
        cd = L2_ChamferEval_1000(jnp.asarray(rec), jnp.asarray(ref))
        f1, _, _ = F1Score(jnp.asarray(rec), jnp.asarray(ref))
        return {"cd": float(cd), "f1score": float(jnp.mean(f1))}

    reconstrustion = reconstruction
