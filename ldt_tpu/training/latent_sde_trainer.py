"""Stage-2 trainer: latent diffusion (Score net on frozen-Compressor latents).

Parity target: reference `trainer/Latent_SDE_Trainer.py` —
  * latents `eps = compressor(points)["all_eps"]` with no gradients (:102-104)
  * eps-prediction loss, discrete-t (uniform index into
    `linspace(1.0, sample_time_eps, train_N)`, :55,117-122) or continuous
    importance-sampled t (:124-126), l1/l2 (:131-135)
  * EMA(Adam) with decay 0.9999 (:42-43); sampling via the discrete PC
    sampler or the ODE, then `compressor.sample` decode (:143-165)
  * dual-net checkpoints (:228-239), `load_pretrain` from the stage-1
    checkpoint (:269-273)

TPU design: encode + diffuse + denoise-step + Adam + EMA is ONE jitted
program; generation (1000-step reverse scan + set decode) is ONE jitted
program — versus the reference's 1000 Python-level CUDA launches
(diffusion_continuous.py:242-249) and host-driven scipy ODE.

EMA note: we sample/eval with the EMA params (the intended LSGM discipline);
see ldt_tpu/training/state.py for why the reference's double-swap actually
samples with raw params.
"""

from __future__ import annotations

import functools
import math
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ldt_tpu.diffusion import make_diffusion
from ldt_tpu.diffusion.sampling import sample_discrete, sample_model_ode
from ldt_tpu.eval import compute_all_metrics
from ldt_tpu.models import Compressor, Score
from ldt_tpu.parallel.mesh import device_put_host, shard_batch
from ldt_tpu.parallel.tp import (
    has_model_axis,
    shard_replicated,
    shard_train_state,
)
from ldt_tpu.training.base import BaseTrainer
from ldt_tpu.training.checkpoint import (
    checkpoint_path,
    latest_epoch_from_csv,
    load_checkpoint,
    restore_into,
    save_checkpoint,
)
from ldt_tpu.training.state import TrainState, apply_update, make_optimizer


# Fused-bwd compile-wedge guard (VERDICT r4 weak #1). The flagship-scale
# fused-attention TRAIN-step compile (457M score, B=64, Pallas fwd+bwd in
# one update program) has hung INDEFINITELY on the tunnel-side compiler
# (CLAUDE.md round-4 wedge: >20-45 min frozen at 'Epoch 1 0/8'), while the
# B=8 completion twin compiled fine the same day. Proxy for the bwd-program
# size: batch * blocks * hidden^2 — flagship 64*24*1024^2 = 1.6e9 wedges,
# the B=8 twin 2.0e8 compiles. Above the limit the train step auto-falls
# back to XLA attention (sampling keeps the fused Pallas forward either
# way); LDT_TRAIN_FUSED=1 forces fused at any scale, =0 disables it.
_TRAIN_FUSED_AUTO_LIMIT = 4e8


def resolve_train_fused(on_tpu: bool, tp_sharded: bool, batch_size: int,
                        num_blocks: int, hidden_size: int,
                        env: Optional[str]) -> tuple[bool, str]:
    """Decide the TRAIN-step attention backend; returns (fused, reason).

    Pure so tests can pin the wedge guard without a TPU backend: fused off
    CPU / under TP, env override wins, else auto-fallback at flagship scale.
    """
    if not on_tpu:
        return False, "cpu"
    if tp_sharded:
        # conservative: the fused-bwd wedge has never been probed through
        # shard_map; sampling is where the TP fast path pays.
        return False, "tp"
    if env is not None:
        return env == "1", "env"
    risk = batch_size * num_blocks * hidden_size ** 2
    if risk >= _TRAIN_FUSED_AUTO_LIMIT:
        return False, "auto-flagship"
    return True, "auto"


def draw_train_randoms(rng, step, eps_shape, discrete, timesteps, train_N,
                       sde, time_eps, iw_mode, subvp_like):
    """Per-step stochastic draws of the stage-2 objective: (t, var, e2int,
    weight, eta, dropout_key) — discrete-t via a uniform index into the
    timestep table (reference Latent_SDE_Trainer.py:117-122) or continuous
    importance-sampled t (:124-126), eta ~ N(0, I) (:127).

    Module-level so the composed trajectory differential can pin the draws
    BY STEP (tests/test_trajectory_ref_parity.py monkeypatches this with a
    table lookup on `step`); production ignores `step` and keys everything
    off the fold_in-derived rng.
    """
    del step
    _, k_t, k_eta, k_drop = jax.random.split(rng, 4)
    size = eps_shape[0]
    if discrete:
        idx = jax.random.randint(k_t, (size,), 0, train_N)
        t = timesteps[idx]
        e2int = sde.e2int_f(t)[:, None, None]
        var = sde.var(t)[:, None, None]
        weight = jnp.ones((size, 1, 1))
    else:
        t, var_c, e2int_c, weight_c, _, _ = sde.iw_quantities(
            k_t, size, time_eps, iw_mode, subvp_like)
        var = var_c[..., None]
        e2int = e2int_c[..., None]
        weight = weight_c[..., None]
    eta = jax.random.normal(k_eta, eps_shape)
    return t, var, e2int, weight, eta, k_drop


def score_objective(model, params, eps, t, var, e2int, weight, eta, label,
                    condition, train, dropout_rng, loss_type):
    """Stage-2 denoising objective (reference Latent_SDE_Trainer.py:127-135):

        xt = eps * e2int_f(t) + sqrt(var(t)) * eta,
        loss = mean(|eta - model(xt, t)|^p * weight),  p in {1, 2}.

    Module-level so the code-vs-code differential tests can drive the SAME
    expression with pinned (t, eta) draws; the training jits close over it.
    """
    xt = eps * e2int + jnp.sqrt(var) * eta
    rngs = {"dropout": dropout_rng} if train else None
    params_pred = model.apply({"params": params}, xt, t, label,
                              condition, train=train, rngs=rngs)
    if loss_type == "l1":
        distance = jnp.abs(eta - params_pred)
    else:
        distance = jnp.square(eta - params_pred)
    return jnp.mean(distance * weight)  # weight: [B,1,1] broadcast


class Trainer(BaseTrainer):
    def __init__(self, cfg, model: Score, compressor: Compressor,
                 rng: Optional[jax.Array] = None, mesh=None):
        super().__init__(cfg, mesh=mesh)
        self.SDE = make_diffusion(cfg.sde)
        self.sde_type = cfg.sde.sde_type
        self.num_points = cfg.data.tr_max_sample_points
        # On TPU rebuild the nets with the fused attention core. Round 2: the
        # core has a custom VJP (Pallas backward kernel), so the TRAINING
        # step uses it too — param trees are identical either way. Round 4:
        # fused stays ON under tensor parallelism — the Attention module
        # routes the packed self-attention path through a per-model-shard
        # shard_map (ops/pallas_attention.py::fused_attention_packed_tp,
        # whole heads per shard) and itself falls back to XLA for anything
        # the TP path can't shard (cross-attention, non-dividing heads), so
        # multi-chip serving no longer loses the DiT fast path.
        fused = jax.default_backend() == "tpu"
        # The TRAINING model's attention backend is separately gated: the
        # Pallas bwd kernel measured 0.445 ms/block in the flagship train
        # step (11 ms/step, 19% of device time), but the flagship-scale
        # fused-bwd compile can WEDGE the tunnel compiler indefinitely —
        # resolve_train_fused auto-falls back to XLA attention above the
        # measured-safe program size (sampling keeps the fused fwd core
        # either way). LDT_TRAIN_FUSED=1/0 overrides in both directions.
        train_fused, why = resolve_train_fused(
            fused, has_model_axis(self.mesh), cfg.data.batch_size,
            cfg.score.num_blocks, cfg.score.hidden_size,
            os.environ.get("LDT_TRAIN_FUSED"))
        if why == "auto-flagship":
            print("[trainer] flagship-scale update program: TRAIN-step "
                  "attention falls back to XLA to avoid the fused-bwd "
                  "compile wedge (CLAUDE.md round-4; sampling keeps the "
                  "fused Pallas core). Force with LDT_TRAIN_FUSED=1.",
                  flush=True)
        elif train_fused and why == "env":
            # 2026-08-19 tunnel-side compiler: the fused-bwd FLAGSHIP update
            # compile can hang indefinitely (CLAUDE.md round-4 wedge). Tell
            # the operator up front instead of letting them discover a
            # frozen 'Epoch 1 0/N' line.
            print("[trainer] fused-attention TRAIN step forced on; if the "
                  "first update-step compile hangs >10 min, restart with "
                  "LDT_TRAIN_FUSED=0 (XLA attention in training only; "
                  "sampling keeps the fused core).", flush=True)
        if fused:
            model = Score(cfg.score, dtype=model.dtype,
                          fused_attention=train_fused)
            compressor = Compressor(cfg.compressor, dtype=compressor.dtype,
                                    fused_attention=True)
        self.model = model
        self.compressor = compressor
        self.tx = make_optimizer(cfg.opt.beta1, cfg.opt.beta2,
                                 cfg.opt.weight_decay,
                                 cfg.opt.grad_norm_clip_value,
                                 getattr(cfg.opt, "moment_dtype", "float32"))
        self.ema_decay = cfg.opt.ema_decay
        self.rng = rng if rng is not None else jax.random.key(cfg.common.seed)
        # Fixed per-trainer base keys: the hot train/encode steps derive
        # their randomness as fold_in(base, step) INSIDE the jit, so the
        # host loop issues zero RNG dispatches per step (an un-jitted
        # random.split costs ~100 ms on the tunnel transport — CLAUDE.md).
        # Separate bases so the encode key is never the train key's parent.
        self.rng, self._base_key, self._enc_base = jax.random.split(
            self.rng, 3)

        # sampling config
        self.sample_time_eps = cfg.sde.sample_time_eps
        self.sample_N = cfg.sde.sample_N
        self.sample_mode = cfg.sde.sample_mode
        self.ode_tol = cfg.sde.ode_tol
        # training config
        self.N = cfg.sde.train_N
        self.discrete = cfg.opt.discrete
        self.time_eps = cfg.sde.time_eps
        # discrete-t table: linspace(1.0, sample_time_eps, train_N)
        # (trainer/Latent_SDE_Trainer.py:55)
        self.timesteps = jnp.linspace(1.0, self.sample_time_eps, self.N)

        self.state: Optional[TrainState] = None
        self.comp_vars = None  # {'params', 'batch_stats'} of the compressor
        # sampling twin of the score net (historical name — since the core
        # gained its VJP, train/sample nets are constructed identically)
        self.sample_model = Score(cfg.score, dtype=model.dtype,
                                  fused_attention=fused)
        self._build_steps()

    # ------------------------------------------------------------------ jit
    def _build_steps(self):
        cfg, model, compressor = self.cfg, self.model, self.compressor
        sample_model = self.sample_model
        sde, tx = self.SDE, self.tx
        timesteps, train_N = self.timesteps, self.N
        loss_type = cfg.opt.loss_type
        ema_decay = self.ema_decay
        iw_mode = cfg.sde.iw_sample_p_mode
        # the reference derives this from sde_type in every trainer
        # (Latent_SDE_Trainer.py:126); an explicit `sde.iw_subvp_like_vp_sde`
        # config key overrides (enables the like_vp=False sub-VP variants)
        subvp_like = getattr(cfg.sde, "iw_subvp_like_vp_sde",
                             self.sde_type == "sub_vpsde")
        # captured at BUILD time so Hybrid can rebuild the score step in
        # discrete mode independently of cfg.opt.discrete (see hybrid_trainer)
        discrete = self.discrete

        def encode(comp_vars, pts, rng, label):
            out = compressor.apply(comp_vars, pts, label=label,
                                   rngs={"sample": rng})
            return jax.lax.stop_gradient(out["all_eps"])

        # NOTE: encode and the score update are SEPARATE jits on purpose.
        # The monolithic (encode + fwd + bwd + Adam + EMA) program compiled
        # in 283-804 s on the remote-compile transport while its two halves
        # compile in ~45 s combined; the split costs one extra dispatch and a
        # ~1 MB latent round-trip per step — noise.
        self._encode_step = jax.jit(encode)

        def encode_at_step(comp_vars, pts, base, step, label):
            # hot-loop variant: key derived on device from (base, step)
            return encode(comp_vars, pts,
                          jax.random.fold_in(base, step), label)

        self._encode_at_step = jax.jit(encode_at_step)

        def score_loss(params, eps, t, var, e2int, weight, eta, label,
                       condition, train, dropout_rng):
            return score_objective(model, params, eps, t, var, e2int, weight,
                                   eta, label, condition, train, dropout_rng,
                                   loss_type)

        time_eps = self.time_eps

        @functools.partial(jax.jit, donate_argnums=(0,))
        def train_step(state: TrainState, eps, label, lr, base):
            # per-step key derived on device: fold_in(base, step) — no host
            # RNG dispatch in the training loop
            rng = jax.random.fold_in(base, state.step)
            t, var, e2int, weight, eta, k_drop = draw_train_randoms(
                rng, state.step, eps.shape, discrete, timesteps, train_N,
                sde, time_eps, iw_mode, subvp_like)

            loss, grads = jax.value_and_grad(score_loss)(
                state.params, eps, t, var, e2int, weight, eta, label, None,
                True, k_drop)
            state = apply_update(state, grads, tx, lr, ema_decay=ema_decay)
            return state, loss

        self._train_step = train_step

        @jax.jit
        def val_loss_step(state: TrainState, comp_vars, pts, label, rng):
            """EMA-params validation loss (trainer/Latent_SDE_Trainer.py:63-92)."""
            k_enc, k_t, k_eta = jax.random.split(rng, 3)
            eps = encode(comp_vars, pts, k_enc, label)
            size = eps.shape[0]
            idx = jax.random.randint(k_t, (size,), 0, train_N)
            t = timesteps[idx]
            e2int = sde.e2int_f(t)[:, None, None]
            var = sde.var(t)[:, None, None]
            eta = jax.random.normal(k_eta, eps.shape)
            return score_loss(state.eval_params(), eps, t, var, e2int,
                              jnp.ones((size, 1, 1)), eta, label, None, False,
                              rng)

        self._val_loss_step = val_loss_step

        z_shape = (cfg.score.z_scale, cfg.score.z_dim)
        sde_cfg = cfg.sde

        @functools.partial(jax.jit, static_argnums=(3, 4))
        def sample_step(params, comp_vars, rng, num_samples, num_points,
                        label, condition):
            fast_mods = (label is None and condition is None
                         and not cfg.score.unet and cfg.score.AdaLN
                         and self.sample_mode != "continuous"
                         and sde_cfg.predictor != "pndm")
            if fast_mods:
                # hoist the time-conditioning out of the scan: all AdaLN
                # modulations for the fixed schedule in one shot
                schedule = jnp.linspace(1.0, self.sample_time_eps,
                                        sde_cfg.sample_N)
                mods = model.apply({"params": params}, schedule,
                                   method=Score.precompute_mods)
                from ldt_tpu.serving.int8 import int8_serving_active

                serve_int8 = int8_serving_active(cfg, self.sample_mode,
                                                 label, condition)
                if serve_int8:
                    # W8A8 serving path (ldt_tpu/serving/int8.py) — changes
                    # sampler numerics; enable only after the golden-eval
                    # gate (scripts/int8_golden_gate.py) passes for the
                    # config. Weights quantized once per sampling run,
                    # outside the scan.
                    from ldt_tpu.serving.int8 import (
                        denoise_with_mods_int8,
                        quantize_score_params,
                    )

                    qparams = quantize_score_params(params,
                                                    cfg.score.num_blocks)
                    # LDT_INT8_STATIC=1: per-step static activation scales
                    # (calibrated by scripts/int8_calibrate.py) replace the
                    # per-token amax reduce in the scan. `sample()` loads
                    # and provenance-checks them host-side ONCE
                    # (_ensure_act_scales); the explicit opt-in NEVER
                    # silently serves dynamic — a caller bypassing
                    # sample() without scales fails here at trace time.
                    act_scales = None
                    if os.environ.get("LDT_INT8_STATIC", "0") == "1":
                        act_scales = getattr(self, "_act_scales", None)
                        if act_scales is None:
                            raise RuntimeError(
                                "[int8-static] LDT_INT8_STATIC=1 but no "
                                "calibration scales are loaded — sample "
                                "through Trainer.sample(), or run "
                                "scripts/int8_calibrate.py first")

                    def score_fn(t, x, step):
                        step_mods = jax.tree_util.tree_map(
                            lambda m: m[step], mods)
                        p = denoise_with_mods_int8(
                            x, step_mods, qparams, cfg.score.num_heads,
                            interpret=jax.default_backend() != "tpu",
                            act_scales=None if act_scales is None
                            else act_scales[step])
                        std = sde.std(t)[:, None, None]
                        return -p.astype(jnp.float32) / std, p
                else:
                    def score_fn(t, x, step):
                        step_mods = jax.tree_util.tree_map(
                            lambda m: m[step], mods)
                        p = sample_model.apply(
                            {"params": params}, x, step_mods,
                            method=Score.denoise_with_mods)
                        std = sde.std(t)[:, None, None]
                        return -p / std, p
            else:
                def score_fn(t, x, step=None):
                    p = sample_model.apply({"params": params}, x, t, label,
                                           condition)
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
            return sample, eps

        self._sample_step = sample_step

    # ------------------------------------------------------------ lifecycle
    def _label_of(self, batch):
        if self.cfg.data.num_categorys > 1:
            return jnp.asarray(batch["cate_idx"])
        return None

    def maybe_init(self, batch):
        if self.state is not None:
            return
        b = min(2, batch["tr_points"].shape[0])
        z = jnp.zeros((b, self.cfg.score.z_scale, self.cfg.score.z_dim))
        t = jnp.ones((b,))
        label = self._label_of(batch)
        label = label[:b] if label is not None else None
        self.rng, k = jax.random.split(self.rng)
        variables = jax.jit(self.model.init)(k, z, t, label)
        self.state = TrainState.create(variables["params"], self.tx, ema=True)
        if self.comp_vars is None:
            # random compressor (tests / pretrain-less runs)
            self.rng, k1, k2 = jax.random.split(self.rng, 3)
            pts = jnp.asarray(batch["tr_points"][:b])
            self.comp_vars = jax.jit(self.compressor.init)(
                {"params": k1, "sample": k2}, pts, label=label)
        self._place_state()

    def _place_state(self):
        """Device placement after init/restore.

        Tensor-parallel: DiT weights + their Adam moments/EMA sharded over
        the mesh's `model` axis (ldt_tpu/parallel/tp.py); the compressor
        stays replicated. Otherwise: restored checkpoints arrive as host
        numpy pytrees (checkpoint.py::restore_into) — device-put them once,
        or every jitted call re-uploads the full parameter set (measured
        ~36 s/call for the flagship score state through the TPU transport;
        sampling-only flows never write state back, so they pay it on
        EVERY call)."""
        if has_model_axis(self.mesh):
            if self.state is not None:
                self.state = shard_train_state(self.state, self.mesh)
            if self.comp_vars is not None:
                self.comp_vars = shard_replicated(self.comp_vars, self.mesh)
            return
        if self.state is not None:
            self.state = device_put_host(self.mesh, self.state)
        if self.comp_vars is not None:
            self.comp_vars = device_put_host(self.mesh, self.comp_vars)

    # -------------------------------------------------------------- update
    def update(self, data, condition=None):
        self.maybe_init(data)
        pts = jnp.asarray(data["tr_points"])
        label = self._label_of(data)
        pts, label = shard_batch(self.mesh, (pts, label))
        lr = self.current_lr()
        # zero host-side RNG dispatches: both jits fold the on-device step
        # counter into the fixed base key
        eps = self._encode_at_step(self.comp_vars, pts, self._enc_base,
                                   self.state.step, label)
        self.state, loss = self._train_step(self.state, eps, label, lr,
                                            self._base_key)
        self.itr += 1
        return loss

    def val_loss(self, data, condition=None):
        self.maybe_init(data)
        pts = jnp.asarray(data["te_points"])
        label = self._label_of(data)
        self.rng, k = jax.random.split(self.rng)
        return self._val_loss_step(self.state, self.comp_vars, pts, label, k)

    # ------------------------------------------------------------ sampling
    def _maybe_verify_int8_gate(self, active: bool, completion: bool = False):
        """Golden-gate stamp check before int8 serving (VERDICT r4 weak #2):
        int8 certification is per-(checkpoint, sampler-config) — warn, or
        refuse under LDT_SERVE_INT8_STRICT=1, when the restored checkpoint
        has no matching PASSED stamp (scripts/int8_golden_gate.py writes
        them). Checked once per restored checkpoint, host-side."""
        if not active:
            return
        key = (getattr(self, "_restored_ckpt", None),)
        if getattr(self, "_int8_gate_checked", None) == key:
            return
        from ldt_tpu.serving.int8 import verify_gate_stamp

        verify_gate_stamp(getattr(self, "_restored_ckpt", None), self.cfg,
                          completion)
        self._int8_gate_checked = key

    def _ensure_act_scales(self, active: bool):
        """Host-side, once-per-checkpoint load of the static int8 scales
        (LDT_INT8_STATIC) — outside the jit so retraces never re-read the
        file, and the provenance checks (fingerprint / bf16_tail /
        predictor, serving/int8.py::load_act_scales) RAISE rather than
        silently serving dynamic quantization."""
        if not active or os.environ.get("LDT_INT8_STATIC", "0") != "1":
            return
        key = (getattr(self, "_restored_ckpt", None),)
        if (getattr(self, "_act_scales", None) is not None
                and getattr(self, "_act_scales_key", None) == key):
            return
        from ldt_tpu.serving.int8 import load_act_scales

        self._act_scales = load_act_scales(
            getattr(self, "_restored_ckpt", None), self.cfg.sde.sample_N,
            self.cfg.score.num_blocks, self.cfg)
        self._act_scales_key = key

    def sample(self, num_samples, num_points=None, label=None, condition=None):
        from ldt_tpu.serving.int8 import int8_serving_active

        active = int8_serving_active(self.cfg, self.sample_mode, label,
                                     condition)
        self._maybe_verify_int8_gate(active)
        self._ensure_act_scales(active)
        self.rng, k = jax.random.split(self.rng)
        sample, eps = self._sample_step(
            self.state.eval_params(), self.comp_vars, k, int(num_samples),
            int(self.num_points if num_points is None else num_points),
            label, condition)
        return sample, eps

    def valsample(self, test_loader, val_cate=0, vis=False):
        """trainer/Latent_SDE_Trainer.py:167-226."""
        all_ref, all_smp = [], []
        use_time = 0.0
        if self.cfg.data.num_categorys == 1:
            for data in test_loader:
                ref_pts = data["te_points"]
                t0 = time.time()
                smp_pts, _ = self.sample(num_samples=ref_pts.shape[0])
                smp_pts.block_until_ready()
                use_time += time.time() - t0
                all_smp.append(np.asarray(smp_pts))
                all_ref.append(ref_pts)
            smp = np.concatenate(all_smp)
            ref = np.concatenate(all_ref)
        else:
            for data in test_loader:
                idx = np.asarray(data["cate_idx"]) == val_cate
                all_ref.append(data["te_points"][idx])
            ref = np.concatenate(all_ref)
            bsize = self.cfg.data.test_batch_size
            t0 = time.time()
            for _ in range(math.ceil(ref.shape[0] / bsize)):
                cates = jnp.full((bsize,), val_cate, jnp.int32)
                smp_pts, _ = self.sample(num_samples=bsize, label=cates)
                # block before reading the clock: async dispatch would credit
                # device time to whatever op happens to sync later
                smp_pts.block_until_ready()
                all_smp.append(np.asarray(smp_pts))
            use_time += time.time() - t0
            smp = np.concatenate(all_smp)[: ref.shape[0]]
        print("Sample rate: %.8f " % (smp.shape[0] / max(use_time, 1e-9)))
        np.save(os.path.join(self.cfg.log.save_path,
                             f"smp_ep{self.epoch}.npy"), smp)
        if vis:
            from ldt_tpu.tools.vis_utils import render_3D

            render_3D(os.path.join(self.cfg.log.save_path, "vis"), smp)
        gen_res = compute_all_metrics(smp, ref, batch_size=64)
        all_res = {f"val/gen/{k}": float(v) for k, v in gen_res.items()}
        print(f"Validation Sample (unit) Epoch:{self.epoch} ", gen_res)
        return all_res

    # --------------------------------------------------------- checkpoints
    def save(self):
        path = checkpoint_path(self.cfg.log.save_path, self.epoch)
        # flagship dual state is ~7.3 GB f32: stream it — bf16 Adam moments
        # (halves their transfer), sharded parallel writes, serialization off
        # the step path (params/EMA stay f32 bit-exact; restore recasts).
        save_checkpoint(path, {"score": self.state,
                               "compressor": self.comp_vars},
                        cfg=self.cfg, epoch=self.epoch, itr=self.itr,
                        time=self.time, moments_bf16=True, async_write=True)

    def resume(self, epoch=None, strict=False, load_optim=True,
               finetune=False, pretrain=None, **_):
        """trainer/Latent_SDE_Trainer.py:241-267."""
        if epoch is None and pretrain is None:
            epoch = latest_epoch_from_csv(self.cfg.log.save_path)
            assert epoch is not None, "no training.csv to resume from"
        path = pretrain if pretrain is not None else checkpoint_path(
            self.cfg.log.save_path, epoch)
        ckpt = load_checkpoint(path)
        assert self.state is not None, (
            "call maybe_init(first_batch) before resume")
        restored = restore_into(
            {"score": self.state, "compressor": self.comp_vars},
            ckpt["state"], strict=strict)
        new_state = restored["score"]
        if finetune or not load_optim:
            new_state = new_state.replace(opt_state=self.state.opt_state)
        self.state = new_state
        self.comp_vars = restored["compressor"]
        # origin for the int8 golden-gate stamp check (sample-time)
        self._restored_ckpt = path
        self._place_state()
        if finetune:
            self.epoch, self.itr = 1, 0
        else:
            self.epoch = ckpt["epoch"] + 1
            self.itr = ckpt["itr"]
            # epoch-boundary resume: see compressor_trainer.resume
            self._itr_epoch_start = self.itr
        self.time = ckpt["time"]

    def load_pretrain(self):
        """Bootstrap the frozen compressor from a stage-1 checkpoint
        (trainer/Latent_SDE_Trainer.py:269-273)."""
        if not self.cfg.compressor.pretrain_path:
            raise ValueError(
                "stage-2 training bootstraps its frozen compressor from a "
                "stage-1 checkpoint: set compressor.pretrain_path in "
                "config.yaml (or pass --resume to continue a stage-2 run)")
        ckpt = load_checkpoint(self.cfg.compressor.pretrain_path)
        state = ckpt["state"]["state"]
        comp_vars = {"params": state["params"]}
        if state.get("batch_stats"):
            comp_vars["batch_stats"] = state["batch_stats"]
        if self.comp_vars is not None:
            comp_vars = restore_into(self.comp_vars, comp_vars)
        self.comp_vars = comp_vars
        self._place_state()
