"""Train state, optimizer factory, LR schedule, EMA.

The reference couples these imperatively (torch Adam + an EMA optimizer
wrapper holding shadow params in optimizer state, tools/utils.py:25-101, and
per-iter warm-up + per-epoch cosine LR mutation, trainer/base.py:32-37 /
train_Compressor.py:46-47). Here everything is an explicit pytree:

  * `TrainState` carries (params, ema_params, opt_state, batch_stats, step);
  * the optimizer is `clip_by_global_norm -> scale_by_adam`, with the
    learning rate supplied per step as a traced scalar so the host-side
    schedule logic (warm-up, cosine, NaN-watchdog halving) needs no
    recompilation;
  * EMA is a one-line pytree lerp after each update.

EMA semantics note: the reference's double-swap discipline
(trainer/Latent_SDE_Trainer.py:99-107 + tools/utils.py:80-101) nets out to
gradient steps on the raw params with the EMA copy stored in optimizer state
— but its `sample()` swap then samples with the *raw* params. We keep the
clearly-intended semantics instead: train on `params`, sample/eval with
`ema_params` (equal to params when ema_decay == 0).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    ema_params: Any
    opt_state: Any
    batch_stats: Any = None

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation,
               batch_stats=None, ema: bool = True):
        # ema starts as a distinct copy: params and ema_params must not alias
        # the same buffers (the train step donates the whole state).
        ema_params = jax.tree_util.tree_map(jnp.copy, params) if ema else None
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   ema_params=ema_params,
                   opt_state=tx.init(params), batch_stats=batch_stats)

    def eval_params(self):
        """Parameters for sampling/eval: EMA when maintained."""
        return self.ema_params if self.ema_params is not None else self.params


def scale_by_adam_q(b1: float, b2: float, eps: float,
                    moment_dtype) -> optax.GradientTransformation:
    """`optax.scale_by_adam` with BOTH moments stored in `moment_dtype`.

    The flagship stage-2 update is HBM-bound on optimizer-state traffic
    (~16 GB/step of param/moment/EMA reads+writes at 457M params, see
    docs/train_step_profile notes): the f32 mu/nu read+write is ~7.3 GB of
    that. Storing the moments in bfloat16 halves it. All arithmetic stays
    f32 — moments are upcast in-register, the update is computed from the
    PRE-truncation f32 values, and only the stored copy is rounded, so the
    per-step update direction is exact; the quantization error enters only
    through the carried state. (optax's own `mu_dtype` covers mu only; nu
    is the same traffic.)

    Numerics caveat (why this is an opt-in knob, not the default): with
    b2 = 0.999 the per-step relative change of a stationary nu is ~1e-3,
    below the bf16 ulp (~4e-3) — small nu drifts can be absorbed by
    rounding. Empirically the trajectories track f32 closely
    (tests/test_training.py::TestMomentDtype and the TPU loss check in
    README); the reference has no analog (torch Adam is f32-only).
    State structure is `optax.ScaleByAdamState`, so checkpoints, TP
    moment co-sharding and `_is_moment_path` are unchanged, and
    `restore_into`'s dtype recast makes f32<->bf16 resumes transparent.
    """
    md = jnp.dtype(moment_dtype)

    def init_fn(params):
        zeros = lambda p: jnp.zeros_like(p, dtype=md)  # noqa: E731
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree_util.tree_map(zeros, params),
            nu=jax.tree_util.tree_map(zeros, params))

    def update_fn(updates, state, params=None):
        del params
        mu = jax.tree_util.tree_map(
            lambda g, m: b1 * m.astype(jnp.float32)
            + (1.0 - b1) * g.astype(jnp.float32), updates, state.mu)
        nu = jax.tree_util.tree_map(
            lambda g, v: b2 * v.astype(jnp.float32)
            + (1.0 - b2) * jnp.square(g.astype(jnp.float32)),
            updates, state.nu)
        count = optax.safe_int32_increment(state.count)
        c = count.astype(jnp.float32)
        bc1 = 1.0 - b1 ** c
        bc2 = 1.0 - b2 ** c
        new_updates = jax.tree_util.tree_map(
            lambda m, v, g: ((m / bc1) / (jnp.sqrt(v / bc2) + eps)
                             ).astype(g.dtype), mu, nu, updates)
        store = lambda t: jax.tree_util.tree_map(  # noqa: E731
            lambda x: x.astype(md), t)
        return new_updates, optax.ScaleByAdamState(
            count=count, mu=store(mu), nu=store(nu))

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(beta1: float = 0.9, beta2: float = 0.999,
                   weight_decay: float = 0.0,
                   grad_clip: Optional[float] = 1.0,
                   moment_dtype: str = "float32") -> optax.GradientTransformation:
    """clip -> adam direction (LR applied by the caller via `apply_updates_lr`).

    Matches torch `Adam(lr, betas, weight_decay)` + `clip_grad_norm_`
    (trainer/Compressor_Trainer.py:24-26,37-38): clipping runs on raw grads
    before the Adam moments, like the reference's clip-then-step order.

    `moment_dtype` ("float32" default / "bfloat16") selects the Adam moment
    STORAGE precision — see `scale_by_adam_q`. float32 keeps the stock
    optax transform (bit-identical to previous behavior).
    """
    parts = []
    if grad_clip is not None:
        parts.append(optax.clip_by_global_norm(grad_clip))
    if weight_decay:
        # torch Adam folds weight decay into the gradients BEFORE the moment
        # estimates (L2 style), unlike AdamW's decoupled decay — keep that
        # order for parity (all shipped configs use weight_decay=0).
        parts.append(optax.add_decayed_weights(weight_decay))
    if jnp.dtype(moment_dtype) == jnp.float32:
        parts.append(optax.scale_by_adam(b1=beta1, b2=beta2, eps=1e-8))
    else:
        parts.append(scale_by_adam_q(beta1, beta2, 1e-8, moment_dtype))
    return optax.chain(*parts)


def apply_update(state: TrainState, grads, tx: optax.GradientTransformation,
                 lr, ema_decay: float = 0.0,
                 new_batch_stats=None) -> TrainState:
    """One optimizer step with traced lr + EMA accumulation."""
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = jax.tree_util.tree_map(
        lambda p, u: p - lr * u, state.params, updates)
    if state.ema_params is not None and ema_decay > 0:
        # The reference seeds the shadow at the FIRST step with the
        # post-step params (tools/utils.py:48-50: `state['ema'] =
        # p.data.clone()` after optimizer.step, then the blend collapses to
        # ema = p). Blending against the INIT params instead keeps a
        # decay^k-weighted ghost of the random init in every eval for the
        # first ~1/(1-decay) steps. Matched exactly
        # (tests/test_opt_ref_parity.py).
        is_first = state.step == 0
        ema_params = jax.tree_util.tree_map(
            lambda e, p: jnp.where(is_first, p,
                                   e * ema_decay + p * (1.0 - ema_decay)),
            state.ema_params, params)
    elif state.ema_params is not None:
        # decay == 0: EMA trails params exactly; copy to avoid buffer aliasing
        ema_params = jax.tree_util.tree_map(jnp.copy, params)
    else:
        ema_params = None
    return state.replace(
        step=state.step + 1, params=params, ema_params=ema_params,
        opt_state=opt_state,
        batch_stats=(new_batch_stats if new_batch_stats is not None
                     else state.batch_stats))


def make_lr_fn(base_lr: float, warmup_iters: int, epochs: int):
    """Reference LR dynamics: per-iter linear warm-up (trainer/base.py:32-37)
    then per-epoch cosine annealing to 0 (CosineAnnealingLR(T_max=epochs),
    trainer/Compressor_Trainer.py:27), with `scheduler.step(epoch)` fired at
    the START of an epoch only once `itr > warmup_iters` held there
    (train_Compressor.py:46-47). That gate means the cosine does NOT engage
    mid-epoch when warm-up completes — lr stays at base until the next
    epoch boundary (and for the whole first epoch when warmup_iters == 0).

    Returns lr(itr, epoch, itr_epoch_start) -> float, evaluated host-side
    each step; `itr_epoch_start` is the global itr at the current epoch's
    first update (BaseTrainer tracks it; resume paths set it to the resumed
    itr — resume lands on an epoch boundary, which reproduces both the
    reference's step-on-resume (Compressor_Trainer.py:182) and its
    warm_up-overwrite-until-next-boundary behavior when resuming
    mid-warm-up; None = assume engaged). Exactness proven against a live
    torch CosineAnnealingLR loop in tests/test_lr_ref_parity.py, including
    a mid-warm-up resume.
    """

    def lr_fn(itr: int, epoch: int,
              itr_epoch_start: Optional[int] = None) -> float:
        if itr < warmup_iters:
            return base_lr * min(float(itr + 1) / max(warmup_iters, 1), 1.0)
        if itr_epoch_start is not None and itr_epoch_start <= warmup_iters:
            return base_lr  # warm_up's last setting; scheduler not engaged
        return base_lr * 0.5 * (1.0 + math.cos(math.pi * epoch / epochs))

    return lr_fn
