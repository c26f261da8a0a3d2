"""Reverse-diffusion samplers as single compiled XLA programs.

TPU-native re-design of the reference's sampling stack
(diffusion/diffusion_continuous.py:88-338). The reference runs a Python loop
of 1000 sequential CUDA launches for the discrete sampler and a *CPU* scipy
RK45 for the continuous one (one host<->device round trip per solver step).
Here:

  * `sample_discrete` — one `lax.scan` over the N predictor(+corrector) steps;
    the entire 1000-step reverse process compiles to a single XLA program.
    Predictors: reversediffusion / ancestral / ddim / eulermaruyama / pndm
    (diffusion_continuous.py:141-191, 260-316); correctors: langevin /
    ancestral (:193-229).
  * `sample_model_ode` — an on-device Dormand-Prince RK45 with adaptive step
    control inside `lax.while_loop` (replaces torchdiffeq's scipy_solver,
    :88-131) — zero host round-trips.

`score_fn(t, x, step) -> (score, params)` follows the trainer contract
(trainer/Latent_SDE_Trainer.py:57-61): `score = -params / std(t)` with
`params` the eps-prediction; label/condition are closed over by the caller.
`step` is the int32 scan index within the fixed N-step schedule — it lets
callers precompute per-step quantities (e.g. AdaLN modulations) outside the
scan and gather by index (see Score.precompute_mods). Samplers WITHOUT a
fixed schedule (the adaptive ODE) pass `step=None`; score_fns that require
`step` must not be used there. The argument is explicit and positional-or-
keyword so wrappers (functools.partial, decorators) compose safely.

Known divergences from the reference (intentional, all verified by the
code-vs-code trajectory tests in tests/test_sde_ref_parity.py):

  * Langevin/Ancestral correctors: the reference compares `self.__class__`
    against *strings* (diffusion_continuous.py:195,216), so their `alpha` is
    always 1; we use the intended discrete alpha table. Correctors are off
    in all shipped configs.
  * VESDE prior scaling: `self.__class__ in ["DiffusionVESDE"]`
    (diffusion_continuous.py:237-240) is the same dead string-compare, so
    the reference never scales the initial draw by sqrt(sigma2_max); we
    apply the intended N(0, sigma2_max) prior.
  * PNDM: the reference's `alphas_cump[t].view(-1, 1)` only broadcasts
    against 2-D latents and CRASHES at the shipped [B, 32, 120] shape
    (diffusion_continuous.py:268-270); our scalar-`at` broadcast implements
    the intended update (trajectory-equal on 2-D shapes where both run).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

#: score_fn(t [B], x [B,*shape], step int32|None) -> (score, eps_prediction)
ScoreFn = Callable[[jax.Array, jax.Array, Optional[jax.Array]],
                   Tuple[jax.Array, jax.Array]]


def sample_discrete(
    sde,
    score_fn: ScoreFn,
    rng: jax.Array,
    num_samples: int,
    shape: Tuple[int, ...],
    N: int,
    predictor: Optional[str] = "ancestral",
    corrector: Optional[str] = None,
    corrector_steps: int = 1,
    time_eps: float = 1e-6,
    probability_flow: bool = False,
    denoise: bool = True,
    snr: float = 0.01,
    unroll: int = 1,
    print_steps: Optional[int] = None,
) -> jax.Array:
    """Reverse-SDE predictor-corrector sampling (diffusion_continuous.py:133-338).

    Returns `[num_samples, *shape]` samples. Static arguments select the
    predictor/corrector at trace time, so the scan body stays branch-free.

    `print_steps` mirrors the reference's trajectory-snapshot option
    (diffusion_continuous.py:239-256; dead there — no caller — kept as a
    working debug surface): the initial noise, every
    `(N-1)//(print_steps-2)`-th step's x_mean, and the final sample are
    returned STACKED as `[K, num_samples, *shape]` (the reference returns a
    Python list). Not supported for PNDM (the reference's print path never
    reaches it either).
    """
    if predictor == "pndm":
        assert print_steps is None, "print_steps unsupported for pndm"
        return _pndm_sampling(sde, score_fn, rng, num_samples, shape, N,
                              time_eps)

    T = 1.0
    full_shape = (num_samples,) + tuple(shape)
    rng, init_rng = jax.random.split(rng)
    x0 = jax.random.normal(init_rng, full_shape)
    if sde.sde_type == "vesde":
        x0 = x0 * jnp.sqrt(sde.sigma2_max)
    timesteps = jnp.linspace(T, time_eps, N)

    def vec(t):
        return jnp.full((num_samples,), t)

    # --- predictors (diffusion_continuous.py:141-191) -----------------------
    def reverse_diffusion(x, t, step, step_rng):
        dt = (1 - time_eps) / N
        f = sde.f(vec(t))[:, None, None] * x
        g2 = sde.g2(vec(t))[:, None, None]
        score, _ = score_fn(vec(t), x, step)
        dx = (f - g2 * score * (0.5 if probability_flow else 1.0)) * dt
        g = jnp.zeros_like(g2) if probability_flow else jnp.sqrt(g2)
        z = jax.random.normal(step_rng, x.shape)
        x_mean = x - dx
        return x_mean + g * z * jnp.sqrt(dt), x_mean

    def ancestral(x, t, step, step_rng):
        idx = (t * (N - 1) / T).astype(jnp.int32)
        beta = sde.betas[idx]
        score, _ = score_fn(vec(t), x, step)
        x_mean = (x + beta * score) / jnp.sqrt(1.0 - beta)
        noise = jax.random.normal(step_rng, x.shape)
        return x_mean + jnp.sqrt(beta) * noise, x_mean

    def ddim(x, t, step, step_rng):
        idx = (t * (N - 1) / T).astype(jnp.int32)
        at = sde.alphas_cump[idx]
        at_next = jnp.where(idx >= 1, sde.alphas_cump[jnp.maximum(idx - 1, 0)],
                            1.0)
        _, params = score_fn(vec(t), x, step)
        x_mean = (jnp.sqrt(at_next) * (x - jnp.sqrt(1 - at) * params)
                  / jnp.sqrt(at) + jnp.sqrt(1 - at_next) * params)
        return x_mean, x_mean

    def euler_maruyama(x, t, step, step_rng):
        dt = -1.0 / N
        z = jax.random.normal(step_rng, x.shape)
        f = sde.f(vec(t))[:, None, None] * x
        g2 = sde.g2(vec(t))[:, None, None]
        score, _ = score_fn(vec(t), x, step)
        f = f - g2 * score * (0.5 if probability_flow else 1.0)
        x_mean = x + f * dt
        g2 = jnp.zeros_like(g2) if probability_flow else g2
        return x_mean + jnp.sqrt(g2) * jnp.sqrt(-dt) * z, x_mean

    # --- correctors (diffusion_continuous.py:193-229) -----------------------
    def discrete_alpha(t):
        if sde.sde_type in ("vpsde", "sub_vpsde"):
            idx = (t * (N - 1) / T).astype(jnp.int32)
            alphas = 1.0 - jnp.linspace(sde.beta_start / N, sde.beta_end / N, N)
            return alphas[idx]
        return jnp.ones(())

    def langevin(x, t, step, step_rng):
        alpha = discrete_alpha(t)
        x_mean = x
        for i in range(corrector_steps):
            step_rng, k = jax.random.split(step_rng)
            grad, _ = score_fn(vec(t), x, step)
            noise = jax.random.normal(k, x.shape)
            grad_norm = jnp.mean(
                jnp.linalg.norm(grad.reshape(grad.shape[0], -1), axis=-1))
            noise_norm = jnp.mean(
                jnp.linalg.norm(noise.reshape(noise.shape[0], -1), axis=-1))
            step_size = (snr * noise_norm / grad_norm) ** 2 * 2 * alpha
            x_mean = x + step_size * grad
            x = x_mean + jnp.sqrt(step_size * 2) * noise
        return x, x_mean

    def ancestral_corrector(x, t, step, step_rng):
        alpha = discrete_alpha(t)
        std = sde.std(t)
        x_mean = x
        for i in range(corrector_steps):
            step_rng, k = jax.random.split(step_rng)
            grad, _ = score_fn(vec(t), x, step)
            noise = jax.random.normal(k, x.shape)
            step_size = (snr * std) ** 2 * 2 * alpha
            x_mean = x + step_size * grad
            x = x_mean + noise * jnp.sqrt(step_size * 2)
        return x, x_mean

    predictors = {
        "reversediffusion": reverse_diffusion,
        "ancestral": ancestral,
        "ddim": ddim,
        "eulermaruyama": euler_maruyama,
    }
    correctors = {"langevin": langevin, "ancestral": ancestral_corrector}
    if predictor is not None and predictor not in predictors:
        raise NotImplementedError(f"predictor not implemented: {predictor}")
    if corrector is not None and corrector not in correctors:
        raise NotImplementedError(f"corrector not implemented: {corrector}")
    pred_fn = predictors.get(predictor)
    corr_fn = correctors.get(corrector)

    # snapshot cadence (diffusion_continuous.py:240-241,252-254)
    interval = ((N - 1) // (print_steps - 2)
                if print_steps is not None else None)
    n_snaps = N // interval if interval else 0

    def body(carry, ti):
        t, i = ti
        x, x_mean, step_rng, snaps = carry
        step_rng, k1, k2 = jax.random.split(step_rng, 3)
        x_mean = x
        if pred_fn is not None:
            x, x_mean = pred_fn(x, t, i, k1)
        if corr_fn is not None:
            x, x_mean = corr_fn(x, t, i, k2)
        if snaps is not None:
            hit = (i + 1) % interval == 0
            slot = jnp.minimum((i + 1) // interval - 1, n_snaps - 1)
            snaps = lax.cond(
                hit,
                lambda s: lax.dynamic_update_index_in_dim(s, x_mean, slot, 0),
                lambda s: s, snaps)
        return (x, x_mean, step_rng, snaps), None

    snaps0 = (jnp.zeros((n_snaps,) + full_shape, x0.dtype)
              if print_steps is not None else None)
    (x, x_mean, _, snaps), _ = lax.scan(
        body, (x0, x0, rng, snaps0),
        (timesteps, jnp.arange(N, dtype=jnp.int32)), unroll=unroll)
    # `denoise` returns the noise-free mean of the final step
    # (diffusion_continuous.py:258).
    final = x_mean if denoise else x
    if print_steps is not None:
        return jnp.concatenate([x0[None], snaps, final[None]], axis=0)
    return final


def _pndm_sampling(sde, score_fn, rng, num_samples, shape, N, time_eps):
    """PNDM pseudo-numerical sampler (diffusion_continuous.py:260-316).

    Runge-Kutta warm-up (3 steps) then 4th-order Adams-Bashforth, one
    `lax.scan` over the N steps with a 4-slot noise ring buffer.
    """
    train_N = sde.train_N
    full_shape = (num_samples,) + tuple(shape)
    x0 = jax.random.normal(rng, full_shape)
    timesteps = jnp.linspace(time_eps, 1.0, N * 2)
    betas = jnp.linspace(sde.beta_start / train_N, sde.beta_end / train_N,
                         train_N)
    alphas_cump = jnp.concatenate(
        [jnp.ones((1,)), jnp.cumprod(1.0 - betas)])  # [train_N + 1]

    def t_of(i):
        """timesteps[i*2 - 1] for integer index i >= 1."""
        return timesteps[i * 2 - 1]

    def transfer(x, t, t_next, et):
        ti = (train_N * (t - time_eps) + 1).astype(jnp.int32)
        tni = (train_N * (t_next - time_eps) + 1).astype(jnp.int32)
        at = alphas_cump[ti]
        at_next = alphas_cump[tni]
        sq, sqn = jnp.sqrt(at), jnp.sqrt(at_next)
        x_delta = (at_next - at) * (
            (1.0 / (sq * (sq + sqn))) * x
            - 1.0 / (sq * (jnp.sqrt((1 - at_next) * at)
                           + jnp.sqrt((1 - at) * at_next))) * et)
        return x + x_delta

    def call_params(t_scalar, x, step):
        # PNDM evaluates at intermediate times within a step; `step` is the
        # enclosing scan iteration (non-fast-path score_fns ignore it).
        _, params = score_fn(jnp.full((num_samples,), t_scalar), x, step)
        return params

    def body(carry, idx):
        x, ets, n_ets = carry
        # idx runs N, N-1, ..., 1; t_next = idx - 1
        t1 = t_of(idx)                                     # timesteps[2i-1]
        t_mid = timesteps[2 * idx - 2]                     # int((i-0.5)*2)-1
        # torch negative indexing wraps: at idx=1, timesteps[-1] is the last
        # entry (diffusion_continuous.py:301). Replicated via mod.
        t3 = timesteps[(2 * (idx - 1) - 1) % (N * 2)]

        step = N - idx  # 0-based scan iteration (idx runs N..1)

        def adams(args):
            x, ets, n_ets = args
            noise_ = call_params(t1, x, step)
            ets = jnp.roll(ets, -1, axis=0).at[3].set(noise_)
            noise = (1.0 / 24) * (55 * ets[3] - 59 * ets[2]
                                  + 37 * ets[1] - 9 * ets[0])
            return noise, ets, n_ets + 1

        def runge_kutta(args):
            x, ets, n_ets = args
            e_1 = call_params(t1, x, step)
            ets = jnp.roll(ets, -1, axis=0).at[3].set(e_1)
            x_2 = transfer(x, t1, t_mid, e_1)
            e_2 = call_params(t_mid, x_2, step)
            x_3 = transfer(x, t1, t_mid, e_2)
            e_3 = call_params(t_mid, x_3, step)
            x_4 = transfer(x, t1, t3, e_3)
            e_4 = call_params(t3, x_4, step)
            et = (1.0 / 6) * (e_1 + 2 * e_2 + 2 * e_3 + e_4)
            return et, ets, n_ets + 1

        noise, ets, n_ets = lax.cond(n_ets > 2, adams, runge_kutta,
                                     (x, ets, n_ets))
        x = transfer(x, t1, t3, noise)
        return (x, ets, n_ets), None

    ets0 = jnp.zeros((4,) + full_shape)
    idxs = jnp.arange(N, 0, -1)
    (x, _, _), _ = lax.scan(body, (x0, ets0, jnp.int32(0)), idxs)
    return x


# ---------------------------------------------------------------------------
# On-device adaptive RK45 (Dormand-Prince) ODE sampler
# ---------------------------------------------------------------------------

# plain Python constants: creating device arrays at module import would
# initialize a jax backend as an import side effect
_DOPRI_C = (0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0)
_DOPRI_A = (
    (),
    (1 / 5,),
    (3 / 40, 9 / 40),
    (44 / 45, -56 / 15, 32 / 9),
    (19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729),
    (9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656),
    (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84),
)
_DOPRI_B5 = (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0)
_DOPRI_B4 = (5179 / 57600, 0.0, 7571 / 16695, 393 / 640, -92097 / 339200,
             187 / 2100, 1 / 40)


def sample_model_ode(
    sde,
    score_fn: ScoreFn,
    rng: jax.Array,
    num_samples: int,
    shape: Tuple[int, ...],
    ode_eps: float = 1e-6,
    ode_solver_tol: float = 1e-5,
    noise: Optional[jax.Array] = None,
    max_steps: int = 10000,
):
    """Probability-flow ODE sampling with an on-device adaptive RK45.

    Matches `DiffusionBase.sample_model_ode` (diffusion_continuous.py:88-131):
    integrates dx/dt = f(t) x - 0.5 g2(t) score(t, x) from t=1 down to
    `ode_eps` with atol=rtol=`ode_solver_tol`. Returns (samples, nfe).
    """
    full_shape = (num_samples,) + tuple(shape)
    if noise is None:
        noise = jax.random.normal(rng, full_shape)
    if sde.sde_type == "vesde":
        noise = noise * jnp.sqrt(sde.sigma2_max)

    def ode_func(t, x):
        tv = jnp.full((num_samples,), t)
        # adaptive solver: no fixed schedule, so no step index (see module
        # docstring — step-dependent fast-path score_fns are invalid here)
        score, _ = score_fn(tv, x, None)
        return sde.f(tv)[:, None, None] * x \
            - 0.5 * sde.g2(tv)[:, None, None] * score

    t0, t1 = 1.0, ode_eps
    tol = ode_solver_tol

    def err_norm(err, x, x_new):
        scale = tol + tol * jnp.maximum(jnp.abs(x), jnp.abs(x_new))
        return jnp.sqrt(jnp.mean(jnp.square(err / scale)))

    def cond(state):
        t, x, h, nfe, steps = state
        return (t > t1 + 1e-12) & (steps < max_steps)

    def step(state):
        t, x, h, nfe, steps = state
        h_eff = jnp.where(t + h < t1, t1 - t, h)  # h negative: don't overshoot
        ks = []
        for i in range(7):
            xi = x
            for j, a in enumerate(_DOPRI_A[i]):
                xi = xi + h_eff * a * ks[j]
            ks.append(ode_func(t + _DOPRI_C[i] * h_eff, xi))
        x5 = x + h_eff * sum(b * k for b, k in zip(_DOPRI_B5, ks))
        x4 = x + h_eff * sum(b * k for b, k in zip(_DOPRI_B4, ks))
        err = err_norm(x5 - x4, x, x5)
        accept = err <= 1.0
        t_new = jnp.where(accept, t + h_eff, t)
        x_new = jnp.where(accept, x5, x)
        factor = jnp.clip(0.9 * jnp.power(jnp.maximum(err, 1e-10), -0.2),
                          0.2, 5.0)
        h = h_eff * factor
        return (t_new, x_new, h, nfe + 6, steps + 1)

    h0 = -(t0 - t1) / 100.0
    state = (jnp.asarray(t0), noise, jnp.asarray(h0), jnp.int32(0),
             jnp.int32(0))
    t, x, h, nfe, steps = lax.while_loop(cond, step, state)
    return x, nfe
