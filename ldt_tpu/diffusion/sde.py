"""SDE families for latent diffusion, as pure-function JAX classes.

TPU-native re-design of the reference `diffusion/diffusion_continuous.py`
(Negai-98/LDT; NVIDIA-LSGM lineage). Every method is a pure function of `t`
(a traced array), so the whole SDE vocabulary inlines into jitted training
steps and `lax.scan` samplers. Constants (erf normalizers, discrete beta /
alpha-bar tables) are precomputed host-side at construction.

Classes mirror the reference one-to-one:
  * `DiffusionGeometric` — diffusion_continuous.py:595-623
  * `DiffusionVPSDE`     — diffusion_continuous.py:626-678 (incl. discrete
    beta/alpha-cumprod tables used by the ancestral/DDIM/PNDM samplers)
  * `DiffusionSubVPSDE`  — diffusion_continuous.py:681-729
  * `DiffusionVESDE`     — diffusion_continuous.py:732-763
  * `iw_quantities` importance-sampling (7 modes per family)
                         — diffusion_continuous.py:340-592
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.scipy.special import erf, erfinv


def make_diffusion(args):
    """Diffusion factory (diffusion_continuous.py:18-29)."""
    table = {
        "geometric_sde": DiffusionGeometric,
        "vpsde": DiffusionVPSDE,
        "sub_vpsde": DiffusionSubVPSDE,
        "vesde": DiffusionVESDE,
    }
    if args.sde_type not in table:
        raise ValueError(f"Unrecognized sde type: {args.sde_type}")
    return table[args.sde_type](args)


class DiffusionBase:
    """Shared diffusion API (diffusion_continuous.py:32-86)."""

    def __init__(self, args):
        self.sigma2_0 = args.sigma2_0
        self.sde_type = args.sde_type
        self.time_eps = args.time_eps
        self.sample_time_eps = getattr(args, "sample_time_eps", args.time_eps)

    # --- pure functions of t -------------------------------------------------
    def f(self, t):
        raise NotImplementedError

    def g2(self, t):
        raise NotImplementedError

    def var(self, t):
        raise NotImplementedError

    def e2int_f(self, t):
        raise NotImplementedError

    def inv_var(self, var):
        raise NotImplementedError

    def std(self, t):
        return jnp.sqrt(self.var(t))

    def sample_q(self, x_init, noise, var_t, m_t):
        """Diffuse to time t: m_t * x0 + sqrt(var_t) * noise (:78-80)."""
        return m_t * x_init + jnp.sqrt(var_t) * noise

    def cross_entropy_const(self, ode_eps):
        """0.5*(1 + log(2*pi*var(ode_eps))) (:83-86)."""
        return 0.5 * (1.0 + jnp.log(2.0 * jnp.pi * self.var(jnp.asarray(ode_eps))))

    # --- importance sampling -------------------------------------------------
    def iw_quantities(self, rng, size, time_eps, iw_sample_mode,
                      iw_subvp_like_vp_sde=False):
        """Sample (t, var_t, m_t, obj_weight, obj_weight_ll, g2_t) for the
        weighted score-matching objective (diffusion_continuous.py:340-348).

        Returns broadcast-ready `[B, 1]` columns except t which is `[B]`.
        """
        if self.sde_type in ("geometric_sde", "vpsde"):
            return self._iw_vpsdelike(rng, size, time_eps, iw_sample_mode)
        if self.sde_type == "sub_vpsde":
            return self._iw_subvpsdelike(rng, size, time_eps, iw_sample_mode,
                                         iw_subvp_like_vp_sde)
        if self.sde_type == "vesde":
            return self._iw_vesde(rng, size, time_eps, iw_sample_mode)
        raise NotImplementedError

    def _iw_vpsdelike(self, rng, size, time_eps, mode):
        """diffusion_continuous.py:351-423."""
        rho = jax.random.uniform(rng, (size,))
        ones = jnp.ones_like(rho)

        if mode == "ll_uniform":
            t = rho * (1.0 - time_eps) + time_eps
            var_t, m_t, g2_t = self.var(t), self.e2int_f(t), self.g2(t)
            obj = obj_ll = g2_t / (2.0 * var_t)
        elif mode == "ll_iw":
            s2_1, s2_eps = self.var(ones), self.var(time_eps * ones)
            log_1, log_eps = jnp.log(s2_1), jnp.log(s2_eps)
            var_t = jnp.exp(rho * log_1 + (1 - rho) * log_eps)
            t = self.inv_var(var_t)
            m_t, g2_t = self.e2int_f(t), self.g2(t)
            obj = obj_ll = 0.5 * (log_1 - log_eps) / (1.0 - var_t)
        elif mode == "drop_all_uniform":
            t = rho * (1.0 - time_eps) + time_eps
            var_t, m_t, g2_t = self.var(t), self.e2int_f(t), self.g2(t)
            obj = jnp.ones_like(rho)
            obj_ll = g2_t / (2.0 * var_t)
        elif mode == "drop_all_iw":
            assert self.sde_type == "vpsde", (
                "drop_all_iw importance sampling needs the regular VPSDE")
            t = (jnp.sqrt(1.0 / self.delta_beta_half)
                 * erfinv(rho * self.const_norm_2 + self.const_erf)
                 - self.beta_frac)
            var_t, m_t, g2_t = self.var(t), self.e2int_f(t), self.g2(t)
            obj = self.const_norm / (1.0 - var_t)
            obj_ll = obj * g2_t / (2.0 * var_t)
        elif mode == "drop_sigma2t_iw":
            s2_1, s2_eps = self.var(ones), self.var(time_eps * ones)
            var_t = rho * s2_1 + (1 - rho) * s2_eps
            t = self.inv_var(var_t)
            m_t, g2_t = self.e2int_f(t), self.g2(t)
            obj = 0.5 * (s2_1 - s2_eps) / (1.0 - var_t)
            obj_ll = obj / var_t
        elif mode == "drop_sigma2t_uniform":
            t = rho * (1.0 - time_eps) + time_eps
            var_t, m_t, g2_t = self.var(t), self.e2int_f(t), self.g2(t)
            obj = g2_t / 2.0
            obj_ll = g2_t / (2.0 * var_t)
        elif mode == "rescale_iw":
            t = rho * (1.0 - time_eps) + time_eps
            var_t, m_t, g2_t = self.var(t), self.e2int_f(t), self.g2(t)
            obj = 0.5 / (1.0 - var_t)
            obj_ll = g2_t / (2.0 * var_t)
        else:
            raise ValueError(f"Unrecognized importance sampling type: {mode}")

        col = lambda v: jnp.broadcast_to(v, (size,)).reshape(size, 1)
        return t, col(var_t), col(m_t), col(obj), col(obj_ll), col(g2_t)

    def _iw_subvpsdelike(self, rng, size, time_eps, mode, like_vp):
        """diffusion_continuous.py:425-512."""
        rho = jax.random.uniform(rng, (size,))
        ones = jnp.ones_like(rho)

        if mode == "ll_uniform":
            t = rho * (1.0 - time_eps) + time_eps
            var_t, m_t, g2_t = self.var(t), self.e2int_f(t), self.g2(t)
            obj = obj_ll = g2_t / (2.0 * var_t)
        elif mode == "ll_iw":
            if not like_vp:
                raise NotImplementedError
            s2_1, s2_eps = self.var_vpsde(ones), self.var_vpsde(time_eps * ones)
            log_1, log_eps = jnp.log(s2_1), jnp.log(s2_eps)
            var_vp = jnp.exp(rho * log_1 + (1 - rho) * log_eps)
            t = self.inv_var_vpsde(var_vp)
            var_t, m_t, g2_t = self.var(t), self.e2int_f(t), self.g2(t)
            obj = obj_ll = (g2_t / (2.0 * var_t) * (log_1 - log_eps)
                            * var_vp / (1 - var_vp) / self.beta(t))
        elif mode == "drop_all_uniform":
            t = rho * (1.0 - time_eps) + time_eps
            var_t, m_t, g2_t = self.var(t), self.e2int_f(t), self.g2(t)
            obj = jnp.ones_like(rho)
            obj_ll = g2_t / (2.0 * var_t)
        elif mode == "drop_all_iw":
            if not like_vp:
                raise NotImplementedError
            assert self.sde_type == "sub_vpsde"
            t = (jnp.sqrt(1.0 / self.delta_beta_half)
                 * erfinv(rho * self.const_norm_2 + self.const_erf)
                 - self.beta_frac)
            var_t, m_t, g2_t = self.var(t), self.e2int_f(t), self.g2(t)
            obj = self.const_norm / (1.0 - self.var_vpsde(t))
            obj_ll = obj * g2_t / (2.0 * var_t)
        elif mode == "drop_sigma2t_iw":
            if not like_vp:
                raise NotImplementedError
            s2_1, s2_eps = self.var_vpsde(ones), self.var_vpsde(time_eps * ones)
            var_vp = rho * s2_1 + (1 - rho) * s2_eps
            t = self.inv_var_vpsde(var_vp)
            var_t, m_t, g2_t = self.var(t), self.e2int_f(t), self.g2(t)
            obj = 0.5 * g2_t / self.beta(t) * (s2_1 - s2_eps) / (1.0 - var_vp)
            obj_ll = obj / var_t
        elif mode == "drop_sigma2t_uniform":
            t = rho * (1.0 - time_eps) + time_eps
            var_t, m_t, g2_t = self.var(t), self.e2int_f(t), self.g2(t)
            obj = g2_t / 2.0
            obj_ll = g2_t / (2.0 * var_t)
        elif mode == "rescale_iw":
            t = rho * (1.0 - time_eps) + time_eps
            var_t, m_t, g2_t = self.var(t), self.e2int_f(t), self.g2(t)
            obj = 0.5 / (1.0 - var_t)
            obj_ll = g2_t / (2.0 * var_t)
        else:
            raise ValueError(f"Unrecognized importance sampling type: {mode}")

        col = lambda v: jnp.broadcast_to(v, (size,)).reshape(size, 1)
        return t, col(var_t), col(m_t), col(obj), col(obj_ll), col(g2_t)

    def _iw_vesde(self, rng, size, time_eps, mode):
        """diffusion_continuous.py:514-592."""
        rho = jax.random.uniform(rng, (size,))
        ones = jnp.ones_like(rho)

        if mode == "ll_uniform":
            t = rho * (1.0 - time_eps) + time_eps
            var_t, m_t, g2_t = self.var(t), self.e2int_f(t), self.g2(t)
            obj = obj_ll = g2_t / (2.0 * var_t)
        elif mode in ("ll_iw", "drop_all_iw"):
            n_1, n_eps = self.var_N(ones), self.var_N(time_eps * ones)
            s2_eps = self.var(time_eps * ones)
            log_f1 = jnp.log(self.sigma2_max / n_1)
            log_feps = jnp.log(n_eps / s2_eps)
            var_n = (1.0 - self.sigma2_min) / (
                1.0 - jnp.exp(rho * (log_f1 + log_feps) - log_feps))
            t = self.inv_var_N(var_n)
            var_t, m_t, g2_t = self.var(t), self.e2int_f(t), self.g2(t)
            obj_ll = 0.5 * (log_f1 + log_feps) * self.var_N(t) / (
                1.0 - self.sigma2_min)
            if mode == "ll_iw":
                obj = obj_ll
            else:
                obj = 2.0 * obj_ll / math.log(self.sigma2_max / self.sigma2_min)
        elif mode == "drop_all_uniform":
            t = rho * (1.0 - time_eps) + time_eps
            var_t, m_t, g2_t = self.var(t), self.e2int_f(t), self.g2(t)
            obj = jnp.ones_like(rho)
            obj_ll = g2_t / (2.0 * var_t)
        elif mode == "drop_sigma2t_iw":
            n_1, n_eps = self.var_N(ones), self.var_N(time_eps * ones)
            var_n = jnp.exp(rho * jnp.log(n_1) + (1 - rho) * jnp.log(n_eps))
            t = self.inv_var_N(var_n)
            var_t, m_t, g2_t = self.var(t), self.e2int_f(t), self.g2(t)
            obj = 0.5 * jnp.log(n_1 / n_eps) * self.var_N(t)
            obj_ll = obj / var_t
        elif mode == "drop_sigma2t_uniform":
            t = rho * (1.0 - time_eps) + time_eps
            var_t, m_t, g2_t = self.var(t), self.e2int_f(t), self.g2(t)
            obj = g2_t / 2.0
            obj_ll = g2_t / (2.0 * var_t)
        elif mode == "rescale_iw":
            t = rho * (1.0 - time_eps) + time_eps
            var_t, m_t, g2_t = self.var(t), self.e2int_f(t), self.g2(t)
            obj = 0.5 / (1.0 - var_t)
            obj_ll = g2_t / (2.0 * var_t)
        else:
            raise ValueError(f"Unrecognized importance sampling type: {mode}")

        col = lambda v: jnp.broadcast_to(v, (size,)).reshape(size, 1)
        return t, col(var_t), col(m_t), col(obj), col(obj_ll), col(g2_t)


class DiffusionGeometric(DiffusionBase):
    """Geometric-variance VPSDE variant (diffusion_continuous.py:595-623)."""

    def __init__(self, args):
        super().__init__(args)
        self.sigma2_min = args.sigma2_min
        self.sigma2_max = args.sigma2_max

    def f(self, t):
        return -0.5 * self.g2(t)

    def g2(self, t):
        sigma2_geom = self.sigma2_min * ((self.sigma2_max / self.sigma2_min) ** t)
        log_term = math.log(self.sigma2_max / self.sigma2_min)
        return sigma2_geom * log_term / (
            1.0 - self.sigma2_0 + self.sigma2_min - sigma2_geom)

    def var(self, t):
        return (self.sigma2_min * ((self.sigma2_max / self.sigma2_min) ** t)
                - self.sigma2_min + self.sigma2_0)

    def e2int_f(self, t):
        return jnp.sqrt(1.0 + self.sigma2_min
                        * (1.0 - (self.sigma2_max / self.sigma2_min) ** t)
                        / (1.0 - self.sigma2_0))

    def inv_var(self, var):
        return (jnp.log((var + self.sigma2_min - self.sigma2_0) / self.sigma2_min)
                / math.log(self.sigma2_max / self.sigma2_min))


class DiffusionVPSDE(DiffusionBase):
    """Linear-beta VPSDE (diffusion_continuous.py:626-678)."""

    def __init__(self, args):
        super().__init__(args)
        self.beta_start = args.beta_start
        self.beta_end = args.beta_end
        # auxiliary constants for drop_all_iw (:637-645)
        self.delta_beta_half = 0.5 * (self.beta_end - self.beta_start)
        self.beta_frac = self.beta_start / (self.beta_end - self.beta_start)
        self.const_aq = ((1.0 - self.sigma2_0) * math.exp(0.5 * self.beta_frac)
                         * math.sqrt(0.25 * math.pi / self.delta_beta_half))
        sqrt_dbh = math.sqrt(self.delta_beta_half)
        self.const_erf = math.erf(sqrt_dbh * (self.time_eps + self.beta_frac))
        erf_at_1 = math.erf(sqrt_dbh * (1.0 + self.beta_frac))
        self.const_norm = self.const_aq * (erf_at_1 - self.const_erf)
        self.const_norm_2 = erf_at_1 - self.const_erf
        self.train_N = getattr(args, "train_N", 1000)
        # discrete tables (:647-653)
        if getattr(args, "sample_mode", "discrete") == "discrete":
            self.N = args.sample_N
            self.betas = jnp.linspace(self.beta_start / self.N,
                                      self.beta_end / self.N, self.N)
            self.alpha = 1.0 - self.betas
            self.alphas_cump = jnp.cumprod(self.alpha)

    def f(self, t):
        return -0.5 * self.g2(t)

    def g2(self, t):
        return self.beta_start + (self.beta_end - self.beta_start) * t

    def discrete(self, idx):
        return self.betas[idx], self.alpha[idx]

    def var(self, t):
        return 1.0 - (1.0 - self.sigma2_0) * jnp.exp(
            -self.beta_start * t - 0.5 * (self.beta_end - self.beta_start) * t * t)

    def e2int_f(self, t):
        return jnp.exp(-0.5 * self.beta_start * t
                       - 0.25 * (self.beta_end - self.beta_start) * t * t)

    def inv_var(self, var):
        c = jnp.log((1 - var) / (1 - self.sigma2_0))
        a = self.beta_end - self.beta_start
        return (-self.beta_start
                + jnp.sqrt(self.beta_start ** 2 - 2 * a * c)) / a


class DiffusionSubVPSDE(DiffusionBase):
    """Sub-VPSDE (diffusion_continuous.py:681-729)."""

    def __init__(self, args):
        super().__init__(args)
        self.beta_start = args.beta_start
        self.beta_end = args.beta_end
        self.delta_beta_half = 0.5 * (self.beta_end - self.beta_start)
        self.beta_frac = self.beta_start / (self.beta_end - self.beta_start)
        self.const_aq = ((1.0 - self.sigma2_0) * math.exp(0.5 * self.beta_frac)
                         * math.sqrt(0.25 * math.pi / self.delta_beta_half))
        sqrt_dbh = math.sqrt(self.delta_beta_half)
        self.const_erf = math.erf(sqrt_dbh * (self.time_eps + self.beta_frac))
        erf_at_1 = math.erf(sqrt_dbh * (1.0 + self.beta_frac))
        self.const_norm = self.const_aq * (erf_at_1 - self.const_erf)
        self.const_norm_2 = erf_at_1 - self.const_erf

    def beta(self, t):
        return self.beta_start + (self.beta_end - self.beta_start) * t

    def f(self, t):
        return -0.5 * self.beta(t)

    def g2(self, t):
        return self.beta(t) * (1.0 - jnp.exp(
            -2.0 * self.beta_start * t - (self.beta_end - self.beta_start) * t * t))

    def var(self, t):
        int_term = jnp.exp(-self.beta_start * t
                           - 0.5 * (self.beta_end - self.beta_start) * t * t)
        return jnp.square(1.0 - int_term) + self.sigma2_0 * int_term

    def e2int_f(self, t):
        return jnp.exp(-0.5 * self.beta_start * t
                       - 0.25 * (self.beta_end - self.beta_start) * t * t)

    def inv_var(self, var):
        raise NotImplementedError

    def var_vpsde(self, t):
        return 1.0 - (1.0 - self.sigma2_0) * jnp.exp(
            -self.beta_start * t - 0.5 * (self.beta_end - self.beta_start) * t * t)

    def inv_var_vpsde(self, var):
        c = jnp.log((1 - var) / (1 - self.sigma2_0))
        a = self.beta_end - self.beta_start
        return (-self.beta_start
                + jnp.sqrt(self.beta_start ** 2 - 2 * a * c)) / a


class DiffusionVESDE(DiffusionBase):
    """VESDE (diffusion_continuous.py:732-763)."""

    def __init__(self, args):
        super().__init__(args)
        self.sigma2_min = args.sigma2_min
        self.sigma2_max = args.sigma2_max
        assert self.sigma2_min == self.sigma2_0, (
            "VESDE assumes sigma2_min == sigma2_0")

    def f(self, t):
        return jnp.zeros_like(t)

    def g2(self, t):
        return (self.sigma2_min * math.log(self.sigma2_max / self.sigma2_min)
                * ((self.sigma2_max / self.sigma2_min) ** t))

    def var(self, t):
        return (self.sigma2_min * ((self.sigma2_max / self.sigma2_min) ** t)
                - self.sigma2_min + self.sigma2_0)

    def e2int_f(self, t):
        return jnp.ones_like(t)

    def inv_var(self, var):
        return (jnp.log((var + self.sigma2_min - self.sigma2_0) / self.sigma2_min)
                / math.log(self.sigma2_max / self.sigma2_min))

    def var_N(self, t):
        return (1.0 - self.sigma2_min
                + self.sigma2_min * ((self.sigma2_max / self.sigma2_min) ** t))

    def inv_var_N(self, var):
        return (jnp.log((var + self.sigma2_min - 1.0) / self.sigma2_min)
                / math.log(self.sigma2_max / self.sigma2_min))
