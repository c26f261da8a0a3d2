"""SDE library parity against the ACTUAL reference torch code.

tests/test_diffusion.py checks our closed forms against re-derived formulas;
this file removes the shared-derivation blind spot by running the reference's
`diffusion/diffusion_continuous.py` itself (torchdiffeq + cuda-device calls
shimmed out) head-to-head over all four SDE families: f/g2/var/e2int_f,
inv_var round-trips, cross_entropy_const, the VPSDE discrete beta tables, and
`iw_quantities` for every importance-sampling mode on IDENTICAL uniform
draws (torch.rand / jax.random.uniform pinned to the same rho).
"""

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
if not os.path.isdir(REF):
    pytest.skip("reference tree unavailable", allow_module_level=True)
if REF not in sys.path:
    sys.path.append(REF)

if "torchdiffeq" not in sys.modules:
    _td = types.ModuleType("torchdiffeq")
    _td.odeint = None  # only sample_model_ode uses it; not under test here
    sys.modules["torchdiffeq"] = _td

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ldt_tpu.diffusion import make_diffusion  # noqa: E402
from ldt_tpu.tools.io import dict2namespace  # noqa: E402

RHO = np.linspace(0.013, 0.987, 64).astype(np.float32)
T_GRID = np.linspace(0.01, 1.0, 97).astype(np.float32)

_MODES = ("ll_uniform", "ll_iw", "drop_all_uniform", "drop_all_iw",
          "drop_sigma2t_iw", "drop_sigma2t_uniform", "rescale_iw")


def _cfg(**over):
    base = dict(sde_type="vpsde", sigma2_0=0.0, time_eps=0.01,
                sample_time_eps=1e-6, beta_start=0.1, beta_end=20.0,
                sigma2_min=0.01, sigma2_max=50.0, train_N=1000,
                sample_mode="discrete", sample_N=100)
    base.update(over)
    return dict2namespace(base)


@pytest.fixture()
def no_cuda(monkeypatch):
    """Route the reference's hard-coded device='cuda' tensor factories to
    CPU (the module was written for a CUDA-only box)."""
    for name in ("tensor", "rand", "ones", "zeros", "randn", "linspace",
                 "full", "ones_like", "zeros_like", "randn_like"):
        orig = getattr(torch, name)

        def wrap(*a, _orig=orig, **k):
            k.pop("device", None)
            return _orig(*a, **k)

        monkeypatch.setattr(torch, name, wrap)
    yield monkeypatch


def _ref_sde(cfg):
    from diffusion.diffusion_continuous import make_diffusion as ref_make

    return ref_make(cfg)


CFGS = {
    "vpsde": _cfg(),
    "geometric_sde": _cfg(sde_type="geometric_sde"),
    "sub_vpsde": _cfg(sde_type="sub_vpsde"),
    "vesde": _cfg(sde_type="vesde", sigma2_0=0.01),
}


@pytest.mark.parametrize("family", sorted(CFGS))
class TestClosedForms:
    def test_f_g2_var_e2intf(self, no_cuda, family):
        cfg = CFGS[family]
        ref, mine = _ref_sde(cfg), make_diffusion(cfg)
        t_torch = torch.from_numpy(T_GRID)
        t_jax = jnp.asarray(T_GRID)
        for fn in ("f", "g2", "var", "e2int_f"):
            want = getattr(ref, fn)(t_torch).numpy()
            got = np.asarray(getattr(mine, fn)(t_jax))
            np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6,
                                       err_msg=f"{family}.{fn}")

    def test_inv_var_roundtrip(self, no_cuda, family):
        cfg = CFGS[family]
        ref, mine = _ref_sde(cfg), make_diffusion(cfg)
        t = torch.from_numpy(T_GRID)
        try:
            want = ref.inv_var(ref.var(t)).numpy()
        except NotImplementedError:
            with pytest.raises(NotImplementedError):
                mine.inv_var(mine.var(jnp.asarray(T_GRID)))
            return
        got = np.asarray(mine.inv_var(mine.var(jnp.asarray(T_GRID))))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_cross_entropy_const(self, no_cuda, family):
        cfg = CFGS[family]
        ref, mine = _ref_sde(cfg), make_diffusion(cfg)
        want = float(ref.cross_entropy_const(1e-2))
        got = float(mine.cross_entropy_const(1e-2))
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_iw_quantities_all_modes(self, no_cuda, family):
        """Pin rho on both sides; every mode must produce identical
        (t, var_t, m_t, obj_weight, obj_weight_ll, g2_t) — or raise on
        both sides (diffusion_continuous.py:340-592)."""
        cfg = CFGS[family]
        ref, mine = _ref_sde(cfg), make_diffusion(cfg)
        no_cuda.setattr(torch, "rand",
                        lambda *a, **k: torch.from_numpy(RHO.copy()))
        no_cuda.setattr(jax.random, "uniform",
                        lambda rng, shape, **k: jnp.asarray(RHO))
        like_vp = family == "sub_vpsde"
        for mode in _MODES:
            try:
                want = ref.iw_quantities(len(RHO), cfg.time_eps, mode,
                                         like_vp)
            except (NotImplementedError, AssertionError, ValueError) as e:
                with pytest.raises(type(e)):
                    mine.iw_quantities(jax.random.key(0), len(RHO),
                                       cfg.time_eps, mode, like_vp)
                continue
            got = mine.iw_quantities(jax.random.key(0), len(RHO),
                                     cfg.time_eps, mode, like_vp)
            assert len(got) == len(want)
            for i, (g, w) in enumerate(zip(got, want)):
                w = w.numpy() if hasattr(w, "numpy") else np.asarray(w)
                g = np.asarray(g)
                np.testing.assert_allclose(
                    np.broadcast_to(g, np.broadcast_shapes(g.shape, w.shape)),
                    np.broadcast_to(w, np.broadcast_shapes(g.shape, w.shape)),
                    rtol=5e-4, atol=1e-5,
                    err_msg=f"{family}/{mode} output {i}")


class TestDiscreteTables:
    def test_vpsde_beta_tables(self, no_cuda):
        cfg = CFGS["vpsde"]
        ref, mine = _ref_sde(cfg), make_diffusion(cfg)
        np.testing.assert_allclose(np.asarray(mine.betas),
                                   ref.betas.numpy(), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(mine.alphas_cump),
                                   ref.alphas_cump.numpy(), rtol=1e-5)
