"""Stage-2 training-objective parity against the ACTUAL reference
`Latent_SDE_Trainer.update_score` (reference trainer/Latent_SDE_Trainer.py:
111-141) — the flagship loss the 457M score net descends.

The reference method is run head-to-head with our production
`score_objective` on ported twin weights and pinned draws (eta pinned via
torch.randn_like, discrete-t via seeded np.random.choice, continuous-t rho
via torch.rand / jax.random.uniform patches). The reference optimizer is an
lr=0 SGD so its step cannot move the weights being compared.
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
sys.path.insert(0, os.path.dirname(__file__))

if "torchdiffeq" not in sys.modules:
    _td = types.ModuleType("torchdiffeq")
    _td.odeint = None
    sys.modules["torchdiffeq"] = _td
if "mitsuba" not in sys.modules:  # reference trainer imports tools.vis_utils
    sys.modules["mitsuba"] = types.ModuleType("mitsuba")

# installs the pointnet2/torchvision/.to("cuda") shims at import
from test_port import SCORE_CFG  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ldt_tpu.diffusion import make_diffusion  # noqa: E402
from ldt_tpu.models import Score  # noqa: E402
from ldt_tpu.tools.io import dict2namespace  # noqa: E402
from ldt_tpu.tools.port import port_score  # noqa: E402
from ldt_tpu.training.latent_sde_trainer import score_objective  # noqa: E402

B = 4
TRAIN_N = 32
SDE_CFG = dict(sde_type="vpsde", sigma2_0=0.0, time_eps=0.01,
               sample_time_eps=1e-6, beta_start=0.1, beta_end=20.0,
               sigma2_min=0.01, sigma2_max=50.0, train_N=TRAIN_N,
               sample_mode="discrete", sample_N=10)


@pytest.fixture()
def no_cuda(monkeypatch):
    for name in ("tensor", "rand", "ones", "zeros", "randn", "linspace",
                 "full", "ones_like", "zeros_like"):
        orig = getattr(torch, name)

        def wrap(*a, _orig=orig, **k):
            k.pop("device", None)
            return _orig(*a, **k)

        monkeypatch.setattr(torch, name, wrap)
    yield monkeypatch


def _build(loss_type, iw_p_mode):
    from model.scorenet.score import Score as RefScore
    from trainer.Latent_SDE_Trainer import Trainer as RefTrainer
    from diffusion.diffusion_continuous import make_diffusion as ref_make

    torch.manual_seed(3)
    ref_s = RefScore(dict2namespace(dict(SCORE_CFG)))
    score_vars = jax.tree_util.tree_map(jnp.asarray,
                                        port_score(ref_s.state_dict()))
    mine_s = Score(dict2namespace(dict(SCORE_CFG)), ref_merge=True)

    sde_cfg = dict2namespace(dict(SDE_CFG))
    ref_sde, mine_sde = ref_make(sde_cfg), make_diffusion(sde_cfg)

    tr = RefTrainer.__new__(RefTrainer)
    tr.model = ref_s
    tr.SDE = ref_sde
    tr.N = TRAIN_N
    tr.timesteps = torch.linspace(1.0, SDE_CFG["sample_time_eps"], TRAIN_N)
    tr.time_eps = SDE_CFG["time_eps"]
    tr.sde_type = "vpsde"
    tr.itr = 10
    tr.cfg = dict2namespace(
        {"opt": {"loss_type": loss_type, "grad_norm_clip_value": 1.0,
                 "warmup_iters": 0, "lr": 0.0},
         "sde": dict(SDE_CFG, iw_sample_p_mode=iw_p_mode)})
    tr.optimizer = torch.optim.SGD(ref_s.parameters(), lr=0.0)
    return tr, mine_s, score_vars, mine_sde


def _pinned(monkeypatch, seed):
    rng = np.random.RandomState(seed)
    eps_np = rng.randn(B, SCORE_CFG["z_scale"],
                       SCORE_CFG["z_dim"]).astype(np.float32)
    eta_np = rng.randn(*eps_np.shape).astype(np.float32)
    monkeypatch.setattr(
        torch, "randn_like",
        lambda x, *a, **k: torch.from_numpy(eta_np.copy()).to(x))
    return eps_np, eta_np


@pytest.mark.parametrize("loss_type", ["l2", "l1"])
def test_update_score_discrete(monkeypatch, no_cuda, loss_type):
    tr, mine_s, score_vars, mine_sde = _build(loss_type, "ll_uniform")
    eps_np, eta_np = _pinned(monkeypatch, 21)

    seed = 77
    np.random.seed(seed)
    idx = np.random.choice(np.arange(TRAIN_N), B, replace=True)
    np.random.seed(seed)
    want = tr.update_score(torch.from_numpy(eps_np), discrete=True)

    t = jnp.linspace(1.0, SDE_CFG["sample_time_eps"], TRAIN_N)[idx]
    var = mine_sde.var(t)[:, None, None]
    e2int = mine_sde.e2int_f(t)[:, None, None]
    got = score_objective(mine_s, score_vars["params"],
                          jnp.asarray(eps_np), t, var, e2int,
                          jnp.ones((B, 1, 1)), jnp.asarray(eta_np),
                          None, None, True, jax.random.key(0), loss_type)
    np.testing.assert_allclose(float(got), want.item(), rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("iw_p_mode", ["ll_iw", "drop_sigma2t_iw",
                                       "drop_all_iw"])
def test_update_score_continuous(monkeypatch, no_cuda, iw_p_mode):
    """Continuous branch: weight_p from iw_quantities with the configured
    iw_sample_p_mode actually multiplies the objective.

    REFERENCE BUG (PARITY.md): `update_score`'s discrete=False branch is
    broken upstream — `iw_quantities` returns [B,1] columns and
    Latent_SDE_Trainer.py:129 multiplies them against [B,S,D] latents
    without the trailing axis the Hybrid trainer adds
    (Hybrid_Trainer.py:133-136), so it raises RuntimeError on any z_scale
    != batch. Dead in the reference (shipped stage-2 configs set
    opt.discrete: True); we implement the evidently-intended hybrid-style
    broadcast. The oracle below re-derives it in torch on the reference's
    own SDE quantities and model forward."""
    tr, mine_s, score_vars, mine_sde = _build("l2", iw_p_mode)
    eps_np, eta_np = _pinned(monkeypatch, 22)
    rho = np.array([0.11, 0.43, 0.68, 0.92], dtype=np.float32)
    monkeypatch.setattr(torch, "rand",
                        lambda *a, **k: torch.from_numpy(rho.copy()))

    with pytest.raises(RuntimeError, match="must match the size"):
        tr.update_score(torch.from_numpy(eps_np), discrete=False)

    # intended math, reference components, hybrid-convention broadcast
    t_r, var_r, e2int_r, weight_r, _, _ = tr.SDE.iw_quantities(
        B, SDE_CFG["time_eps"], iw_p_mode, False)
    with torch.no_grad():
        xt_r = (torch.from_numpy(eps_np) * e2int_r[:, :, None]
                + torch.sqrt(var_r)[:, :, None] * torch.from_numpy(eta_np))
        pred_r = tr.model(xt_r, t_r)
        want = (torch.square(torch.from_numpy(eta_np) - pred_r)
                * weight_r[:, :, None]).mean()

    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(jax.random, "uniform",
                   lambda rng_, shape, **k: jnp.asarray(rho).reshape(shape))
        t, var_c, e2int_c, weight_c, _, _ = mine_sde.iw_quantities(
            jax.random.key(0), B, SDE_CFG["time_eps"], iw_p_mode, False)
    got = score_objective(mine_s, score_vars["params"],
                          jnp.asarray(eps_np), t, var_c[..., None],
                          e2int_c[..., None], weight_c[..., None],
                          jnp.asarray(eta_np), None, None, True,
                          jax.random.key(0), "l2")
    assert float(jnp.abs(weight_c - 1.0).max()) > 1e-3, \
        "iw mode produced trivial weights; test would not catch a dropped " \
        "weight_p"
    np.testing.assert_allclose(float(got), want.item(), rtol=1e-4, atol=1e-6)
