"""Hybrid joint-loss parity against the ACTUAL reference `clc_compressor`.

The stage-3 diffusion-prior KL (reference trainer/Hybrid_Trainer.py:116-153)
composes the compressor posterior (logqz), the score forward on the diffused
latent, the SDE weight `weight_q = g2/(2 var)` and the cross-entropy
constant — all individually parity-tested elsewhere, but never as the one
expression the compressor gradient actually descends. This file runs the
reference's `clc_compressor` itself (CUDA/pointnet2/torchvision shimmed out,
weights ported with tools/port.py) head-to-head with our production
`hybrid_comp_loss` on pinned draws:

  * reparameterization noise zeroed on BOTH sides (eps = posterior mean),
  * diffusion eta pinned to one shared numpy draw,
  * discrete-t indices pinned via a seeded np.random (the reference draws
    with np.random.choice),
  * continuous-t rho pinned by patching torch.rand / jax.random.uniform
    (the test_sde_ref_parity discipline),
  * CD/EMD stubbed to a shared deterministic fn on both sides (the real
    kernels have their own parity suites; clc_compressor only sums them).
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

# installs the pointnet2/torchvision/.to("cuda") shims at import
from test_port import COMP_CFG, N_PTS, SCORE_CFG, _pts  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import ldt_tpu.models.compressor as comp_mod  # noqa: E402
from ldt_tpu.diffusion import make_diffusion  # noqa: E402
from ldt_tpu.models import Compressor, Score  # noqa: E402
from ldt_tpu.tools.io import dict2namespace  # noqa: E402
from ldt_tpu.tools.port import port_compressor, port_score  # noqa: E402
from ldt_tpu.training.hybrid_trainer import hybrid_comp_loss  # noqa: E402

B = 2
TRAIN_N = 32
SDE_CFG = dict(sde_type="vpsde", sigma2_0=0.0, time_eps=0.01,
               sample_time_eps=1e-6, beta_start=0.1, beta_end=20.0,
               sigma2_min=0.01, sigma2_max=50.0, train_N=TRAIN_N,
               sample_mode="discrete", sample_N=10)
ALPHA = 0.7


@pytest.fixture()
def no_cuda(monkeypatch):
    """Route the reference's device='cuda' tensor factories to CPU."""
    for name in ("tensor", "rand", "ones", "zeros", "randn", "linspace",
                 "full", "ones_like", "zeros_like"):
        orig = getattr(torch, name)

        def wrap(*a, _orig=orig, **k):
            k.pop("device", None)
            return _orig(*a, **k)

        monkeypatch.setattr(torch, name, wrap)
    yield monkeypatch


def _rec_stub_torch(a, b):
    return ((a - b) ** 2).mean(dim=(1, 2))


def _rec_stub_jax(recon, pts):
    # reference: rec = (cd(recon,pts) + emd(recon,pts)).mean() with both
    # stubbed to the same per-cloud mean-square -> 2x the global mean
    return 2.0 * jnp.mean((recon - pts) ** 2)


def _build_pair(monkeypatch, iw_mode="ll_uniform"):
    """(ref trainer with ported-twin nets, our nets+variables, both SDEs)."""
    from model.Compressor.Network import Compressor as RefCompressor
    from model.scorenet.score import Score as RefScore
    import model.Compressor.Network as ref_net_mod
    import trainer.Hybrid_Trainer as ref_hybrid_mod
    from diffusion.diffusion_continuous import make_diffusion as ref_make

    torch.manual_seed(0)
    ref_c = RefCompressor(dict2namespace(dict(COMP_CFG)))
    ref_s = RefScore(dict2namespace(dict(SCORE_CFG)))

    pts_np = _pts(b=B)
    # one train-mode forward so ActNorm data-inits BEFORE porting (our
    # ActNorm subsumes the init protocol by replacing params wholesale)
    ref_c.train()
    with torch.no_grad():
        ref_c(torch.from_numpy(pts_np))

    comp_vars = jax.tree_util.tree_map(
        jnp.asarray, port_compressor(ref_c.state_dict()))
    score_vars = jax.tree_util.tree_map(
        jnp.asarray, port_score(ref_s.state_dict()))
    mine_c = Compressor(dict2namespace(dict(COMP_CFG)), ref_merge=True)
    mine_s = Score(dict2namespace(dict(SCORE_CFG)), ref_merge=True)

    sde_cfg = dict2namespace(dict(SDE_CFG, iw_sample_q_mode=iw_mode))
    ref_sde = ref_make(sde_cfg)
    mine_sde = make_diffusion(sde_cfg)

    RefTrainer = ref_hybrid_mod.Trainer
    tr = RefTrainer.__new__(RefTrainer)
    tr.compressor = ref_c
    tr.model = ref_s
    tr.SDE = ref_sde
    tr.N = TRAIN_N
    tr.timesteps = torch.linspace(1.0, SDE_CFG["sample_time_eps"], TRAIN_N)
    tr.time_eps = SDE_CFG["time_eps"]
    tr.sde_type = "vpsde"
    tr.alpha = ALPHA
    tr.epoch = 5
    tr.cfg = dict2namespace(
        {"opt": {"compressor_warmup": 2, "alpha": ALPHA},
         "sde": dict(SDE_CFG, iw_sample_q_mode=iw_mode)})
    # lr=0 SGD: clc_compressor steps it, weights must not move
    tr.compressor_optimizer = torch.optim.SGD(ref_c.parameters(), lr=0.0)

    # eps = posterior mean on both sides
    monkeypatch.setattr(ref_net_mod, "sample", lambda mu, logvar: mu)
    monkeypatch.setattr(comp_mod, "reparameterize",
                        lambda rng, mu, logvar: mu)
    # CD/EMD are try/except-absent on CPU; inject the shared stub
    monkeypatch.setattr(ref_hybrid_mod, "CD_loss", _rec_stub_torch,
                        raising=False)
    monkeypatch.setattr(ref_hybrid_mod, "EMD_loss", _rec_stub_torch,
                        raising=False)

    return tr, (mine_c, mine_s, comp_vars, score_vars), mine_sde, pts_np


def _run_ours(nets, pts_np, t, var, e2int, weight_q, ce_const, eta):
    mine_c, mine_s, comp_vars, score_vars = nets
    comp_loss, (kl, rec, eps, _) = hybrid_comp_loss(
        mine_c, mine_s, comp_vars["params"], comp_vars.get("batch_stats"),
        score_vars["params"], jnp.asarray(pts_np), None,
        jax.random.key(0), t, var, e2int, weight_q, ce_const,
        jnp.asarray(eta), ALPHA, rec_fn=_rec_stub_jax)
    return comp_loss, kl, rec, eps


def test_clc_compressor_discrete(monkeypatch, no_cuda):
    tr, nets, mine_sde, pts_np = _build_pair(monkeypatch)

    rng = np.random.RandomState(7)
    eta_np = rng.randn(B, SCORE_CFG["z_scale"],
                       SCORE_CFG["z_dim"]).astype(np.float32)
    monkeypatch.setattr(
        torch, "randn_like",
        lambda x, *a, **k: torch.from_numpy(eta_np.copy()).to(x))

    seed = 1234
    np.random.seed(seed)
    idx = np.random.choice(np.arange(TRAIN_N), B, replace=True)
    np.random.seed(seed)  # the reference re-draws the same idx
    eps_r, recon_r, kl_r, rec_r = tr.clc_compressor(
        torch.from_numpy(pts_np), cates=None, condition=None,
        discrete=True, train_score=False)

    t = jnp.linspace(1.0, SDE_CFG["sample_time_eps"], TRAIN_N)[idx]
    var = mine_sde.var(t)[:, None, None]
    e2int = mine_sde.e2int_f(t)[:, None, None]
    weight_q = mine_sde.g2(t)[:, None, None] / (2.0 * var)
    ce_const = 0.5 * (1.0 + jnp.log(
        2.0 * jnp.pi * mine_sde.var(jnp.asarray(SDE_CFG["time_eps"]))))
    comp_loss, kl, rec, eps = _run_ours(nets, pts_np, t, var, e2int,
                                        weight_q, ce_const, eta_np)

    np.testing.assert_allclose(np.asarray(eps),
                               eps_r.detach().numpy(),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(rec),
                               2.0 * ((recon_r - torch.from_numpy(pts_np))
                                      ** 2).mean().item(),
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(float(kl), kl_r.item(), rtol=1e-3, atol=1e-4)
    # the composed objective the compressor grad descends
    np.testing.assert_allclose(float(comp_loss),
                               rec_r.item() + ALPHA * kl_r.item(),
                               rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("iw_mode", ["ll_uniform", "drop_all_iw"])
def test_clc_compressor_continuous(monkeypatch, no_cuda, iw_mode):
    """discrete=False branch: t/var/weight_q from iw_quantities with the
    configured iw_sample_q_mode (Hybrid_Trainer.py:130-136), rho pinned."""
    tr, nets, mine_sde, pts_np = _build_pair(monkeypatch, iw_mode=iw_mode)

    rng = np.random.RandomState(8)
    eta_np = rng.randn(B, SCORE_CFG["z_scale"],
                       SCORE_CFG["z_dim"]).astype(np.float32)
    monkeypatch.setattr(
        torch, "randn_like",
        lambda x, *a, **k: torch.from_numpy(eta_np.copy()).to(x))
    rho = np.array([0.31, 0.77], dtype=np.float32)
    monkeypatch.setattr(torch, "rand",
                        lambda *a, **k: torch.from_numpy(rho.copy()))

    eps_r, recon_r, kl_r, rec_r = tr.clc_compressor(
        torch.from_numpy(pts_np), cates=None, condition=None,
        discrete=False, train_score=False)

    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(jax.random, "uniform",
                   lambda rng_, shape, **k: jnp.asarray(rho).reshape(shape))
        t, var_c, e2int_c, weight_c, _, _ = mine_sde.iw_quantities(
            jax.random.key(0), B, SDE_CFG["time_eps"], iw_mode, False)
    var, e2int, weight_q = (var_c[..., None], e2int_c[..., None],
                            weight_c[..., None])
    ce_const = 0.5 * (1.0 + jnp.log(
        2.0 * jnp.pi * mine_sde.var(jnp.asarray(SDE_CFG["time_eps"]))))
    comp_loss, kl, rec, eps = _run_ours(nets, pts_np, t, var, e2int,
                                        weight_q, ce_const, eta_np)

    np.testing.assert_allclose(float(kl), kl_r.item(), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(rec), rec_r.item(),
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(float(comp_loss),
                               rec_r.item() + ALPHA * kl_r.item(),
                               rtol=1e-3, atol=1e-4)


def test_lr0_step_left_weights_unchanged(monkeypatch, no_cuda):
    """Guard the harness itself: the reference clc_compressor DOES step its
    compressor optimizer; the lr=0 SGD must have kept weights identical, or
    the parity numbers above compared different nets."""
    tr, nets, mine_sde, pts_np = _build_pair(monkeypatch)
    # parameters only: train-mode BN buffers legitimately update
    before = {k: v.detach().clone()
              for k, v in tr.compressor.named_parameters()}
    rng = np.random.RandomState(9)
    eta_np = rng.randn(B, SCORE_CFG["z_scale"],
                       SCORE_CFG["z_dim"]).astype(np.float32)
    monkeypatch.setattr(
        torch, "randn_like",
        lambda x, *a, **k: torch.from_numpy(eta_np.copy()).to(x))
    np.random.seed(0)
    tr.clc_compressor(torch.from_numpy(pts_np), cates=None, condition=None,
                      discrete=True, train_score=False)
    after = dict(tr.compressor.named_parameters())
    for k, v in before.items():
        np.testing.assert_array_equal(v.numpy(), after[k].detach().numpy(),
                                      err_msg=k)
