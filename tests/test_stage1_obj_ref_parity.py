"""Stage-1 VAE-objective parity against the ACTUAL reference
`Compressor_Trainer.compute_loss` (reference trainer/Compressor_Trainer.py:
43-52): loss = kl_weight * mean(cat(kls)) + (CD + EMD).

Reference trainer run on CPU (CUDA emd/pointnet2/mitsuba shimmed, rec
kernels stubbed to a shared deterministic fn — they have their own parity
suites), weights ported with tools/port.py, reparameterization noise zeroed
on both sides so the per-layer kls (logqz - logpz at eps = posterior mean)
and their concatenation/mean are compared exactly.
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

for name in ("mitsuba", "emd"):  # vis_utils / evaluation.emd hard imports
    if name not in sys.modules:
        sys.modules[name] = types.ModuleType(name)
if "torchdiffeq" not in sys.modules:
    _td = types.ModuleType("torchdiffeq")
    _td.odeint = None
    sys.modules["torchdiffeq"] = _td

# installs the pointnet2/torchvision/.to("cuda") shims at import
from test_port import COMP_CFG, _pts  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import ldt_tpu.models.compressor as comp_mod  # noqa: E402
from ldt_tpu.models import Compressor  # noqa: E402
from ldt_tpu.tools.io import dict2namespace  # noqa: E402
from ldt_tpu.tools.port import port_compressor  # noqa: E402
from ldt_tpu.training.compressor_trainer import (  # noqa: E402
    compressor_objective,
)

B = 2
KL_WEIGHT = 1e-3


def test_compute_loss_matches_reference(monkeypatch):
    from model.Compressor.Network import Compressor as RefCompressor
    import model.Compressor.Network as ref_net_mod
    import trainer.Compressor_Trainer as ref_tr_mod

    torch.manual_seed(4)
    ref_c = RefCompressor(dict2namespace(dict(COMP_CFG)))
    pts_np = _pts(b=B, seed=5)
    # train-mode forward so ActNorm data-inits BEFORE porting
    ref_c.train()
    with torch.no_grad():
        ref_c(torch.from_numpy(pts_np))
    comp_vars = jax.tree_util.tree_map(
        jnp.asarray, port_compressor(ref_c.state_dict()))
    mine_c = Compressor(dict2namespace(dict(COMP_CFG)), ref_merge=True)

    # eps = posterior mean on both sides
    monkeypatch.setattr(ref_net_mod, "sample", lambda mu, logvar: mu)
    monkeypatch.setattr(comp_mod, "reparameterize",
                        lambda rng, mu, logvar: mu)
    monkeypatch.setattr(ref_tr_mod, "CD_loss",
                        lambda a, b: ((a - b) ** 2).mean())
    monkeypatch.setattr(ref_tr_mod, "EMD_loss",
                        lambda a, b: ((a - b) ** 2).mean())

    RefTrainer = ref_tr_mod.Trainer
    tr = RefTrainer.__new__(RefTrainer)
    tr.model = ref_c
    tr.kl_weight = KL_WEIGHT
    want_loss, want_kl, want_rec = tr.compute_loss(
        torch.from_numpy(pts_np), None)

    loss, (kl, rec, max_f, _) = compressor_objective(
        mine_c, comp_vars["params"], comp_vars.get("batch_stats"),
        jnp.asarray(pts_np), None, jax.random.key(0), KL_WEIGHT,
        rec_fn=lambda r, p: 2.0 * jnp.mean((r - p) ** 2))

    np.testing.assert_allclose(float(kl), want_kl.item(),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(float(rec), want_rec.item(),
                               rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(float(loss), want_loss.item(),
                               rtol=1e-3, atol=1e-5)
    # the watchdog feature: max of the encoder activations (Network.py:206)
    assert np.isfinite(float(max_f))
