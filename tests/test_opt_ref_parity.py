"""Optimizer-chain parity against the reference's clip + Adam + EMA stack.

Feeds IDENTICAL pinned gradient sequences to the reference's
`clip_grad_norm_` + `torch.optim.Adam` + `tools/utils.py::EMA` wrapper and
to our `make_optimizer` + `apply_update` + TrainState EMA, with a varying
per-step LR. Pure arithmetic on the same inputs — params, Adam moments and
EMA shadows must agree to float tolerance after every step. Covers: clip
BEFORE the moment estimates (Compressor_Trainer.py:37-38), torch's L2-style
weight decay folded into grads, Adam bias correction/eps, and the
reference's first-step EMA seeding (shadow == post-step params,
tools/utils.py:48-50).
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
if not os.path.isdir(REF):
    pytest.skip("reference tree unavailable", allow_module_level=True)
if REF not in sys.path:
    sys.path.append(REF)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ldt_tpu.training.state import (  # noqa: E402
    TrainState,
    apply_update,
    make_optimizer,
)

from tools.utils import EMA  # noqa: E402  (reference wrapper)

SHAPES = [(4, 8), (8,), (3, 5, 2)]
STEPS = 6
EMA_DECAY = 0.9


def _pinned(seed, scale=1.0):
    rng = np.random.RandomState(seed)
    return [scale * rng.randn(*s).astype(np.float32) for s in SHAPES]


@pytest.mark.parametrize("wd,clip,gscale", [
    (0.0, 1.0, 3.0),    # clipping active (global norm >> 1)
    (0.0, 1.0, 0.01),   # clipping inactive
    (0.01, 1.0, 3.0),   # torch L2 weight decay
    (0.0, None, 3.0),   # no clip
])
def test_step_for_step(wd, clip, gscale):
    b1, b2 = 0.9, 0.999
    init = _pinned(0)
    lrs = [1e-3 * (0.5 + 0.1 * k) for k in range(STEPS)]
    grad_seqs = [_pinned(100 + k, gscale) for k in range(STEPS)]

    # --- reference side ---
    tparams = [torch.nn.Parameter(torch.from_numpy(v.copy())) for v in init]
    adam = torch.optim.Adam(tparams, lr=lrs[0], betas=(b1, b2),
                            weight_decay=wd)
    opt = EMA(adam, ema_decay=EMA_DECAY)
    t_hist, t_ema_hist = [], []
    for k in range(STEPS):
        for g in adam.param_groups:
            g["lr"] = lrs[k]
        adam.zero_grad()
        for p, g in zip(tparams, grad_seqs[k]):
            p.grad = torch.from_numpy(g.copy())
        if clip is not None:
            torch.nn.utils.clip_grad_norm_(tparams, clip)
        opt.step()
        t_hist.append([p.detach().numpy().copy() for p in tparams])
        t_ema_hist.append([adam.state[p]["ema"].numpy().copy()
                           for p in tparams])

    # --- our side ---
    tx = make_optimizer(b1, b2, wd, clip)
    params = {f"p{i}": jnp.asarray(v) for i, v in enumerate(init)}
    state = TrainState.create(params, tx)
    for k in range(STEPS):
        grads = {f"p{i}": jnp.asarray(g)
                 for i, g in enumerate(grad_seqs[k])}
        state = apply_update(state, grads, tx, lrs[k], ema_decay=EMA_DECAY)
        for i in range(len(SHAPES)):
            np.testing.assert_allclose(
                np.asarray(state.params[f"p{i}"]), t_hist[k][i],
                rtol=2e-5, atol=1e-7,
                err_msg=f"params step {k} tensor {i} "
                        f"(wd={wd}, clip={clip}, gscale={gscale})")
            np.testing.assert_allclose(
                np.asarray(state.ema_params[f"p{i}"]), t_ema_hist[k][i],
                rtol=2e-5, atol=1e-7,
                err_msg=f"ema step {k} tensor {i}")
