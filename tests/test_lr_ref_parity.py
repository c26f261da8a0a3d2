"""LR schedule parity against the reference's imperative optimizer dance.

The reference mutates optimizer LR from two places: `warm_up` per update
(trainer/base.py:32-37) and `CosineAnnealingLR.step(epoch)` at the START of
each epoch, gated on itr > warmup_iters (train_Compressor.py:46-47,
Compressor_Trainer.py:27: T_max=common.epochs, eta_min=0). Our
`make_lr_fn(itr, epoch)` folds that into one pure function — this test
replays the reference loop with a real torch Adam + scheduler and checks
the LR used at every single update matches.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from ldt_tpu.training.base import make_lr_fn  # noqa: E402


@pytest.mark.parametrize("warmup,epochs,ipe", [(20, 10, 7),  # warm-up spans epochs
                                               (3, 6, 10),   # short warm-up
                                               (0, 4, 5)])   # no warm-up
def test_lr_every_update(warmup, epochs, ipe):
    base_lr = 1e-3
    p = torch.nn.Parameter(torch.zeros(3))
    opt = torch.optim.Adam([p], lr=base_lr)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, epochs, 0)

    def warm_up(optimizer, itr):  # trainer/base.py:32-37, verbatim semantics
        if itr < warmup:
            frac = min(float(itr + 1) / max(warmup, 1), 1.0)
            for g in optimizer.param_groups:
                g["lr"] = base_lr * frac

    lr_fn = make_lr_fn(base_lr, warmup, epochs)

    itr = 0
    for epoch in range(1, epochs + 1):
        itr_epoch_start = itr
        if itr > warmup:
            sched.step(epoch)  # train_Compressor.py:46-47
        for _ in range(ipe):
            warm_up(opt, itr)  # called inside trainer.update before step
            want = opt.param_groups[0]["lr"]
            got = lr_fn(itr, epoch, itr_epoch_start)
            np.testing.assert_allclose(
                got, want, rtol=1e-10,
                err_msg=f"itr={itr} epoch={epoch} "
                        f"(warmup={warmup}, epochs={epochs})")
            itr += 1


@pytest.mark.parametrize("resume_epoch", [2, 5])
def test_lr_after_resume(resume_epoch):
    """Resume mid-warm-up (epoch 2: itr 5 < warmup 12) and post-warm-up
    (epoch 5): the reference re-creates Adam+scheduler, unconditionally
    steps the scheduler to the resumed epoch (Compressor_Trainer.py:181-182),
    and continues the loop; warm_up still overwrites lr per-iter while
    itr < warmup, so mid-warm-up resumes stay at base lr until the next
    epoch boundary after warm-up ends."""
    base_lr, warmup, epochs, ipe = 1e-3, 12, 8, 5
    p = torch.nn.Parameter(torch.zeros(3))
    opt = torch.optim.Adam([p], lr=base_lr)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, epochs, 0)
    sched.base_lrs = [base_lr]
    sched.step(resume_epoch)  # the reference's resume step

    def warm_up(optimizer, itr):
        if itr < warmup:
            frac = min(float(itr + 1) / max(warmup, 1), 1.0)
            for g in optimizer.param_groups:
                g["lr"] = base_lr * frac

    lr_fn = make_lr_fn(base_lr, warmup, epochs)
    itr = (resume_epoch - 1) * ipe  # checkpoints land on epoch boundaries
    itr_epoch_start = itr  # what trainer.resume() records
    for epoch in range(resume_epoch, epochs + 1):
        if epoch != resume_epoch:
            itr_epoch_start = itr
            if itr > warmup:
                sched.step(epoch)
        for _ in range(ipe):
            warm_up(opt, itr)
            want = opt.param_groups[0]["lr"]
            got = lr_fn(itr, epoch, itr_epoch_start)
            np.testing.assert_allclose(
                got, want, rtol=1e-10,
                err_msg=f"resume={resume_epoch} itr={itr} epoch={epoch}")
            itr += 1
