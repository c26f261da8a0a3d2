"""Stage-1 entry: train the set-VAE Compressor on ShapeNet-55.

Parity target: reference `train_Compressor.py` — epoch loop with running
meters, CSV logging every `log_epoch_freq`, reconstruction eval every
`eval_epoch_freq`, and the NaN/max-activation watchdog that rolls back to an
earlier checkpoint and halves the LR (:63-64, :83-91).
"""

from __future__ import annotations

import numpy as np

from ldt_tpu.cli import get_config, get_parser, progress
from ldt_tpu.data import get_data_loaders
from ldt_tpu.models import Compressor
from ldt_tpu.tools.utils import AverageMeter, common_init, train_dtype
from ldt_tpu.training.compressor_trainer import Trainer


def main(args, cfg):
    rng = common_init(cfg.common.seed)
    loaders = get_data_loaders(cfg.data, args)
    train_loader = loaders["train_loader"]
    test_loader = loaders["test_loader"]

    model = Compressor(cfg.model, dtype=train_dtype(cfg))
    trainer = Trainer(cfg, model, rng=rng)
    trainer.info(vars(args))

    if args.resume:
        trainer.maybe_init(next(iter(train_loader)))
        trainer.resume(epoch=args.resume_epoch, finetune=args.finetune,
                       strict=args.strict, load_optim=args.load_optimizer)

    meters = {k: AverageMeter() for k in ("loss", "kl", "rec", "max")}

    def reset_meters():
        for m in meters.values():
            m.reset()

    def diverged():
        return (not np.isfinite(meters["loss"].avg)
                or meters["max"].avg > 10000)

    if not args.evaluate:
        while trainer.epoch < cfg.common.epochs:
            for epoch in range(trainer.epoch, cfg.common.epochs + 1):
                tbar = progress(train_loader, desc=f"Epoch {epoch}")
                for data in tbar:
                    loss, kl_loss, rec_loss, max_feature = trainer.update(data)
                    meters["loss"].update(loss)
                    meters["kl"].update(kl_loss)
                    meters["rec"].update(rec_loss)
                    meters["max"].update(max_feature)
                    if diverged():
                        break
                if trainer.epoch % cfg.log.log_epoch_freq == 0:
                    trainer.updata_time()
                    trainer.write_log(
                        [epoch, trainer.itr, meters["loss"].avg,
                         meters["kl"].avg, meters["rec"].avg,
                         meters["max"].avg, trainer.time], mode="train")
                trainer.epoch_end()

                if (trainer.epoch - 1) % cfg.log.eval_epoch_freq == 0:
                    all_res = trainer.reconstruction(test_loader=test_loader)
                    trainer.info(f"epoch{trainer.epoch - 1}:" + str(all_res))
                    try:
                        trainer.write_eval(trainer.epoch - 1, all_res)
                    except Exception:
                        print("write log failed")
                if diverged():
                    # divergence watchdog: roll back ~10 epochs, halve LR
                    # (reference train_Compressor.py:83-91)
                    rollback = max((trainer.epoch - 10) // 10 * 10,
                                   cfg.log.save_epoch_freq)
                    import os as _os

                    from ldt_tpu.training.checkpoint import checkpoint_path
                    if not _os.path.exists(
                            checkpoint_path(cfg.log.save_path, rollback)):
                        raise RuntimeError(
                            f"training diverged at epoch {trainer.epoch - 1} "
                            f"(loss={meters['loss'].avg:.4g}, "
                            f"max={meters['max'].avg:.4g}) before the first "
                            f"checkpoint at epoch {rollback} — nothing to "
                            "roll back to; this early a divergence is a bug "
                            "or a bad config, not training noise")
                    trainer.resume(epoch=rollback, finetune=False,
                                   strict=True, load_optim=True)
                    trainer.base_lr = trainer.base_lr / 2
                    reset_meters()
                    break
                reset_meters()
    else:
        all_res = trainer.reconstruction(test_loader=test_loader)
        trainer.write_eval(trainer.epoch - 1, all_res)


if __name__ == "__main__":
    args = get_parser("Compressor_Trainer", "LDT-TPU point cloud VAE").parse_args()
    cfg = get_config(args)
    main(args, cfg)
