"""Stage-2 entry: train the latent DiT on frozen-Compressor latents.

Parity target: reference `train_Latent_Diffusion.py` — builds Score +
Compressor (:17-18), `load_pretrain` when not resuming (:36), per-epoch CSV
log + periodic `valsample` full-metric eval (:52-70).
"""

from __future__ import annotations

from ldt_tpu.cli import get_config, get_parser, progress
from ldt_tpu.data import get_data_loaders
from ldt_tpu.models import Compressor, Score
from ldt_tpu.tools.utils import (
    AverageMeter,
    common_init,
    sync_epoch_values,
    train_dtype,
)
from ldt_tpu.training.latent_sde_trainer import Trainer


def main(args, cfg):
    rng = common_init(cfg.common.seed)
    dt = train_dtype(cfg)
    model = Score(cfg.score, dtype=dt)
    compressor = Compressor(cfg.compressor, dtype=dt)
    loaders = get_data_loaders(cfg.data, args)
    train_loader = loaders["train_loader"]
    test_loader = loaders["test_loader"]

    trainer = Trainer(cfg, model=model, compressor=compressor, rng=rng)
    trainer.info(vars(args))
    # multi-category eval target (reference train_Latent_Diffusion.py:60,85)
    val_cate = (args.val_cate if getattr(args, "val_cate", None) is not None
                else getattr(cfg.common, "val_cate", 0))

    trainer.maybe_init(next(iter(train_loader)))
    if args.resume:
        trainer.resume(epoch=args.resume_epoch, strict=args.strict,
                       load_optim=args.load_optimizer, finetune=args.finetune)
    else:
        trainer.load_pretrain()

    loss_meter = AverageMeter()
    if not args.evaluate:
        for epoch in range(trainer.epoch, cfg.common.epochs + 1):
            tbar = progress(train_loader, desc=f"Epoch {epoch}")
            # keep per-step losses as DEVICE arrays and sync once per epoch:
            # a float() per step blocks the async dispatch queue every step
            # (0.91 s/step -> 0.097 s/step measured on the tunnel transport —
            # the meter only feeds epoch-level CSV rows)
            epoch_losses = []
            for data in tbar:
                epoch_losses.append(trainer.update(data))
            for loss in sync_epoch_values(epoch_losses):
                loss_meter.update(loss)
            trainer.epoch_end()
            if (trainer.epoch - 1) % cfg.log.log_epoch_freq == 0:
                trainer.updata_time()
                trainer.write_log([epoch, trainer.itr, loss_meter.avg,
                                   trainer.time], mode="train")
                loss_meter.reset()
            if (trainer.epoch - 1) % cfg.log.eval_epoch_freq == 0:
                all_res = trainer.valsample(test_loader=test_loader,
                                            val_cate=val_cate)
                trainer.info(f"epoch{trainer.epoch - 1}:" + str(all_res))
                try:
                    trainer.write_eval(trainer.epoch - 1, all_res)
                except Exception:
                    print("write log failed")
                trainer.updata_time()
                trainer.write_log([trainer.epoch, trainer.itr,
                                   loss_meter.avg, trainer.time], mode="test")
                loss_meter.reset()
    else:
        all_res = trainer.valsample(test_loader=test_loader,
                                    val_cate=val_cate)
        trainer.write_eval(trainer.epoch - 1, all_res)


if __name__ == "__main__":
    args = get_parser("Latent_Diffusion_Trainer",
                      "LDT-TPU latent diffusion").parse_args()
    cfg = get_config(args)
    main(args, cfg)
