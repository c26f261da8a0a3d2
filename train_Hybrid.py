"""Stage-3 entry: joint (Hybrid) finetune of Compressor + Score.

Parity target: reference `train_Hybrid.py` — per-step joint update
returning (loss_score, kl, rec), CSV log schema
["epoch","itr","loss_score","kl","rec","time"], periodic valsample.
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
from ldt_tpu.training.hybrid_trainer import Trainer


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
    val_cate = (args.val_cate if getattr(args, "val_cate", None) is not None
                else getattr(cfg.common, "val_cate", 0))

    trainer.maybe_init(next(iter(train_loader)))
    if args.resume:
        trainer.resume(epoch=args.resume_epoch, strict=args.strict,
                       load_optim=args.load_optimizer, finetune=args.finetune)
    elif getattr(cfg.opt, "pretrain_path", None):
        trainer.load_pretrain()

    meters = {k: AverageMeter() for k in ("loss_score", "kl", "rec")}
    if not args.evaluate:
        for epoch in range(trainer.epoch, cfg.common.epochs + 1):
            tbar = progress(train_loader, desc=f"Epoch {epoch}")
            # keep per-step meter values as DEVICE arrays and sync once per
            # epoch (see train_Latent_Diffusion.py — a float() per step
            # serializes the async dispatch queue on remote transports; the
            # meters only feed epoch-level CSV rows, no per-step watchdog)
            epoch_vals = []
            for data in tbar:
                epoch_vals.append(trainer.update(data))
            for loss_score, kl, rec in sync_epoch_values(epoch_vals):
                meters["loss_score"].update(loss_score)
                meters["kl"].update(kl)
                meters["rec"].update(rec)
            trainer.epoch_end()
            if (trainer.epoch - 1) % cfg.log.log_epoch_freq == 0:
                trainer.updata_time()
                trainer.write_log(
                    [epoch, trainer.itr, meters["loss_score"].avg,
                     meters["kl"].avg, meters["rec"].avg, trainer.time],
                    mode="train")
                for m in meters.values():
                    m.reset()
            if (trainer.epoch - 1) % cfg.log.eval_epoch_freq == 0:
                all_res = trainer.valsample(test_loader=test_loader,
                                            val_cate=val_cate)
                trainer.info(f"epoch{trainer.epoch - 1}:" + str(all_res))
                try:
                    trainer.write_eval(trainer.epoch - 1, all_res)
                except Exception:
                    print("write log failed")
    else:
        all_res = trainer.valsample(test_loader=test_loader,
                                    val_cate=val_cate)
        trainer.write_eval(trainer.epoch - 1, all_res)


if __name__ == "__main__":
    args = get_parser("Hybrid_Trainer", "LDT-TPU hybrid finetune").parse_args()
    cfg = get_config(args)
    main(args, cfg)
