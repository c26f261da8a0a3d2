"""ViPC completion stage-1 entry: VAE on FPS-downsampled GT clouds.

Parity target: reference `train_Completion_Compressor.py` — per-batch FPS of
the GT cloud to 2048 points (:55-57), NaN/max-activation watchdog rollback
(:72, :92-100). NOTE: the reference gathers partial centers from the FULL
cloud (`index_points(pc, pc_part_center)`, :57) — an evident slip; we
subsample the partial cloud from itself.
"""

from __future__ import annotations

import os

import numpy as np

from ldt_tpu.cli import get_config, get_parser, progress
from ldt_tpu.data.vipc import get_data_loaders
from ldt_tpu.models import Compressor
from ldt_tpu.tools.utils import AverageMeter, common_init, train_dtype
from ldt_tpu.training.completion_compressor_trainer import Trainer, fps_to


def get_completion_config(args):
    import yaml

    from ldt_tpu.tools.io import dict2namespace

    path = os.path.join(args.save, args.trainer_type, "completion",
                        args.dataset, "config.yaml")
    with open(path, "r") as f:
        return dict2namespace(yaml.safe_load(f))


def main(args, cfg):
    rng = common_init(cfg.common.seed)
    loaders = get_data_loaders(cfg.data)
    train_loader = loaders["train_loader"]
    test_loader = loaders["test_loader"]

    model = Compressor(cfg.model, dtype=train_dtype(cfg))
    trainer = Trainer(cfg, model, rng=rng)
    trainer.info(vars(args))
    first = next(iter(train_loader))
    trainer.maybe_init({"tr_points": np.asarray(
        fps_to(first["pc"], cfg.common.num_points)),
        "cate_idx": np.zeros((first["pc"].shape[0],), np.int32)})
    if args.resume:
        trainer.resume(epoch=args.resume_epoch, finetune=args.finetune,
                       strict=args.strict, load_optim=args.load_optimizer)
    else:
        # bootstrap the finetune from the stage-1 compressor checkpoint
        # (reference train_Completion_Compressor.py:32-38)
        trainer.load_pretrain()

    meters = {k: AverageMeter() for k in ("loss", "kl", "rec", "max")}

    def diverged():
        return (not np.isfinite(meters["loss"].avg)
                or meters["max"].avg > 10000)

    if not args.evaluate:
        while trainer.epoch < cfg.common.epochs:
            for epoch in range(trainer.epoch, cfg.common.epochs + 1):
                tbar = progress(train_loader, desc=f"Epoch {epoch}")
                for data in tbar:
                    # device array straight into the jitted step (the meter
                    # pull below syncs anyway — the watchdog reads per step —
                    # but the extra FPS device->host->device bounce is gone)
                    pc = fps_to(data["pc"], cfg.common.num_points)
                    loss, kl_loss, rec_loss, max_feature = trainer.update(pc)
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
                    try:  # reference train_Completion_Compressor.py:84-87
                        trainer.write_eval(trainer.epoch - 1, all_res)
                    except Exception:
                        print("write log failed")
                if diverged():
                    rollback = max((trainer.epoch - 10) // 10 * 10,
                                   cfg.log.save_epoch_freq)
                    trainer.resume(epoch=rollback, finetune=False,
                                   strict=True, load_optim=True)
                    trainer.base_lr = trainer.base_lr / 2
                for m in meters.values():
                    m.reset()
    else:
        all_res = trainer.reconstruction(test_loader=test_loader)
        trainer.info(str(all_res))


if __name__ == "__main__":
    args = get_parser("Compressor_Trainer",
                      "LDT-TPU completion VAE").parse_args()
    cfg = get_completion_config(args)
    main(args, cfg)
