"""ViPC completion stage-2 entry: condition-guided latent diffusion.

Parity target: reference `train_Completion_Latent_Diffusion.py` — per-batch
FPS of GT and partial clouds to 2048 (:51-54), condition = {'img','pts'}
(:55), CD x 1000 + F1 validation.
"""

from __future__ import annotations

import os

import numpy as np

from ldt_tpu.cli import get_parser, progress
from ldt_tpu.data.vipc import get_data_loaders
from ldt_tpu.models import Compressor, Score
from ldt_tpu.tools.utils import (
    AverageMeter,
    common_init,
    sync_epoch_values,
    train_dtype,
)
from ldt_tpu.training.completion_latent_sde_trainer import Trainer
from ldt_tpu.training.completion_compressor_trainer import fps_to


def get_completion_config(args):
    import yaml

    from ldt_tpu.tools.io import dict2namespace

    path = os.path.join(args.save, args.trainer_type, "completion",
                        args.dataset, "config.yaml")
    with open(path, "r") as f:
        return dict2namespace(yaml.safe_load(f))


def main(args, cfg):
    rng = common_init(cfg.common.seed)
    dt = train_dtype(cfg)
    model = Score(cfg.score, dtype=dt)
    compressor = Compressor(cfg.compressor, dtype=dt)
    loaders = get_data_loaders(cfg.data)
    train_loader = loaders["train_loader"]
    test_loader = loaders["test_loader"]

    trainer = Trainer(cfg, model=model, compressor=compressor, rng=rng)
    trainer.info(vars(args))

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
            # device-array losses, one sync per epoch (see
            # train_Latent_Diffusion.py — a float() per step serializes the
            # async dispatch queue on remote transports)
            epoch_losses = []
            for data in tbar:
                # fps_to outputs stay ON DEVICE end-to-end — an np.asarray
                # here is a blocking device->host->device bounce per step
                pc = fps_to(data["pc"], cfg.common.num_points)
                pc_part = fps_to(data["pc_part"], cfg.common.num_points)
                condition = {"img": np.asarray(data["views"]),
                             "pts": pc_part}
                epoch_losses.append(trainer.update(pc, condition))
            for loss in sync_epoch_values(epoch_losses):
                loss_meter.update(loss)
            trainer.epoch_end()
            if (trainer.epoch - 1) % cfg.log.log_epoch_freq == 0:
                trainer.updata_time()
                trainer.write_log([epoch, trainer.itr, loss_meter.avg,
                                   trainer.time], mode="train")
                loss_meter.reset()
            if (trainer.epoch - 1) % cfg.log.eval_epoch_freq == 0:
                all_res = trainer.valsample(test_loader=test_loader)
                trainer.info(f"epoch{trainer.epoch - 1}:" + str(all_res))
                try:  # reference train_Completion_Latent_Diffusion.py:71-76
                    trainer.write_eval(trainer.epoch - 1, all_res)
                except Exception:
                    print("write log failed")
    else:
        all_res = trainer.valsample(test_loader=test_loader, full=True)
        trainer.info(str(all_res))
        trainer.write_eval(trainer.epoch - 1, all_res)


if __name__ == "__main__":
    args = get_parser("Latent_Diffusion_Trainer",
                      "LDT-TPU completion diffusion").parse_args()
    cfg = get_completion_config(args)
    main(args, cfg)
