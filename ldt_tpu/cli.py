"""Shared CLI plumbing for the train_* / val_sample entry points.

Preserves the reference's public contract (train_Compressor.py:105-133):
`python train_X.py --dataset airplane` reads
`experiments/<trainer_type>/<dataset>/config.yaml` into nested namespaces.
"""

from __future__ import annotations

import argparse
import os

import yaml

from ldt_tpu.tools.io import dict2namespace


def get_parser(trainer_type: str, description: str = "LDT-TPU"):
    parser = argparse.ArgumentParser(description)
    parser.add_argument("--dataset", default="airplane", type=str)
    parser.add_argument("--trainer_type", type=str, default=trainer_type)
    parser.add_argument("--save", type=str, default="experiments")
    parser.add_argument("--resume", type=eval, default=False,
                        choices=[True, False])
    parser.add_argument("--resume_epoch", type=int, default=None)
    parser.add_argument("--load_optimizer", type=eval, default=True,
                        choices=[True, False])
    parser.add_argument("--evaluate", type=eval, default=False,
                        choices=[True, False])
    parser.add_argument("--strict", type=eval, default=True,
                        choices=[True, False])
    parser.add_argument("--finetune", type=eval, default=False,
                        choices=[True, False])
    # which category a multi-category ('all') run evaluates in valsample.
    # The reference hard-codes 14 (train-time eval) / 13 (--evaluate) in
    # train_Latent_Diffusion.py:60,85 ("# 0 airplane 13 car 14 chair");
    # here it is a knob: CLI > cfg.common.val_cate > 0.
    parser.add_argument("--val_cate", type=int, default=None)
    return parser


def get_config(args):
    path = os.path.join(args.save, args.trainer_type, args.dataset,
                        "config.yaml")
    with open(path, "r") as f:
        config = yaml.safe_load(f)
    return dict2namespace(config)


def progress(iterable, desc: str = ""):
    """tqdm when available, plain passthrough otherwise."""
    try:
        from tqdm import tqdm
        return tqdm(iterable, desc=desc, ncols=120)
    except ImportError:
        return iterable
