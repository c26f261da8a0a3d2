"""Trainers: jitted train steps, EMA, schedules, checkpointing, logging."""

from ldt_tpu.training.state import TrainState, make_lr_fn, make_optimizer
from ldt_tpu.training.checkpoint import load_checkpoint, save_checkpoint

__all__ = [
    "TrainState",
    "load_checkpoint",
    "make_lr_fn",
    "make_optimizer",
    "save_checkpoint",
]
