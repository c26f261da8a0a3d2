"""Config-schema-driven CSV + text logging (reference tools/log.py).

Writes three CSVs (`training.csv`, `test.csv`, `eval.csv`) whose columns and
printf formats come from the `log:` config section
(experiments/Compressor_Trainer/airplane/config.yaml:28-31), plus a
timestamped text log — same on-disk contract as the reference so resume-from-
CSV and downstream tooling keep working.
"""

from __future__ import annotations

import csv
import logging
import os
from datetime import datetime

from ldt_tpu.tools import io


def get_logger(logpath, displaying=True, saving=True, debug=False):
    """tools/log.py:9-25."""
    log = logging.getLogger("ldt_tpu")
    level = logging.DEBUG if debug else logging.INFO
    log.setLevel(level)
    log.handlers = []
    if saving:
        handler = logging.FileHandler(logpath, mode="a")
        handler.setLevel(level)
        log.addHandler(handler)
    if displaying:
        console = logging.StreamHandler()
        console.setLevel(level)
        log.addHandler(console)
    return log


class logger:
    """tools/log.py:27-86 contract: `info(msg)` + `write(row, mode)`."""

    def __init__(self, cfg):
        io.makedirs(cfg.log.save_path)
        stamp = datetime.now().strftime("%Y_%m_%d_%H_%M")
        self.log = get_logger(
            logpath=os.path.join(cfg.log.save_path, f"log_{stamp}.txt"))
        self.info(cfg)
        self.trainlogpath = os.path.join(cfg.log.save_path, "training.csv")
        self.testlogpath = os.path.join(cfg.log.save_path, "test.csv")
        self.evallogpath = os.path.join(cfg.log.save_path, "eval.csv")
        assert len(cfg.log.trainformat) == len(cfg.log.traincolumns)
        assert len(cfg.log.evalformat) == len(cfg.log.evalcolumns)
        self.traincolumns = cfg.log.traincolumns
        self.trainformat = cfg.log.trainformat
        self.evalcolumns = cfg.log.evalcolumns
        self.evalformat = cfg.log.evalformat
        for path, columns in ((self.trainlogpath, self.traincolumns),
                              (self.evallogpath, self.evalcolumns),
                              (self.testlogpath, self.traincolumns)):
            if not os.path.exists(path):
                with open(path, "w", newline="") as f:
                    csv.DictWriter(f, columns).writeheader()

    def info(self, message):
        self.log.info(message)

    def write(self, message, mode="train"):
        assert mode in ("train", "test", "eval")
        if mode == "eval":
            logpath, columns, form = (self.evallogpath, self.evalcolumns,
                                      self.evalformat)
        else:
            logpath = self.trainlogpath if mode == "train" else self.testlogpath
            columns, form = self.traincolumns, self.trainformat
        assert len(message) == len(columns)
        row = {
            columns[i]: (message[i] if form[i] is None
                         else form[i].format(float(message[i])))
            for i in range(len(message))
        }
        with open(logpath, "a", newline="") as f:
            csv.DictWriter(f, columns).writerow(row)
