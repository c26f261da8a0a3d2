"""ViPC completion stage-1 trainer: VAE on FPS-downsampled GT clouds.

Parity target: reference `completion_trainer/Compressor_Trainer.py` — same
CD+EMD+KL loss as stage-1 (:36-57) but batches come from the ViPC loader as
raw arrays (FPS to 2048 happens in the entry), and `reconstrustion` scores
CD x 1000 + F1 (:66-95).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ldt_tpu.eval.loss import F1Score, L2_ChamferEval_1000
from ldt_tpu.parallel.mesh import device_put_host
from ldt_tpu.ops.geometry import furthest_point_sample, index_points
from ldt_tpu.training.compressor_trainer import Trainer as CompressorTrainer


@functools.partial(jax.jit, static_argnums=(1,))
def _fps_to(pc, n: int):
    idx = furthest_point_sample(pc, n)
    return index_points(pc, idx)


def fps_to(pc, n: int):
    """FPS-downsample [B, N, 3] -> [B, n, 3] (the entry-side 2048-point
    subsampling, train_Completion_Compressor.py:55-57). One jitted dispatch;
    the result stays on device — keep it there (no np.asarray between FPS
    and the train step: a device->host->device bounce per step is pure
    transport latency on the tunnel)."""
    return _fps_to(jnp.asarray(pc), int(n))


class Trainer(CompressorTrainer):
    def update(self, data):
        """Accepts either a raw [B, N, 3] array (reference calling
        convention) or a ViPC batch dict."""
        if isinstance(data, dict) and "tr_points" not in data:
            data = {"tr_points": jnp.asarray(data["pc"]),
                    "cate_idx": np.zeros((len(data["pc"]),), np.int32)}
        elif not isinstance(data, dict):
            # device arrays (fps_to output) pass straight through — no
            # host round-trip before the jitted train step
            data = {"tr_points": jnp.asarray(data),
                    "cate_idx": np.zeros((data.shape[0],), np.int32)}
        return super().update(data)

    def reconstruction(self, test_loader, val_cate=0):
        """CD x 1000 + F1 eval (completion_trainer/Compressor_Trainer.py:66-95)."""
        all_ref, all_rec = [], []
        for data in test_loader:
            ref_pts = fps_to(data["pc"], self.num_points)
            if self.state is None:
                self.maybe_init({"tr_points": np.asarray(ref_pts),
                                 "cate_idx": np.zeros(
                                     (ref_pts.shape[0],), np.int32)})
            out = self.encode(ref_pts)
            all_rec.append(np.asarray(out["set"]))
            all_ref.append(np.asarray(ref_pts))
        rec = np.concatenate(all_rec)
        ref = np.concatenate(all_ref)
        np.save(os.path.join(self.cfg.log.save_path,
                             f"rec_ep{self.epoch}.npy"), rec)
        cd = L2_ChamferEval_1000(jnp.asarray(rec), jnp.asarray(ref))
        f1, _, _ = F1Score(jnp.asarray(rec), jnp.asarray(ref))
        all_res = {"cd": float(cd), "f1score": float(jnp.mean(f1))}
        print(f"Validation Sample (unit) Epoch:{self.epoch} ", all_res)
        return all_res

    reconstrustion = reconstruction

    def load_pretrain(self):
        from ldt_tpu.training.checkpoint import load_checkpoint, restore_into

        if not self.cfg.model.pretrain_path:
            raise ValueError(
                "completion compressor finetune bootstraps from a stage-1 "
                "checkpoint: set model.pretrain_path in config.yaml (or "
                "pass --resume to continue this run)")
        ckpt = load_checkpoint(self.cfg.model.pretrain_path)
        restored = restore_into({"state": self.state}, ckpt["state"])
        # restored leaves are host numpy: place once (see device_put_host)
        self.state = device_put_host(self.mesh, restored["state"])
