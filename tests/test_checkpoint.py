"""Checkpoint format tests: strict/non-strict restore, dtype recast,
sharded streaming writes (added round 2 per VERDICT.md items 1 and 9)."""

import numpy as np
import pytest

from ldt_tpu.training.checkpoint import (
    checkpoint_path,
    load_checkpoint,
    restore_into,
    save_checkpoint,
)


def small_tree():
    return {
        "params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3),
                   "b": np.zeros(3, np.float32)},
        "extra": np.ones(4, np.float32),
    }


class TestStrictRestore:
    def test_strict_roundtrip(self, tmp_path):
        tree = small_tree()
        path = str(tmp_path / "ck.msgpack")
        save_checkpoint(path, tree, epoch=3, itr=7, time=1.5)
        ckpt = load_checkpoint(path)
        restored = restore_into(tree, ckpt["state"])
        np.testing.assert_array_equal(restored["params"]["w"],
                                      tree["params"]["w"])
        assert ckpt["epoch"] == 3 and ckpt["itr"] == 7

    def test_strict_missing_key_raises(self):
        tree = small_tree()
        partial = {"params": {"w": tree["params"]["w"]}}
        with pytest.raises(Exception):
            restore_into(tree, partial, strict=True)

    def test_non_strict_keeps_template_for_missing(self):
        tree = small_tree()
        loaded = {"params": {"w": tree["params"]["w"] + 1.0}}
        restored = restore_into(tree, loaded, strict=False)
        np.testing.assert_array_equal(restored["params"]["w"],
                                      tree["params"]["w"] + 1.0)
        # missing keys keep the template values
        np.testing.assert_array_equal(restored["params"]["b"],
                                      tree["params"]["b"])
        np.testing.assert_array_equal(restored["extra"], tree["extra"])

    def test_non_strict_ignores_unexpected(self):
        tree = small_tree()
        loaded = {"params": {"w": tree["params"]["w"], "b": tree["params"]["b"],
                             "stale_head": np.ones(2)},
                  "extra": tree["extra"], "other": {"x": np.zeros(1)}}
        restored = restore_into(tree, loaded, strict=False)
        np.testing.assert_array_equal(restored["params"]["w"],
                                      tree["params"]["w"])
        assert "stale_head" not in restored["params"]

    def test_dtype_recast_to_template(self):
        import jax.numpy as jnp

        tree = {"mu": np.linspace(0, 1, 8, dtype=np.float32)}
        loaded = {"mu": np.asarray(
            jnp.asarray(tree["mu"]).astype(jnp.bfloat16))}
        restored = restore_into(tree, loaded)
        assert restored["mu"].dtype == np.float32
        np.testing.assert_allclose(restored["mu"], tree["mu"], atol=1 / 128)


class TestTrainerStrictFlag:
    def test_resume_non_strict_tolerates_extra_keys(self, tmp_path):
        """A checkpoint with an extra top-level entry loads with
        strict=False and fails with strict=True (honoring the CLI flag the
        reference forwards to load_state_dict)."""
        from ldt_tpu.models import Compressor, Score
        from ldt_tpu.training import latent_sde_trainer
        from tests.test_training import fake_batch, make_cfg

        cfg = make_cfg(tmp_path)
        trainer = latent_sde_trainer.Trainer(cfg, Score(cfg.score),
                                             Compressor(cfg.compressor))
        batch = fake_batch()
        trainer.maybe_init(batch)
        trainer.epoch = 2
        trainer.save()
        path = checkpoint_path(trainer.cfg.log.save_path, 2)
        ckpt = load_checkpoint(path)
        ckpt["state"]["vestigial"] = {"x": np.zeros(3, np.float32)}
        save_checkpoint(path, ckpt["state"], epoch=ckpt["epoch"],
                        itr=ckpt["itr"], time=ckpt["time"])

        with pytest.raises(Exception):
            trainer.resume(epoch=2, strict=True)
        trainer.resume(epoch=2, strict=False)
        assert trainer.epoch == 3
