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


class TestShardedFormat:
    """Streaming checkpoint format (VERDICT r1 next-round #1): sharded raw
    bytes + manifest, bf16 Adam moments, async writes."""

    def _tree(self, nbytes_big=4 << 20):
        rng = np.random.RandomState(0)
        n = nbytes_big // 4
        return {
            "params": {"w": rng.randn(n).astype(np.float32),
                       "b": rng.randn(257).astype(np.float32)},
            "opt_state": {"1": {
                "count": np.int32(17),
                "mu": {"w": rng.randn(n).astype(np.float32)},
                "nu": {"w": (np.abs(rng.randn(n)) + 1e-3).astype(np.float32)},
            }},
        }

    def test_sharded_roundtrip_bitexact(self, tmp_path):
        tree = self._tree()
        path = str(tmp_path / "ck.msgpack")
        save_checkpoint(path, tree, epoch=5, itr=9, time=2.0,
                        shard_threshold=1 << 20)  # force sharding
        import os
        assert os.path.exists(path + ".shard0")
        ckpt = load_checkpoint(path)
        assert ckpt["epoch"] == 5 and ckpt["itr"] == 9
        restored = restore_into(tree, ckpt["state"])
        for k in ("w", "b"):
            np.testing.assert_array_equal(restored["params"][k],
                                          tree["params"][k])
        np.testing.assert_array_equal(restored["opt_state"]["1"]["mu"]["w"],
                                      tree["opt_state"]["1"]["mu"]["w"])
        assert int(restored["opt_state"]["1"]["count"]) == 17

    def test_bf16_moments_params_bitexact(self, tmp_path):
        tree = self._tree()
        path = str(tmp_path / "ck.msgpack")
        save_checkpoint(path, tree, shard_threshold=1 << 20,
                        moments_bf16=True)
        ckpt = load_checkpoint(path)
        # on-disk moments are bf16; params are f32 and bit-exact
        import jax.numpy as jnp
        raw_mu = ckpt["state"]["opt_state"]["1"]["mu"]["w"]
        assert raw_mu.dtype == jnp.bfloat16
        assert ckpt["state"]["params"]["w"].dtype == np.float32
        restored = restore_into(tree, ckpt["state"])
        np.testing.assert_array_equal(restored["params"]["w"],
                                      tree["params"]["w"])
        # moments restored to f32 within bf16 tolerance (~2^-8 relative)
        assert restored["opt_state"]["1"]["mu"]["w"].dtype == np.float32
        np.testing.assert_allclose(restored["opt_state"]["1"]["mu"]["w"],
                                   tree["opt_state"]["1"]["mu"]["w"],
                                   rtol=1 / 128, atol=1e-6)
        # count must NOT be casted (int) and Adam eps-sensitive nu stays >= 0
        assert (restored["opt_state"]["1"]["nu"]["w"] >= 0).all()

    def test_async_write_then_load(self, tmp_path):
        from ldt_tpu.training.checkpoint import wait_pending_saves

        tree = self._tree(nbytes_big=1 << 20)
        path = str(tmp_path / "ck.msgpack")
        save_checkpoint(path, tree, epoch=1, shard_threshold=1 << 19,
                        async_write=True)
        # load_checkpoint joins pending writes internally
        ckpt = load_checkpoint(path)
        restored = restore_into(tree, ckpt["state"])
        np.testing.assert_array_equal(restored["params"]["w"],
                                      tree["params"]["w"])
        wait_pending_saves()

    def test_single_file_below_threshold(self, tmp_path):
        import os

        tree = small_tree()
        path = str(tmp_path / "ck.msgpack")
        save_checkpoint(path, tree, epoch=1)
        assert not os.path.exists(path + ".shard0")
        restored = restore_into(tree, load_checkpoint(path)["state"])
        np.testing.assert_array_equal(restored["params"]["w"],
                                      tree["params"]["w"])

    def test_stale_shards_removed(self, tmp_path):
        import os

        tree = self._tree()
        path = str(tmp_path / "ck.msgpack")
        # first save with tiny target -> many shards; fake by padding file
        save_checkpoint(path, tree, shard_threshold=1 << 20)
        open(path + ".shard9", "wb").write(b"stale")
        save_checkpoint(path, tree, shard_threshold=1 << 20)
        assert not os.path.exists(path + ".shard9")

    def test_trainer_flagship_path_roundtrip(self, tmp_path):
        """latent_sde_trainer.save (bf16 moments + async + sharded when big)
        -> resume restores f32 moments and identical params."""
        import jax

        from ldt_tpu.models import Compressor, Score
        from ldt_tpu.training import latent_sde_trainer
        from tests.test_training import fake_batch, make_cfg

        cfg = make_cfg(tmp_path)
        tr = latent_sde_trainer.Trainer(cfg, Score(cfg.score),
                                        Compressor(cfg.compressor))
        batch = fake_batch()
        tr.update(batch)
        tr.epoch = 2
        tr.save()
        t2 = latent_sde_trainer.Trainer(cfg, Score(cfg.score),
                                        Compressor(cfg.compressor),
                                        rng=jax.random.key(5))
        t2.maybe_init(batch)
        t2.resume(epoch=2)
        w1 = jax.tree_util.tree_leaves(tr.state.params)[0]
        w2 = jax.tree_util.tree_leaves(t2.state.params)[0]
        np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))
        m1 = jax.tree_util.tree_leaves(tr.state.opt_state)[0]
        m2 = jax.tree_util.tree_leaves(t2.state.opt_state)[0]
        assert np.asarray(m2).dtype == np.asarray(m1).dtype


class TestShapeDriftRestore:
    def test_broadcastable_leaf_broadcasts(self):
        """Pre-round-3 ActNorm checkpoints stored pooled [1,1,F] stats; the
        model now has per-token [1,z,F] — restore broadcasts (bit-exact
        semantics), anything non-broadcastable raises."""
        import jax.numpy as jnp
        import pytest

        from ldt_tpu.training.checkpoint import restore_into

        template = {"p": {"shift": jnp.zeros((1, 4, 8))}}
        loaded = {"p": {"shift": np.arange(8, dtype=np.float32
                                           ).reshape(1, 1, 8)}}
        out = restore_into(template, loaded)
        assert np.asarray(out["p"]["shift"]).shape == (1, 4, 8)
        np.testing.assert_array_equal(np.asarray(out["p"]["shift"])[0, 2],
                                      np.arange(8, dtype=np.float32))
        # non-broadcastable ActNorm leaf still fails loudly
        bad = {"p": {"shift": np.zeros((1, 3, 8), np.float32)}}
        with pytest.raises(ValueError, match="shape"):
            restore_into(template, bad)
        # the broadcast is SCOPED to ActNorm stats: a broadcast-compatible
        # kernel must NOT be silently tiled (wrong-config checkpoint)
        tmpl_k = {"p": {"kernel": jnp.zeros((4, 8))}}
        load_k = {"p": {"kernel": np.zeros((1, 8), np.float32)}}
        with pytest.raises(ValueError, match="kernel"):
            restore_into(tmpl_k, load_k)


class TestResolveCheckpointEpoch:
    """resolve_checkpoint_epoch — shared by the gate/profile scripts."""

    def _touch(self, d, epoch):
        (d / f"checkpt_{epoch}.msgpack").write_bytes(b"x")

    def test_explicit_epoch_must_exist(self, tmp_path):
        from ldt_tpu.training.checkpoint import resolve_checkpoint_epoch

        self._touch(tmp_path, 10)
        assert resolve_checkpoint_epoch(str(tmp_path), 10) == 10
        with pytest.raises(FileNotFoundError, match="epoch 20"):
            resolve_checkpoint_epoch(str(tmp_path), 20)

    def test_csv_epoch_used_when_on_disk(self, tmp_path):
        from ldt_tpu.training.checkpoint import resolve_checkpoint_epoch

        (tmp_path / "training.csv").write_text("epoch,loss\n5,1.0\n7,0.9\n")
        self._touch(tmp_path, 7)
        assert resolve_checkpoint_epoch(str(tmp_path)) == 7

    def test_falls_back_to_newest_on_disk(self, tmp_path):
        from ldt_tpu.training.checkpoint import resolve_checkpoint_epoch

        # CSV ran past the last save (save_epoch_freq > 1)
        (tmp_path / "training.csv").write_text("epoch,loss\n9,1.0\n")
        self._touch(tmp_path, 4)
        self._touch(tmp_path, 8)
        assert resolve_checkpoint_epoch(str(tmp_path)) == 8

    def test_empty_dir_raises(self, tmp_path):
        from ldt_tpu.training.checkpoint import resolve_checkpoint_epoch

        with pytest.raises(FileNotFoundError, match="no checkpoints"):
            resolve_checkpoint_epoch(str(tmp_path))
