"""Structural round-trip of checkpoints containing stateless pytree nodes.

Optax `chain` states serialize empty members (`EmptyState`) to `{}`; the
flatten/unflatten used by the bf16-moment rebuild and the sharded writer must
preserve them, or a STRICT restore fails with a tuple-arity error at
`opt_state` (regression caught by the round-2 CLI verify drive)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ldt_tpu.training.checkpoint import (
    load_checkpoint,
    restore_into,
    save_checkpoint,
)
from ldt_tpu.training.state import TrainState, make_optimizer


def _make_state():
    params = {"w": jnp.arange(12.0).reshape(3, 4), "b": jnp.zeros((4,))}
    tx = make_optimizer(grad_clip=1.0)  # chain => contains EmptyState members
    return TrainState.create(params, tx, ema=True), tx


def test_strict_roundtrip_with_bf16_moments(tmp_path):
    state, _ = _make_state()
    path = os.path.join(tmp_path, "checkpt_1.msgpack")
    save_checkpoint(path, {"score": state}, epoch=1, moments_bf16=True)
    ckpt = load_checkpoint(path)
    restored = restore_into({"score": state}, ckpt["state"], strict=True)
    chex_leaves = jax.tree_util.tree_leaves(restored["score"].params)
    for a, b in zip(chex_leaves, jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # structure (incl. the empty chain members) is identical
    assert (jax.tree_util.tree_structure(restored["score"].opt_state)
            == jax.tree_util.tree_structure(state.opt_state))


def test_strict_roundtrip_sharded_format(tmp_path):
    state, _ = _make_state()
    path = os.path.join(tmp_path, "checkpt_2.msgpack")
    # force the sharded writer even for this tiny state
    save_checkpoint(path, {"score": state}, epoch=2, moments_bf16=True,
                    shard_threshold=1)
    assert os.path.exists(path + ".shard0")
    ckpt = load_checkpoint(path)
    restored = restore_into({"score": state}, ckpt["state"], strict=True)
    assert (jax.tree_util.tree_structure(restored["score"].opt_state)
            == jax.tree_util.tree_structure(state.opt_state))
    np.testing.assert_array_equal(
        np.asarray(restored["score"].params["w"]),
        np.asarray(state.params["w"]))
