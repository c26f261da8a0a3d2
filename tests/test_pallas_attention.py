"""Differential tests: Pallas fused attention core vs XLA oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldt_tpu.ops.pallas_attention import (
    fused_attention_core,
    reference_attention_core,
)


@pytest.mark.parametrize("b,n,d,h", [(2, 32, 128, 4), (4, 16, 64, 2),
                                     (1, 32, 256, 8)])
def test_fused_matches_reference(b, n, d, h):
    ks = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(ks[0], (b, n, d))
    k = jax.random.normal(ks[1], (b, n, d))
    v = jax.random.normal(ks[2], (b, n, d))
    want = reference_attention_core(q, k, v, h)
    got = fused_attention_core(q, k, v, h, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_fused_bf16():
    ks = jax.random.split(jax.random.key(1), 3)
    q = jax.random.normal(ks[0], (2, 32, 128), jnp.bfloat16)
    k = jax.random.normal(ks[1], (2, 32, 128), jnp.bfloat16)
    v = jax.random.normal(ks[2], (2, 32, 128), jnp.bfloat16)
    want = reference_attention_core(q, k, v, 4).astype(jnp.float32)
    got = fused_attention_core(q, k, v, 4, interpret=True).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-2, atol=5e-2)


def test_score_with_fused_attention_matches_standard():
    """A Score built with fused_attention=True shares params and outputs."""
    from ldt_tpu.models import Score
    from ldt_tpu.tools.io import dict2namespace

    cfg = dict2namespace(dict(
        num_steps=10, z_dim=8, z_scale=16, hidden_size=64, num_heads=4,
        num_blocks=2, num_categorys=1, t_dim=16, dropout=0.0,
        norm="layer_norm", learn_sigma=False, act="swish", unet=False,
        AdaLN=True, condition=False))
    x = jax.random.normal(jax.random.key(0), (2, cfg.z_scale, cfg.z_dim))
    t = jnp.full((2,), 0.3)
    base = Score(cfg)
    variables = base.init(jax.random.key(1), x, t)
    fused = Score(cfg, fused_attention=True)
    want = base.apply(variables, x, t)
    got = fused.apply(variables, x, t)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)
