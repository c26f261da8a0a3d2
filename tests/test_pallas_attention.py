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


@pytest.mark.parametrize("group", [0, 2, 4, 8, 16])
def test_grouped_heads_variant_matches_reference(group, monkeypatch):
    """The grouped-heads self-attention kernel (block-diagonal mask packing,
    see `_fwd_kernel_grouped`) is numerically identical to the oracle for
    every group size, including the per-head fallback (group=0)."""
    import ldt_tpu.ops.pallas_attention as pa

    monkeypatch.setattr(pa, "_GROUP_HEADS", group)
    b, n, h, dh = 2, 32, 16, 16
    d = h * dh
    ks = jax.random.split(jax.random.key(7), 3)
    q = jax.random.normal(ks[0], (b, n, d))
    k = jax.random.normal(ks[1], (b, n, d))
    v = jax.random.normal(ks[2], (b, n, d))
    want = reference_attention_core(q, k, v, h)
    got = pa._fwd_call(q, k, v, h, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)
    # grads route through the (per-head) backward kernel regardless of the
    # forward grouping
    def loss(fn):
        return lambda q, k, v: jnp.sum(jnp.sin(fn(q, k, v)))

    g_f = jax.grad(loss(lambda q, k, v: pa.fused_attention(q, k, v, h, True)),
                   argnums=(0, 1, 2))(q, k, v)
    g_r = jax.grad(loss(lambda q, k, v: reference_attention_core(q, k, v, h)),
                   argnums=(0, 1, 2))(q, k, v)
    for a, c in zip(g_f, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=5e-4, atol=1e-4)


def test_phased_packed_variant_matches_reference(monkeypatch):
    """The phase-separated packed forward (`_fwd_kernel_packed_phased`,
    LDT_ATTN_PHASED) is numerically identical to the oracle."""
    import ldt_tpu.ops.pallas_attention as pa

    b, n, h, dh = 2, 32, 16, 16
    d = h * dh
    ks = jax.random.split(jax.random.key(11), 3)
    q = jax.random.normal(ks[0], (b, n, d))
    k = jax.random.normal(ks[1], (b, n, d))
    v = jax.random.normal(ks[2], (b, n, d))
    qkv = jnp.concatenate([q, k, v], axis=-1)
    want = reference_attention_core(q, k, v, h)
    monkeypatch.setattr(pa, "_PHASED", True)
    got = pa._fwd_call_packed(qkv, h, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)
    monkeypatch.setattr(pa, "_PHASED", False)
    base = pa._fwd_call_packed(qkv, h, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("b,n,m,d,h", [(2, 32, 32, 128, 4),
                                       (2, 64, 8, 64, 2),
                                       (1, 128, 16, 256, 8)])
def test_cross_attention_matches_reference(b, n, m, d, h):
    """N != M cross-attention (the 2048x32 Compressor decode shape family,
    Network.py:80-83)."""
    from ldt_tpu.ops.pallas_attention import fused_attention

    ks = jax.random.split(jax.random.key(2), 3)
    q = jax.random.normal(ks[0], (b, n, d))
    k = jax.random.normal(ks[1], (b, m, d))
    v = jax.random.normal(ks[2], (b, m, d))
    want = reference_attention_core(q, k, v, h)
    got = fused_attention(q, k, v, h, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("b,n,m,d,h", [(2, 16, 16, 64, 4), (2, 24, 8, 64, 2)])
def test_fused_attention_grads_match_oracle(b, n, m, d, h):
    """Custom-VJP (Pallas backward kernel) vs XLA autodiff of the oracle."""
    from ldt_tpu.ops.pallas_attention import fused_attention

    ks = jax.random.split(jax.random.key(3), 3)
    q = jax.random.normal(ks[0], (b, n, d))
    k = jax.random.normal(ks[1], (b, m, d))
    v = jax.random.normal(ks[2], (b, m, d))

    def loss_fused(q, k, v):
        out = fused_attention(q, k, v, h, True)
        return jnp.sum(jnp.sin(out) * out)

    def loss_ref(q, k, v):
        out = reference_attention_core(q, k, v, h)
        return jnp.sum(jnp.sin(out) * out)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr, name in zip(g_fused, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=5e-4, atol=1e-4,
                                   err_msg=f"d{name} mismatch")


def test_score_train_step_grads_with_fused_attention():
    """End-to-end: grads of a Score loss with the fused path == XLA path."""
    from ldt_tpu.models import Score
    from ldt_tpu.tools.io import dict2namespace

    cfg = dict2namespace(dict(
        num_steps=10, z_dim=8, z_scale=16, hidden_size=64, num_heads=4,
        num_blocks=2, num_categorys=1, t_dim=16, dropout=0.0,
        norm="layer_norm", learn_sigma=False, act="swish", unet=False,
        AdaLN=True, condition=False))
    x = jax.random.normal(jax.random.key(0), (2, cfg.z_scale, cfg.z_dim))
    t = jnp.full((2,), 0.3)
    target = jax.random.normal(jax.random.key(4), x.shape)
    base = Score(cfg)
    fused = Score(cfg, fused_attention=True)
    variables = base.init(jax.random.key(1), x, t)

    def loss(params, model):
        pred = model.apply({"params": params}, x, t)
        return jnp.mean((pred - target) ** 2)

    g_base = jax.grad(loss)(variables["params"], base)
    g_fused = jax.grad(loss)(variables["params"], fused)
    flat_b = jax.tree_util.tree_leaves(g_base)
    flat_f = jax.tree_util.tree_leaves(g_fused)
    for a, c in zip(flat_b, flat_f):
        np.testing.assert_allclose(np.asarray(c), np.asarray(a),
                                   rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_compressor_fused_forward_and_grads_match():
    """Compressor with fused attention (incl. the decode cross-attention)
    shares params, outputs, and gradients with the XLA build."""
    from ldt_tpu.models import Compressor
    from ldt_tpu.tools.io import dict2namespace

    cfg = dict2namespace(dict(
        outsize=64, max_outputs=64, input_dim=3, z_dim=4, z_scales=8,
        p_dim=16, n_layers=2, hidden_dim=32, num_heads=2, activation="swish",
        encoder_dropout_p=0.0, decoder_dropout_p=0.0, norm="layer_norm",
        neighbors=8, encoder_layers=1, mlp_ratio=2.0, min_sigma=-30,
        cluster_norm="anchor", norm_input=False, pre_group=False,
        decoder_act=None, ActNorm=True, AdaLN=True, pos_embedding="center",
        class_condition=False, num_categorys=1, pretrain_path=None))
    pts = jax.random.normal(jax.random.key(0), (2, 64, 3))
    base = Compressor(cfg)
    fused = Compressor(cfg, fused_attention=True)
    variables = base.init({"params": jax.random.key(1),
                           "sample": jax.random.key(2)}, pts)

    def loss(params, model):
        out = model.apply(
            {"params": params,
             "batch_stats": variables.get("batch_stats", {})}, pts,
            rngs={"sample": jax.random.key(3)})
        return jnp.mean(out["set"] ** 2) + jnp.mean(out["all_eps"] ** 2)

    l_base, g_base = jax.value_and_grad(loss)(variables["params"], base)
    l_fused, g_fused = jax.value_and_grad(loss)(variables["params"], fused)
    np.testing.assert_allclose(float(l_fused), float(l_base), rtol=1e-5)
    for a, c in zip(jax.tree_util.tree_leaves(g_base),
                    jax.tree_util.tree_leaves(g_fused)):
        np.testing.assert_allclose(np.asarray(c), np.asarray(a),
                                   rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize("elems", [2, 4])
def test_multi_element_phased_variant_matches_reference(elems, monkeypatch):
    """The multi-element phased packed forward
    (`_fwd_kernel_packed_phased_multi`, LDT_ATTN_ELEMS) matches the oracle
    and falls back per-element when the batch doesn't divide."""
    import ldt_tpu.ops.pallas_attention as pa

    b, n, h, dh = 4, 32, 16, 16
    d = h * dh
    ks = jax.random.split(jax.random.key(13), 3)
    q = jax.random.normal(ks[0], (b, n, d))
    k = jax.random.normal(ks[1], (b, n, d))
    v = jax.random.normal(ks[2], (b, n, d))
    qkv = jnp.concatenate([q, k, v], axis=-1)
    want = reference_attention_core(q, k, v, h)
    monkeypatch.setattr(pa, "_PHASED", True)
    monkeypatch.setattr(pa, "_ELEMS", elems)
    got = pa._fwd_call_packed(qkv, h, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)
    # batch not divisible by elems -> single-element phased path
    got3 = pa._fwd_call_packed(qkv[:3], h, True)
    np.testing.assert_allclose(np.asarray(got3), np.asarray(want[:3]),
                               rtol=2e-4, atol=2e-5)


def test_int8_phased_variant_close_to_reference(monkeypatch):
    """The int8-operand phased forward (LDT_ATTN_INT8) quantizes q/k/v to
    8 bits with per-program scales and the weights to a static 1/127 —
    expect agreement with the f32 oracle at quantization precision (the
    shipping decision belongs to the golden CD gate, this bounds the raw
    kernel error)."""
    import ldt_tpu.ops.pallas_attention as pa

    b, n, h, dh = 4, 32, 16, 16
    d = h * dh
    ks = jax.random.split(jax.random.key(7), 3)
    q = jax.random.normal(ks[0], (b, n, d))
    k = jax.random.normal(ks[1], (b, n, d))
    v = jax.random.normal(ks[2], (b, n, d))
    qkv = jnp.concatenate([q, k, v], axis=-1)
    want = reference_attention_core(q, k, v, h)
    monkeypatch.setattr(pa, "_PHASED", True)
    monkeypatch.setattr(pa, "_ELEMS", 4)
    monkeypatch.setattr(pa, "_INT8_ATTN", True)
    got = pa._fwd_call_packed(qkv, h, True)
    err = np.abs(np.asarray(got) - np.asarray(want))
    scale = np.abs(np.asarray(want)).max()
    assert err.max() <= 0.05 * scale, (err.max(), scale)
    # and the rms error is much tighter than the max bound
    assert np.sqrt((err ** 2).mean()) <= 0.01 * scale
