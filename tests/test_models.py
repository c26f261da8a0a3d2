"""Shape/semantics tests for the nn layer and the Compressor/Score models.

Mirrors the reference's `__main__` smoke tests (model/Compressor/Network.py:288-307,
model/scorenet/score.py:154-176) as real pytest cases on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldt_tpu.models import Compressor, Score
from ldt_tpu.nn.layers import (
    ActNorm,
    ResidualBlock,
    TimeEmbedding,
    sinusoidal_embedding,
)
from ldt_tpu.tools.io import dict2namespace


def small_compressor_cfg(**over):
    cfg = dict(
        outsize=128, max_outputs=128, input_dim=3, z_dim=4, z_scales=8,
        p_dim=16, n_layers=2, hidden_dim=32, num_heads=2, activation="swish",
        encoder_dropout_p=0.0, decoder_dropout_p=0.0, norm="layer_norm",
        neighbors=16, encoder_layers=2, mlp_ratio=2.0, min_sigma=-30,
        cluster_norm="anchor", norm_input=False, pre_group=False,
        decoder_act=None, ActNorm=True, AdaLN=True, pos_embedding="center",
        class_condition=False, num_categorys=1,
    )
    cfg.update(over)
    return dict2namespace(cfg)


def small_score_cfg(**over):
    cfg = dict(
        num_steps=10, z_dim=8, z_scale=8, hidden_size=32, num_heads=4,
        num_blocks=2, num_categorys=1, t_dim=16, dropout=0.0,
        norm="layer_norm", learn_sigma=False, act="swish", unet=False,
        AdaLN=True, condition=False,
    )
    cfg.update(over)
    return dict2namespace(cfg)


class TestNNLayers:
    def test_sinusoidal_embedding_formula(self):
        ts = jnp.array([0.0, 1.0, 5.0])
        emb = sinusoidal_embedding(ts, 8)
        half = 4
        freqs = np.exp(np.arange(half) * (-np.log(10000.0) / (half - 1)))
        want = np.concatenate(
            [np.sin(np.outer(ts, freqs)), np.cos(np.outer(ts, freqs))], axis=1)
        np.testing.assert_allclose(np.asarray(emb), want, atol=1e-5)

    def test_time_embedding_shape(self):
        m = TimeEmbedding(8, 16)
        params = m.init(jax.random.key(0), jnp.zeros((3,)))
        out = m.apply(params, jnp.array([0.1, 0.5, 0.9]))
        assert out.shape == (3, 16)

    def test_actnorm_data_dependent_init(self):
        x = jax.random.normal(jax.random.key(1), (4, 10, 6)) * 3.0 + 2.0
        m = ActNorm(6)
        params = m.init(jax.random.key(0), x)
        z = m.apply(params, x)
        # After data-dependent init the init batch is standardized per feature.
        np.testing.assert_allclose(
            np.asarray(jnp.mean(z.reshape(-1, 6), axis=0)), 0.0, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(jnp.std(z.reshape(-1, 6), axis=0, ddof=1)), 1.0,
            atol=1e-3)

    def test_residual_block_self_attention(self):
        m = ResidualBlock(16, dim_c=8, num_heads=4)
        x = jnp.ones((2, 5, 16))
        c = jnp.ones((2, 8))
        params = m.init(jax.random.key(0), x, x, c)
        out = m.apply(params, x, x, c)
        assert out.shape == (2, 5, 16)

    def test_residual_block_cross_attention_dim_change(self):
        # dim_in != dim_out exercises the adaLN1/adaLN2 split path
        # (model/layers.py:174-175,216-217).
        m = ResidualBlock(16, dim_c=8, num_heads=4, dim_out=12)
        x = jnp.ones((2, 5, 16))
        y = jnp.ones((2, 3, 16))
        c = jnp.ones((2, 8))
        params = m.init(jax.random.key(0), x, y, c)
        out = m.apply(params, x, y, c)
        assert out.shape == (2, 5, 12)
        names = set(params["params"].keys())
        assert "adaLN1" in names and "adaLN2" in names

    def test_residual_block_unconditional(self):
        m = ResidualBlock(16, dim_c=None, num_heads=4, norm="layer_norm")
        x = jnp.ones((2, 5, 16))
        params = m.init(jax.random.key(0), x)
        out = m.apply(params, x)
        assert out.shape == (2, 5, 16)


class TestCompressor:
    @pytest.fixture(scope="class")
    def built(self):
        cfg = small_compressor_cfg()
        model = Compressor(cfg)
        pts = jax.random.normal(jax.random.key(0), (2, 128, 3))
        variables = model.init(
            {"params": jax.random.key(1), "sample": jax.random.key(2)}, pts)
        return cfg, model, variables, pts

    def test_forward_contract(self, built):
        cfg, model, variables, pts = built
        out = model.apply(variables, pts, rngs={"sample": jax.random.key(3)})
        assert out["set"].shape == (2, 128, 3)
        assert out["all_eps"].shape == (2, cfg.z_scales,
                                        cfg.n_layers * cfg.z_dim)
        assert len(out["kls"]) == cfg.n_layers
        assert len(out["all_logqz"]) == cfg.n_layers
        assert out["max"].shape == ()
        assert len(out["posteriors"]) == cfg.n_layers + 1

    def test_sample_roundtrip(self, built):
        # encode -> decode from the same eps must be deterministic given eps
        cfg, model, variables, pts = built
        out = model.apply(variables, pts, rngs={"sample": jax.random.key(3)})
        rec = model.apply(variables, (2, 128), out["all_eps"],
                          method=Compressor.sample)
        rec2 = model.apply(variables, (2, 128), out["all_eps"],
                           method=Compressor.sample)
        assert rec.shape == (2, 128, 3)
        np.testing.assert_allclose(np.asarray(rec), np.asarray(rec2))

    def test_sample_from_prior(self, built):
        cfg, model, variables, _ = built
        smp = model.apply(variables, (3, 128), None,
                          method=Compressor.sample,
                          rngs={"sample": jax.random.key(7)})
        assert smp.shape == (3, 128, 3)
        assert np.isfinite(np.asarray(smp)).all()

    def test_forward_jits(self, built):
        cfg, model, variables, pts = built

        @jax.jit
        def fwd(v, p, key):
            return model.apply(v, p, rngs={"sample": key})["set"]

        out = fwd(variables, pts, jax.random.key(0))
        assert out.shape == (2, 128, 3)


class TestScore:
    def test_forward_shape(self):
        cfg = small_score_cfg()
        model = Score(cfg)
        x = jax.random.normal(jax.random.key(0), (4, cfg.z_scale, cfg.z_dim))
        t = jax.random.uniform(jax.random.key(1), (4,))
        variables = model.init(jax.random.key(2), x, t)
        out = model.apply(variables, x, t)
        assert out.shape == (4, cfg.z_scale, cfg.z_dim)

    def test_unet_variant(self):
        cfg = small_score_cfg(unet=True)
        model = Score(cfg)
        x = jax.random.normal(jax.random.key(0), (2, cfg.z_scale, cfg.z_dim))
        t = jnp.ones((2,)) * 0.5
        variables = model.init(jax.random.key(2), x, t)
        out = model.apply(variables, x, t)
        assert out.shape == (2, cfg.z_scale, cfg.z_dim)

    def test_conditional_with_img_and_pts(self):
        cfg = small_score_cfg(condition=True)
        model = Score(cfg)
        x = jax.random.normal(jax.random.key(0), (2, cfg.z_scale, cfg.z_dim))
        t = jnp.ones((2,)) * 0.5
        condition = {
            "img": jnp.ones((2, 64, 64, 3)),
            "pts": jax.random.normal(jax.random.key(1), (2, 64, 3)),
        }
        variables = model.init(jax.random.key(2), x, t, condition=condition)
        out = model.apply(variables, x, t, condition=condition)
        assert out.shape == (2, cfg.z_scale, cfg.z_dim)

    def test_label_conditioning(self):
        cfg = small_score_cfg(num_categorys=5)
        model = Score(cfg)
        x = jax.random.normal(jax.random.key(0), (2, cfg.z_scale, cfg.z_dim))
        t = jnp.ones((2,)) * 0.5
        label = jnp.array([0, 3])
        variables = model.init(jax.random.key(2), x, t, label)
        out = model.apply(variables, x, t, label)
        assert out.shape == (2, cfg.z_scale, cfg.z_dim)
