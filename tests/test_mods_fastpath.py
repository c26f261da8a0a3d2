"""Equivalence test: precomputed-modulation DiT path == standard path."""

import jax
import jax.numpy as jnp
import numpy as np

from ldt_tpu.models import Score
from ldt_tpu.models.score import Score as ScoreCls
from ldt_tpu.tools.io import dict2namespace


def small_score_cfg():
    return dict2namespace(dict(
        num_steps=10, z_dim=8, z_scale=8, hidden_size=32, num_heads=4,
        num_blocks=3, num_categorys=1, t_dim=16, dropout=0.0,
        norm="layer_norm", learn_sigma=False, act="swish", unet=False,
        AdaLN=True, condition=False))


def test_denoise_with_mods_matches_standard_forward():
    cfg = small_score_cfg()
    model = Score(cfg)
    x = jax.random.normal(jax.random.key(0), (4, cfg.z_scale, cfg.z_dim))
    t_vec = jnp.linspace(1.0, 1e-6, 5)
    variables = model.init(jax.random.key(1), x, jnp.ones((4,)))

    mods = model.apply(variables, t_vec, method=ScoreCls.precompute_mods)
    assert mods["blocks"].shape == (5, cfg.num_blocks, 6 * cfg.hidden_size)
    assert mods["final"].shape == (5, 2 * cfg.hidden_size)

    for step in (0, 2, 4):
        want = model.apply(variables, x, jnp.full((4,), t_vec[step]))
        step_mods = jax.tree_util.tree_map(lambda m: m[step], mods)
        got = model.apply(variables, x, step_mods,
                          method=ScoreCls.denoise_with_mods)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


def test_sampler_step_indexed_score_fn():
    """sample_discrete threads the scan index into step-aware score_fns."""
    from ldt_tpu.diffusion import DiffusionVPSDE
    from ldt_tpu.diffusion.sampling import sample_discrete
    from ldt_tpu.tools.io import dict2namespace as ns

    sde = DiffusionVPSDE(ns(dict(
        beta_start=0.1, beta_end=20.0, sde_type="vpsde", sigma2_0=0.0,
        time_eps=0.01, sample_time_eps=1e-6, sample_mode="discrete",
        train_N=50, sample_N=50)))
    seen_steps = []

    def score_fn(t, x, step):
        seen_steps.append(step)
        std = sde.std(t)[:, None, None]
        return -x, std * x

    out = sample_discrete(sde, score_fn, jax.random.key(0), 4, (2, 3),
                          N=50, predictor="ancestral", time_eps=1e-6)
    assert out.shape == (4, 2, 3)
    assert np.isfinite(np.asarray(out)).all()
    assert len(seen_steps) >= 1  # score_fn was invoked with a step arg


def test_sampler_step_protocol_survives_wrappers():
    """The scan index is an explicit positional argument, so partials and
    *args/**kwargs decorators around score_fn keep the step-indexed fast
    path intact (the old inspect-based detection broke under wrappers)."""
    import functools

    from ldt_tpu.diffusion import DiffusionVPSDE
    from ldt_tpu.diffusion.sampling import sample_discrete
    from ldt_tpu.tools.io import dict2namespace as ns

    N = 20
    sde = DiffusionVPSDE(ns(dict(
        beta_start=0.1, beta_end=20.0, sde_type="vpsde", sigma2_0=0.0,
        time_eps=0.01, sample_time_eps=1e-6, sample_mode="discrete",
        train_N=N, sample_N=N)))
    gains = jnp.linspace(0.5, 1.5, N)  # step-dependent: wrong step => wrong x

    def raw(t, x, step, gain):
        std = sde.std(t)[:, None, None]
        params = gain * gains[step] * std * x
        return -params / std, params

    kw = dict(rng=jax.random.key(7), num_samples=4, shape=(2, 3), N=N,
              predictor="ancestral", time_eps=1e-6)
    direct = sample_discrete(sde, lambda t, x, s: raw(t, x, s, 1.0), **kw)

    partial_fn = functools.partial(raw, gain=1.0)
    via_partial = sample_discrete(sde, partial_fn, **kw)

    def decorate(fn):
        def wrapped(*args, **kwargs):
            return fn(*args, **kwargs)
        return wrapped

    via_decorator = sample_discrete(
        sde, decorate(lambda t, x, s: raw(t, x, s, 1.0)), **kw)

    np.testing.assert_array_equal(np.asarray(direct), np.asarray(via_partial))
    np.testing.assert_array_equal(np.asarray(direct),
                                  np.asarray(via_decorator))
