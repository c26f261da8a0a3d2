"""Channel-agnostic chamfer (2D/5D variants) + small loss utilities.

The reference ships separate chamfer2D/3D/5D CUDA builds
(evaluation/ChamferDistancePytorch/) and asserts them equal to the pure
python oracle (unit_test.py:14-34); our XLA chamfer is dimension-agnostic so
one implementation covers all three.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ldt_tpu.eval.loss import fscore, huber_loss, kl_softmax_loss
from ldt_tpu.ops.chamfer import chamfer_distance


def np_chamfer(x, y):
    d = ((x[:, :, None, :] - y[:, None, :, :]) ** 2).sum(-1)
    return d.min(2), d.min(1), d.argmin(2), d.argmin(1)


@pytest.mark.parametrize("dim", [2, 3, 5])
def test_chamfer_any_dim_matches_oracle(dim):
    rng = np.random.RandomState(0)
    x = rng.randn(3, 40, dim).astype(np.float32)
    y = rng.randn(3, 56, dim).astype(np.float32)
    d1, d2, i1, i2 = chamfer_distance(jnp.asarray(x), jnp.asarray(y))
    w1, w2, j1, j2 = np_chamfer(x, y)
    np.testing.assert_allclose(np.asarray(d1), w1, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d2), w2, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i1), j1)
    np.testing.assert_array_equal(np.asarray(i2), j2)


def test_fscore_from_distances():
    d1 = jnp.array([[0.0001, 0.01], [0.0001, 0.0001]])
    d2 = jnp.array([[0.0001, 0.0001], [0.01, 0.01]])
    f, p1, p2 = fscore(d1, d2, threshold=0.001)
    np.testing.assert_allclose(np.asarray(p1), [0.5, 1.0])
    np.testing.assert_allclose(np.asarray(p2), [1.0, 0.0])
    np.testing.assert_allclose(np.asarray(f), [2 * 0.5 / 1.5, 0.0])


def test_huber_loss_quadratic_and_linear():
    small = jnp.array([0.5])
    assert float(huber_loss(small, 1.0)) == pytest.approx(0.125)
    big = jnp.array([3.0])
    # 0.5*delta^2 + delta*(|e|-delta) = 0.5 + 2
    assert float(huber_loss(big, 1.0)) == pytest.approx(2.5)


def test_kl_softmax_loss_zero_for_identical():
    x = jnp.asarray(np.random.RandomState(0).randn(4, 8).astype(np.float32))
    assert float(kl_softmax_loss(x, x)) == pytest.approx(0.0, abs=1e-6)
    y = x + 1.5 * jnp.asarray(
        np.random.RandomState(1).randn(4, 8).astype(np.float32))
    assert float(kl_softmax_loss(x, y)) > 0.0
