"""ApproxMatch EMD sanity vs the exact Hungarian assignment.

The reference's scipy fallback (evaluation_metrics.py:47-66) computes the
EXACT optimal assignment; its CUDA approxmatch (and ours) is an annealed
approximation. The approximate transport cost can never beat the optimum and
should stay close to it.
"""

import numpy as np
import pytest

scipy_opt = pytest.importorskip("scipy.optimize")

import jax.numpy as jnp  # noqa: E402

from ldt_tpu.ops.emd import emd_approx  # noqa: E402


def exact_emd(x, y):
    """Mean euclidean cost of the optimal assignment (the reference scipy
    fallback's math, evaluation_metrics.py:50-63)."""
    d = np.sqrt(((x[:, None, :] - y[None, :, :]) ** 2).sum(-1))
    r, c = scipy_opt.linear_sum_assignment(d)
    return d[r, c].mean()


def test_approx_match_bounded_by_exact():
    rng = np.random.RandomState(0)
    x = (rng.randn(4, 48, 3) * 0.3).astype(np.float32)
    y = (rng.randn(4, 48, 3) * 0.3).astype(np.float32)
    approx = np.asarray(emd_approx(jnp.asarray(x), jnp.asarray(y)))
    exact = np.array([exact_emd(a, b) for a, b in zip(x, y)])
    # approximate cost >= optimal (up to float noise); the annealed scheme
    # lands ~20% above optimal on unstructured random clouds (same ballpark
    # as the CUDA original) — assert it stays within 35%
    assert (approx >= exact - 1e-4).all(), (approx, exact)
    assert (approx <= exact * 1.35).all(), (approx, exact)


def test_approx_match_zero_for_identical():
    rng = np.random.RandomState(1)
    x = (rng.randn(2, 32, 3) * 0.3).astype(np.float32)
    out = np.asarray(emd_approx(jnp.asarray(x), jnp.asarray(x)))
    np.testing.assert_allclose(out, 0.0, atol=1e-3)
