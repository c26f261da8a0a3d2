"""Tests for the generative-metrics stack against numpy oracles.

The oracle implementations mirror the reference's pure-torch/scipy fallbacks
(evaluation/evaluation_metrics.py:16-66), which are its de-facto correctness
references (SURVEY.md §4.4).
"""

import jax
import numpy as np
import pytest

from ldt_tpu.eval import (
    EMD_CD,
    F1Score,
    L2_ChamferEval_1000,
    compute_CD_metrics,
    compute_all_metrics,
    jsd_between_point_cloud_sets,
    knn,
    lgan_mmd_cov,
    pairwise_CD,
)


def np_chamfer_cd(x, y):
    """Oracle: mean_n min_m ||.||^2 + mean_m min_n ||.||^2 per pair."""
    d = ((x[:, None, :] - y[None, :, :]) ** 2).sum(-1)
    return d.min(1).mean() + d.min(0).mean()


@pytest.fixture(scope="module")
def clouds():
    rng = np.random.RandomState(0)
    smp = rng.randn(6, 32, 3).astype(np.float32)
    ref = rng.randn(5, 32, 3).astype(np.float32)
    return smp, ref


class TestPairwise:
    def test_pairwise_cd_matches_oracle(self, clouds):
        smp, ref = clouds
        mat = pairwise_CD(smp, ref, batch_size=2)
        want = np.array([[np_chamfer_cd(s, r) for r in ref] for s in smp])
        np.testing.assert_allclose(mat, want, rtol=1e-4, atol=1e-5)

    def test_pairwise_cd_block_sizes_agree(self, clouds):
        smp, ref = clouds
        a = pairwise_CD(smp, ref, batch_size=1)
        b = pairwise_CD(smp, ref, batch_size=5)
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


class TestKnn:
    def test_hand_computed_case(self):
        # 2 refs, 2 samples. Distances engineered so that each point's nearest
        # neighbor is in its own set -> perfect 1-NNA (acc = 1).
        mxx = np.array([[0.0, 1.0], [1.0, 0.0]])
        myy = np.array([[0.0, 1.0], [1.0, 0.0]])
        mxy = np.full((2, 2), 10.0)
        res = knn(mxx, mxy, myy, k=1)
        assert res["acc"] == 1.0
        assert res["acc_t"] == pytest.approx(1.0)
        assert res["acc_f"] == pytest.approx(1.0)

    def test_fully_confused_case(self):
        # nearest neighbor always in the other set -> acc = 0
        mxx = np.full((2, 2), 10.0)
        myy = np.full((2, 2), 10.0)
        mxy = np.array([[1.0, 2.0], [2.0, 1.0]])
        res = knn(mxx, mxy, myy, k=1)
        assert res["acc"] == 0.0

    def test_emits_schema_keys(self):
        m = np.abs(np.random.RandomState(0).randn(4, 4))
        res = knn(m, m + 1, m, k=1)
        for key in ("acc", "acc_t", "acc_f", "precision", "recall"):
            assert key in res


class TestMmdCov:
    def test_identical_sets(self, clouds):
        smp, _ = clouds
        mat = pairwise_CD(smp, smp, batch_size=3)
        res = lgan_mmd_cov(mat)
        assert res["mmd"] == pytest.approx(0.0, abs=1e-5)
        assert res["cov"] == 1.0
        assert "mmd_smp" in res

    def test_cov_counts_unique_matches(self):
        # both samples closest to ref 0 -> cov = 1/3
        dist = np.array([[0.1, 5.0, 5.0], [0.2, 5.0, 5.0]])
        res = lgan_mmd_cov(dist)
        assert res["cov"] == pytest.approx(1 / 3)
        assert res["mmd"] == pytest.approx((0.1 + 5.0 + 5.0) / 3)
        assert res["mmd_smp"] == pytest.approx((0.1 + 0.2) / 2)


class TestEntryPoints:
    def test_compute_all_metrics_keys(self, clouds):
        smp, ref = clouds
        res = compute_all_metrics(smp[:4], ref[:4], batch_size=2,
                                  verbose=False)
        for key in ("mmd-CD", "cov-CD", "mmd_smp-CD", "mmd-EMD", "cov-EMD",
                    "1-NN-CD-acc", "1-NN-CD-acc_t", "1-NN-CD-acc_f",
                    "1-NN-EMD-acc"):
            assert key in res, key

    def test_compute_cd_metrics_keys(self, clouds):
        smp, ref = clouds
        res = compute_CD_metrics(smp, ref, batch_size=2, verbose=False)
        for key in ("mmd-CD", "cov-CD", "mmd_smp-CD", "1-NN-CD-acc",
                    "1-NN-CD-acc_t", "1-NN-CD-acc_f"):
            assert key in res, key

    def test_distinguishable_sets_have_high_1nna(self):
        rng = np.random.RandomState(1)
        ref = rng.randn(8, 32, 3).astype(np.float32)
        smp = ref + 5.0  # far-away mode
        res = compute_CD_metrics(smp, ref, batch_size=4, verbose=False)
        assert res["1-NN-CD-acc"] == 1.0

    def test_emd_cd_paired(self, clouds):
        smp, _ = clouds
        res = EMD_CD(smp, smp, batch_size=2)
        assert res["mmd-CD"] == pytest.approx(0.0, abs=1e-5)
        assert res["mmd-EMD"] == pytest.approx(0.0, abs=1e-3)


class TestCompletionScores:
    def test_f1_identical(self, clouds):
        smp, _ = clouds
        import jax.numpy as jnp
        f, p1, p2 = F1Score(jnp.asarray(smp), jnp.asarray(smp))
        np.testing.assert_allclose(np.asarray(f), 1.0)

    def test_l2_chamfer_identical_zero(self, clouds):
        smp, _ = clouds
        import jax.numpy as jnp
        v = L2_ChamferEval_1000(jnp.asarray(smp), jnp.asarray(smp))
        # float32 expanded-form cancellation (~1e-7 per sq-dist) is amplified
        # by the x1000 scale; anything below 1e-2 is numerically zero here.
        assert float(v) == pytest.approx(0.0, abs=1e-2)


class TestJSD:
    def test_identical_sets_zero(self):
        rng = np.random.RandomState(0)
        pc = rng.randn(4, 64, 3).astype(np.float32)
        pc /= np.abs(pc).max() * 2.1  # inside unit sphere
        assert jsd_between_point_cloud_sets(pc, pc, resolution=12) == \
            pytest.approx(0.0, abs=1e-9)

    def test_disjoint_sets_positive(self):
        a = np.full((2, 32, 3), -0.4, np.float32)
        b = np.full((2, 32, 3), 0.4, np.float32)
        assert jsd_between_point_cloud_sets(a, b, resolution=12) > 0.5

    def test_occupancy_counts_match_numpy_loop_full_resolution(self):
        """The jitted tiled argmin must reproduce the per-cloud numpy loop
        it replaced (reference evaluation_metrics.py:359-398) at the real
        resolution-28 in-sphere grid, counters AND bernoulli occupancy."""
        from ldt_tpu.eval.metrics import (
            entropy_of_occupancy_grid,
            unit_cube_grid_point_cloud,
        )

        rng = np.random.RandomState(7)
        pc = rng.randn(5, 256, 3).astype(np.float32)
        pc /= np.linalg.norm(pc, axis=-1).max() * 1.05  # inside unit sphere
        ent, counters = entropy_of_occupancy_grid(pc, 28, True)

        grid, _ = unit_cube_grid_point_cloud(28, True)
        grid = grid.reshape(-1, 3)
        want = np.zeros(grid.shape[0])
        for cloud in pc:
            d = ((cloud[:, None, :] - grid[None, :, :]) ** 2).sum(-1)
            np.add.at(want, d.argmin(axis=1), 1)
        np.testing.assert_array_equal(counters, want)
        assert ent > 0


class TestFixedTileShapes:
    """Remainder blocks must NOT change the jitted tile shape: on the TPU
    transport every fresh shape is a multi-minute remote compile
    (VERDICT r1 weak #4). Tiles are padded to one fixed shape."""

    def test_one_compile_for_ragged_matrix(self):
        from ldt_tpu.eval.metrics import (
            _pair_block,
            _pair_block_impl,
            pairwise_CD,
        )

        rng = np.random.RandomState(3)
        smp = rng.randn(9, 16, 3).astype(np.float32)  # 9 = 2*4 + 1 remainder
        ref = rng.randn(7, 16, 3).astype(np.float32)  # 7 = 1*4 + 3 remainder
        before = _pair_block_impl._cache_size()
        m1 = pairwise_CD(smp, ref, batch_size=4, block=4)
        after_first = _pair_block_impl._cache_size()
        m2 = pairwise_CD(smp[:5], ref[:6], batch_size=4, block=4)
        after_second = _pair_block_impl._cache_size()
        assert after_first - before == 1, "ragged tiles caused extra compiles"
        assert after_second == after_first, "second ragged eval recompiled"

        # padding must not change the values: compare vs unblocked oracle
        full = np.asarray(_pair_block(smp, ref))
        np.testing.assert_allclose(m1, full, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(m2, full[:5, :6], rtol=1e-5, atol=1e-5)

    def test_paired_emd_cd_remainder(self):
        from ldt_tpu.eval.metrics import EMD_CD

        rng = np.random.RandomState(4)
        smp = rng.randn(5, 16, 3).astype(np.float32)
        ref = rng.randn(5, 16, 3).astype(np.float32)
        blocked = EMD_CD(smp, ref, batch_size=2, reduced=False)
        whole = EMD_CD(smp, ref, batch_size=5, reduced=False)
        np.testing.assert_allclose(blocked["mmd-CD"], whole["mmd-CD"],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(blocked["mmd-EMD"], whole["mmd-EMD"],
                                   rtol=1e-4, atol=1e-6)

    def test_pairwise_emd_cd_remainder_matches(self):
        from ldt_tpu.eval.metrics import pairwise_EMD_CD

        rng = np.random.RandomState(5)
        smp = rng.randn(5, 16, 3).astype(np.float32)
        ref = rng.randn(3, 16, 3).astype(np.float32)
        cd_a, emd_a = pairwise_EMD_CD(smp, ref, batch_size=2, block=2)
        cd_b, emd_b = pairwise_EMD_CD(smp, ref, batch_size=8, block=8)
        np.testing.assert_allclose(cd_a, cd_b, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(emd_a, emd_b, rtol=1e-4, atol=1e-6)


class TestSymmetricPairwiseCD:
    """`pairwise_CD(..., symmetric=True)` computes only the upper-triangle
    tiles of a self-distance matrix and mirrors (chamfer is symmetric in
    its arguments) — it must equal the full computation for every tiling,
    including uneven/padded tile grids, and leave 1-NNA unchanged."""

    def _pcs(self, n, seed=0):
        rng = np.random.RandomState(seed)
        return rng.randn(n, 16, 3).astype(np.float32)

    @pytest.mark.parametrize("n,bs,block", [(7, 4, None), (8, 2, 3),
                                            (12, 32, None), (5, 2, 2)])
    def test_matches_full_matrix(self, n, bs, block):
        pcs = self._pcs(n)
        full = pairwise_CD(pcs, pcs, batch_size=bs, block=block)
        sym = pairwise_CD(pcs, pcs, batch_size=bs, block=block,
                          symmetric=True)
        np.testing.assert_allclose(sym, full, rtol=1e-5, atol=1e-6)
        # the mirror really is symmetric (the full form is only f32-close)
        np.testing.assert_array_equal(sym, sym.T)

    def test_rejects_distinct_inputs(self):
        # non-square is rejected, but so are two DISTINCT equal-length
        # arrays: the mirror would silently fill CD(ref_i, smp_j) where
        # CD(smp_i, ref_j) belongs (round-5 review finding)
        with pytest.raises(ValueError, match="SAME array"):
            pairwise_CD(self._pcs(4), self._pcs(6, seed=1), batch_size=2,
                        symmetric=True)
        with pytest.raises(ValueError, match="SAME array"):
            pairwise_CD(self._pcs(4), self._pcs(4, seed=1), batch_size=2,
                        symmetric=True)

    def test_symmetric_tiles_stay_square_and_fat(self):
        """At flagship eval shapes (2048-pt clouds, batch_size=64) the VMEM
        budget caps the asymmetric sample-block at 1; the symmetric path
        must pick a ~sqrt(budget) SQUARE side instead of min(sb, rb)=1 —
        1x1 tiles are ~33k synchronous tunnel roundtrips for an n=256
        self-matrix (round-5 review finding)."""
        from ldt_tpu.eval.metrics import _tile_shape

        sb, rb = _tile_shape(256, 256, 64, None, 2048, 2048, symmetric=True)
        assert sb == rb, "symmetric tiles must be square"
        assert sb >= 8, f"degenerate symmetric tile side {sb}"
        # and the budget is still honored: side^2 pairs fit the tile cap
        from ldt_tpu.eval.metrics import _PAIR_TILE_BYTES

        assert sb * sb * 2048 * 2048 * 4 <= _PAIR_TILE_BYTES

    def test_compute_cd_metrics_unchanged(self):
        from ldt_tpu.eval.metrics import compute_CD_metrics

        smp, ref = self._pcs(6, seed=2), self._pcs(6, seed=3)
        got = compute_CD_metrics(smp, ref, batch_size=4, verbose=False)
        # reconstruct 1-NNA from fully-computed matrices
        m_rs = pairwise_CD(ref, smp, batch_size=4)
        m_rr = pairwise_CD(ref, ref, batch_size=4)
        m_ss = pairwise_CD(smp, smp, batch_size=4)
        want = knn(m_rr, m_rs, m_ss, 1, sqrt=False)
        for k, v in want.items():
            if "acc" in k:
                np.testing.assert_allclose(got[f"1-NN-CD-{k}"], v,
                                           rtol=1e-6, err_msg=k)
