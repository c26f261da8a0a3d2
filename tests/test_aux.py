"""Tests for auxiliary subsystems: masks, visualization, profiling."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldt_tpu.ops.masks import (
    MaskedBatchNorm,
    check,
    get_mask,
    get_pairwise_distance,
    masked_fill,
    sample_mask,
)
from ldt_tpu.tools.profiling import StepTimer
from ldt_tpu.tools.vis_utils import npy2xml, render_3D


class TestMasks:
    def test_sample_mask_counts(self):
        mask = sample_mask(jax.random.key(0), (4, 10), 16)
        assert mask.shape == (4, 16)
        # exactly 10 present (False) per row
        np.testing.assert_array_equal((~np.asarray(mask)).sum(1), 10)

    def test_get_mask_prefix(self):
        mask = get_mask((2, 3), 5)
        np.testing.assert_array_equal(
            np.asarray(mask),
            [[False, False, False, True, True]] * 2)

    def test_masked_fill(self):
        x = jnp.ones((2, 3, 4))
        mask = jnp.array([[False, True, False], [True, False, False]])
        out = masked_fill(x, mask, 0.0)
        assert float(out[0, 1].sum()) == 0.0
        assert float(out[0, 0].sum()) == 4.0

    def test_check_raises_on_nan(self):
        check(jnp.ones((3,)))
        with pytest.raises(AssertionError):
            check(jnp.array([1.0, jnp.nan]))

    def test_pairwise_distance(self):
        x = jnp.array([[0.0, 0.0], [3.0, 4.0]])
        d = get_pairwise_distance(x)
        assert float(d[0, 1]) == pytest.approx(5.0)

    def test_masked_batchnorm_ignores_padding(self):
        mbn = MaskedBatchNorm(4)
        x = jnp.concatenate([jnp.ones((2, 3, 4)), 100 * jnp.ones((2, 2, 4))],
                            axis=1)
        mask = get_mask((2, 3), 5)  # positions 3,4 are padding
        variables = mbn.init(jax.random.key(0), x, mask, train=True)
        out, updated = mbn.apply(variables, x, mask, train=True,
                                 mutable=["batch_stats"])
        # stats computed over the all-ones region only -> masked result finite
        # and padding slots zeroed
        assert np.asarray(out)[0, 3:].sum() == 0.0
        assert np.isfinite(np.asarray(out)).all()


class TestVis:
    def test_npy2xml_structure(self):
        pts = np.random.RandomState(0).randn(32, 3)
        xml = npy2xml(pts)
        assert xml.count("<shape type=\"sphere\">") == 32
        assert xml.startswith("<scene")
        assert xml.rstrip().endswith("</scene>")

    def test_render_writes_files(self, tmp_path):
        pts = np.random.RandomState(0).randn(2, 64, 3)
        render_3D(str(tmp_path), pts)
        assert os.path.exists(tmp_path / "smp_0.xml")
        assert os.path.exists(tmp_path / "smp_1.xml")


class TestStepTimer:
    def test_rolling_rate(self):
        t = StepTimer(window=4)
        assert t.tick() is None
        import time
        time.sleep(0.01)
        st = t.tick()
        assert st is not None and st > 0
        assert t.rate(64) > 0


class TestConfigLoudness:
    """Unknown registry names must raise, not silently fall back
    (reference tools/utils.py raises on unknown activations)."""

    def test_get_activation_known(self):
        from ldt_tpu.nn.layers import get_activation
        assert get_activation(None)(2.0) == 2.0
        assert float(get_activation("relu")(jnp.asarray(-1.0))) == 0.0

    def test_get_activation_unknown_raises(self):
        from ldt_tpu.nn.layers import get_activation
        with pytest.raises(NotImplementedError):
            get_activation("gelu_typo")

    def test_make_norm_unknown_raises(self):
        from ldt_tpu.nn.layers import make_norm
        with pytest.raises(TypeError):
            make_norm("rms_norm", 16)


class TestBenchSmoke:
    @pytest.mark.slow
    def test_bench_emits_driver_json_line(self):
        """bench.py end-to-end on CPU (tiny shapes via its on_cpu
        defaults): the LAST stdout line must be the driver contract —
        one JSON object with metric/value/unit/vs_baseline."""
        import json
        import subprocess
        import sys

        repo = os.path.join(os.path.dirname(__file__), "..")
        env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu",
                   LDT_BENCH_BATCH="2", LDT_BENCH_STEPS="8",
                   LDT_BENCH_REPS="1", LDT_BENCH_DEVICE_TIMEOUT="60")
        out = subprocess.run([sys.executable, os.path.join(repo, "bench.py")],
                             capture_output=True, text=True, timeout=900,
                             cwd=repo, env=env)
        assert out.returncode == 0, out.stderr[-2000:]
        line = out.stdout.strip().split("\n")[-1]
        rec = json.loads(line)
        assert rec["unit"] == "clouds/min/chip"
        assert rec["value"] > 0
        assert abs(rec["vs_baseline"] - rec["value"] / 300.0) < 1e-6


class TestBenchDeviceWatchdog:
    """bench.py::_require_devices — ok / fast-raise / hang paths."""

    def _load(self):
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "_bench_mod", os.path.join(os.path.dirname(__file__), "..",
                                       "bench.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    def test_ok_path_returns(self):
        mod = self._load()
        mod._require_devices(5.0)  # devices resolve on CPU: no exit

    def test_fast_raise_exits_immediately(self, monkeypatch):
        import time as _time

        import jax

        mod = self._load()

        def boom():
            raise RuntimeError("remote_compile: Broken pipe")

        monkeypatch.setattr(jax, "devices", boom)
        monkeypatch.setattr(os, "_exit",
                            lambda code: (_ for _ in ()).throw(
                                SystemExit(code)))
        t0 = _time.perf_counter()
        with pytest.raises(SystemExit):
            mod._require_devices(30.0)
        # the raise must short-circuit the timeout wait
        assert _time.perf_counter() - t0 < 5.0

    def test_hang_exits_after_timeout(self, monkeypatch):
        import time as _time

        import jax

        mod = self._load()
        monkeypatch.setattr(jax, "devices",
                            lambda: _time.sleep(60))
        monkeypatch.setattr(os, "_exit",
                            lambda code: (_ for _ in ()).throw(
                                SystemExit(code)))
        t0 = _time.perf_counter()
        with pytest.raises(SystemExit):
            mod._require_devices(1.0)
        assert 0.9 < _time.perf_counter() - t0 < 10.0


class TestCompileCache:
    """tools/utils.py::enable_compile_cache — env override, disable,
    respect-prior-setting (the conftest itself sets a cache dir, which is
    exactly the prior-setting case)."""

    def test_respects_prior_setting(self):
        import jax

        from ldt_tpu.tools.utils import enable_compile_cache

        # the test conftest already pointed the cache at /tmp/ldt_jax_cache
        prior = jax.config.jax_compilation_cache_dir
        assert prior
        assert enable_compile_cache() is None
        assert jax.config.jax_compilation_cache_dir == prior

    def test_env_disable_and_override(self, monkeypatch, tmp_path):
        import jax

        from ldt_tpu.tools.utils import enable_compile_cache

        prior = jax.config.jax_compilation_cache_dir
        try:
            jax.config.update("jax_compilation_cache_dir", None)
            monkeypatch.setenv("LDT_COMPILE_CACHE", "0")
            assert enable_compile_cache() is None
            assert not jax.config.jax_compilation_cache_dir

            target = str(tmp_path / "cache")
            monkeypatch.setenv("LDT_COMPILE_CACHE", target)
            assert enable_compile_cache() == target
            assert jax.config.jax_compilation_cache_dir == target
            assert os.path.isdir(target)
        finally:
            jax.config.update("jax_compilation_cache_dir", prior)
