"""int8 serving path (ldt_tpu/serving/int8.py): quantization correctness
and the quantized denoise step vs the bf16 `denoise_with_mods` twin."""

import jax
import jax.numpy as jnp
import numpy as np

from ldt_tpu.serving.int8 import (
    denoise_cond_int8,
    denoise_with_mods_int8,
    int8_matmul,
    precompute_cond_kv,
    quantize_cond_score_params,
    quantize_score_params,
    quantize_weight,
)
from ldt_tpu.tools.io import dict2namespace


class TestQuantPrimitives:
    def test_weight_roundtrip_error_bound(self):
        rng = np.random.RandomState(0)
        w = rng.randn(64, 96).astype(np.float32)
        w_i8, s = quantize_weight(jnp.asarray(w))
        deq = np.asarray(w_i8, np.float32) * np.asarray(s)
        # symmetric per-channel: error <= half a quantization step
        step = np.asarray(s)
        assert np.all(np.abs(deq - w) <= step * 0.5 + 1e-7)

    def test_int8_matmul_close_to_float(self):
        rng = np.random.RandomState(1)
        x = rng.randn(8, 64).astype(np.float32)
        w = rng.randn(64, 32).astype(np.float32)
        w_i8, s = quantize_weight(jnp.asarray(w))
        got = np.asarray(int8_matmul(jnp.asarray(x), w_i8, s,
                                     out_dtype=jnp.float32))
        want = x @ w
        # W8A8 relative error on gaussian data is well under 1.5%
        denom = np.abs(want).mean()
        assert np.abs(got - want).mean() / denom < 0.015

    def test_int8_matmul_scale_invariance(self):
        """Per-row activation scales: scaling one row must not affect the
        quantization of others."""
        rng = np.random.RandomState(2)
        x = rng.randn(4, 32).astype(np.float32)
        w = rng.randn(32, 16).astype(np.float32)
        w_i8, s = quantize_weight(jnp.asarray(w))
        base = np.asarray(int8_matmul(jnp.asarray(x), w_i8, s,
                                      out_dtype=jnp.float32))
        x2 = x.copy()
        x2[0] *= 1000.0
        out2 = np.asarray(int8_matmul(jnp.asarray(x2), w_i8, s,
                                      out_dtype=jnp.float32))
        np.testing.assert_allclose(out2[1:], base[1:], rtol=1e-6)
        np.testing.assert_allclose(out2[0], base[0] * 1000.0, rtol=0.02,
                                   atol=1e-3)


class TestDenoiseInt8:
    def _score(self):
        from ldt_tpu.models import Score

        cfg = dict2namespace(dict(
            num_steps=8, z_dim=16, z_scale=8, hidden_size=64, num_heads=4,
            num_blocks=3, num_categorys=1, t_dim=32, dropout=0.0,
            norm="layer_norm", learn_sigma=False, act="swish", unet=False,
            AdaLN=True, condition=False))
        model = Score(cfg)
        z = jnp.zeros((2, 8, 16))
        variables = jax.jit(model.init)(jax.random.key(0), z, jnp.ones((2,)))
        return cfg, model, variables["params"]

    def test_matches_bf16_fast_path(self):
        from ldt_tpu.models.score import Score as ScoreCls

        cfg, model, params = self._score()
        schedule = jnp.linspace(1.0, 1e-6, 4)
        mods = model.apply({"params": params}, schedule,
                           method=ScoreCls.precompute_mods)
        step_mods = jax.tree_util.tree_map(lambda m: m[1], mods)
        x = jax.random.normal(jax.random.key(3), (2, 8, 16))
        want = np.asarray(model.apply({"params": params}, x, step_mods,
                                      method=ScoreCls.denoise_with_mods),
                          np.float32)
        q = quantize_score_params(params, cfg.num_blocks)
        got = np.asarray(denoise_with_mods_int8(
            x, step_mods, q, cfg.num_heads, interpret=True), np.float32)
        # int8 GEMMs + bf16 carry: agreement to a few percent relative to
        # the output scale (the golden-eval gate judges METRIC deltas, this
        # test pins the math/wiring)
        denom = np.abs(want).mean()
        assert np.abs(got - want).mean() / denom < 0.05, (
            np.abs(got - want).mean(), denom)

    def test_bf16_tail_mixed_scheme(self):
        """LDT_INT8_BF16_TAIL mixed scheme: exactly the last k blocks carry
        bf16 passthrough kernels (scale=None), the twin runs with any tail,
        and the tail actually changes the computed path. (On a tiny random
        3-block model the bf16-CARRY error dominates quantization error, so
        error ordering is noise here — the n=256 TPU golden gate judges
        whether the tail rescues DDIM-50 on a real checkpoint.)"""
        from ldt_tpu.models.score import Score as ScoreCls

        cfg, model, params = self._score()
        schedule = jnp.linspace(1.0, 1e-6, 4)
        mods = model.apply({"params": params}, schedule,
                           method=ScoreCls.precompute_mods)
        step_mods = jax.tree_util.tree_map(lambda m: m[1], mods)
        x = jax.random.normal(jax.random.key(5), (2, 8, 16))
        want = np.asarray(model.apply({"params": params}, x, step_mods,
                                      method=ScoreCls.denoise_with_mods),
                          np.float32)

        outs = {}
        for tail in (0, 2, cfg.num_blocks):
            q = quantize_score_params(params, cfg.num_blocks,
                                      bf16_tail=tail)
            for i, blk in enumerate(q["blocks"]):
                keep = i >= cfg.num_blocks - tail
                assert (blk["qkv_s"] is None) == keep, (tail, i)
                assert (blk["up_s"] is None) == keep
                assert blk["qkv_w"].dtype == (
                    jnp.bfloat16 if keep else jnp.int8)
            outs[tail] = np.asarray(denoise_with_mods_int8(
                x, step_mods, q, cfg.num_heads, interpret=True), np.float32)
            # every variant stays within a few percent of the bf16 model
            err = np.abs(outs[tail] - want).mean()
            assert err < 0.05 * np.abs(want).mean(), (tail, err)
        # the tail actually changes the computation
        assert np.abs(outs[0] - outs[cfg.num_blocks]).max() > 0

    def test_cond_matches_bf16_forward(self):
        """Conditional twin vs the full `Score.__call__` with a {'img','pts'}
        condition: even blocks cross-attend to the cached condition KV, odd
        blocks run the packed qkv path, AdaLN mods come from the stacked
        per-step GEMM."""
        from ldt_tpu.models import Score
        from ldt_tpu.models.score import Score as ScoreCls

        cfg = dict2namespace(dict(
            num_steps=8, z_dim=16, z_scale=8, hidden_size=64, num_heads=4,
            num_blocks=3, num_categorys=1, t_dim=32, dropout=0.0,
            norm="layer_norm", learn_sigma=False, act="swish", unet=False,
            AdaLN=True, condition=True))
        model = Score(cfg)
        z = jnp.zeros((2, 8, 16))
        t = jnp.full((2,), 0.37)
        condition = {
            "img": jax.random.normal(jax.random.key(1), (2, 32, 32, 3)),
            "pts": jax.random.normal(jax.random.key(2), (2, 64, 3)),
        }
        variables = jax.jit(model.init)(jax.random.key(0), z, t, None,
                                        condition)
        x = jax.random.normal(jax.random.key(3), (2, 8, 16))
        want = np.asarray(
            model.apply(variables, x, t, None, condition, train=False),
            np.float32)

        cond_enc = model.apply(variables, condition,
                               method=ScoreCls.encode_condition)
        assert cond_enc[0] is not None
        t_embs = model.apply(variables, t[:1], method=ScoreCls.embed_times)
        qp = quantize_cond_score_params(variables["params"], cfg.num_blocks)
        kv_cache = precompute_cond_kv(qp, cond_enc[0])
        assert kv_cache[0] is not None and kv_cache[1] is None
        got = np.asarray(denoise_cond_int8(
            x, t_embs[0], cond_enc[1], kv_cache, qp, cfg.num_heads,
            interpret=True), np.float32)
        denom = np.abs(want).mean()
        assert np.abs(got - want).mean() / denom < 0.05, (
            np.abs(got - want).mean(), denom)

    def test_quantized_tree_shapes(self):
        cfg, model, params = self._score()
        q = quantize_score_params(params, cfg.num_blocks)
        assert len(q["blocks"]) == cfg.num_blocks
        blk = q["blocks"][0]
        assert blk["qkv_w"].dtype == jnp.int8
        assert blk["qkv_w"].shape == (64, 3 * 64)
        assert blk["qkv_s"].shape == (3 * 64,)
        assert blk["up_w"].shape == (64, 256)
        assert blk["dn_w"].shape == (256, 64)


class TestStaticActScales:
    """STATIC per-step activation scales (LDT_INT8_STATIC scheme):
    `int8_matmul(x_scale=...)`, the calibration recording hook, the
    calibration scan's trajectory parity with `sample_discrete`, and the
    serving fallback when calibration is absent."""

    def test_static_matmul_close_to_float(self):
        rng = np.random.RandomState(3)
        x = rng.randn(8, 64).astype(np.float32)
        w = rng.randn(64, 32).astype(np.float32)
        w_i8, s = quantize_weight(jnp.asarray(w))
        x_scale = jnp.asarray(np.abs(x).max() / 127.0)
        got = np.asarray(int8_matmul(jnp.asarray(x), w_i8, s,
                                     out_dtype=jnp.float32,
                                     x_scale=x_scale))
        want = x @ w
        denom = np.abs(want).mean()
        # per-tensor static is coarser than per-token dynamic but must stay
        # a faithful W8A8 GEMM on gaussian data
        assert np.abs(got - want).mean() / denom < 0.02

    def test_record_collects_per_site_amax(self):
        rng = np.random.RandomState(4)
        x = rng.randn(4, 32).astype(np.float32)
        w = rng.randn(32, 16).astype(np.float32)
        w_i8, s = quantize_weight(jnp.asarray(w))
        rec = []
        int8_matmul(jnp.asarray(x), w_i8, s, record=rec)
        # bf16 passthrough sites keep alignment with a zero entry
        int8_matmul(jnp.asarray(x, jnp.bfloat16),
                    jnp.asarray(w, jnp.bfloat16), None, record=rec)
        assert len(rec) == 2
        np.testing.assert_allclose(float(rec[0]), np.abs(x).max(),
                                   rtol=1e-2)
        assert float(rec[1]) == 0.0

    def test_denoise_static_close_to_dynamic(self):
        """Scales recorded from the SAME input reproduce the dynamic twin
        closely (the remaining gap is per-token vs per-tensor granularity,
        bounded well under the bf16-model agreement bound)."""
        from ldt_tpu.models.score import Score as ScoreCls

        td = TestDenoiseInt8()
        cfg, model, params = td._score()
        schedule = jnp.linspace(1.0, 1e-6, 4)
        mods = model.apply({"params": params}, schedule,
                           method=ScoreCls.precompute_mods)
        step_mods = jax.tree_util.tree_map(lambda m: m[1], mods)
        x = jax.random.normal(jax.random.key(9), (2, 8, 16))
        q = quantize_score_params(params, cfg.num_blocks)
        rec = []
        dyn = np.asarray(denoise_with_mods_int8(
            x, step_mods, q, cfg.num_heads, interpret=True, record=rec),
            np.float32)
        assert len(rec) == cfg.num_blocks * 4
        act_scales = jnp.maximum(
            jnp.stack(rec).reshape(cfg.num_blocks, 4), 1e-12) / 127.0
        static = np.asarray(denoise_with_mods_int8(
            x, step_mods, q, cfg.num_heads, interpret=True,
            act_scales=act_scales), np.float32)
        denom = np.abs(dyn).mean()
        assert np.abs(static - dyn).mean() / denom < 0.05, (
            np.abs(static - dyn).mean(), denom)
        # and the static path genuinely differs (it quantized differently)
        assert np.abs(static - dyn).max() > 0

    def test_calibration_scan_matches_sample_discrete(self):
        """`calibrate_act_scales` mirrors sample_discrete's rng pattern and
        ancestral predictor — its returned trajectory must match a real
        `sample_discrete` run with the SAME dynamic-int8 score_fn (guards
        the mirrored predictor against drift in sampling.py)."""
        from ldt_tpu.diffusion import make_diffusion
        from ldt_tpu.diffusion.sampling import sample_discrete
        from ldt_tpu.models.score import Score as ScoreCls
        from ldt_tpu.serving.int8 import calibrate_act_scales

        td = TestDenoiseInt8()
        cfg, model, params = td._score()
        # beta_end/N must stay < 1 or the discrete ancestral beta table
        # goes NaN (sqrt(1-beta)) — the documented tiny-config trap
        N = 6
        sde = make_diffusion(dict2namespace(dict(
            beta_start=0.1, beta_end=3.0, sde_type="vpsde", sigma2_0=0.0,
            time_eps=0.01, sample_time_eps=1e-6, sample_mode="discrete",
            train_N=N, sample_N=N)))
        schedule = jnp.linspace(1.0, 1e-6, N)
        mods = model.apply({"params": params}, schedule,
                           method=ScoreCls.precompute_mods)
        q = quantize_score_params(params, cfg.num_blocks)

        def score_fn(t, x, step):
            step_mods = jax.tree_util.tree_map(lambda m: m[step], mods)
            p = denoise_with_mods_int8(x, step_mods, q, cfg.num_heads,
                                       interpret=True)
            std = sde.std(t)[:, None, None]
            return -p.astype(jnp.float32) / std, p

        rng = jax.random.key(42)
        want = np.asarray(sample_discrete(
            sde, score_fn, rng, 2, (cfg.z_scale, cfg.z_dim), N=N,
            predictor="ancestral", time_eps=1e-6, denoise=True))
        scales, x_mean = calibrate_act_scales(
            sde, mods, q, cfg.num_heads, rng, 2,
            (cfg.z_scale, cfg.z_dim), N, time_eps=1e-6, interpret=True)
        np.testing.assert_allclose(np.asarray(x_mean), want, rtol=1e-5,
                                   atol=1e-6)
        assert scales.shape == (N, cfg.num_blocks, 4)
        assert np.all(np.asarray(scales) > 0)

    def test_load_act_scales_refuses_loudly(self, tmp_path, monkeypatch):
        """LDT_INT8_STATIC is an explicit opt-in: any provenance problem
        must RAISE, never silently serve dynamic quantization (a silent
        fallback mislabels gate runs and bench A/Bs as 'static')."""
        import pytest

        from ldt_tpu.serving.int8 import (load_act_scales,
                                          save_act_scales)

        monkeypatch.delenv("LDT_INT8_STATIC_FILE", raising=False)
        monkeypatch.delenv("LDT_INT8_BF16_TAIL", raising=False)
        ckpt = str(tmp_path / "checkpt_4.msgpack")
        open(ckpt, "wb").write(b"real-checkpoint-bytes")
        # no restored checkpoint / no file -> refuse
        with pytest.raises(RuntimeError, match="int8-static"):
            load_act_scales(None, 8, 3)
        with pytest.raises(RuntimeError, match="no calibration file"):
            load_act_scales(ckpt, 8, 3)
        # wrong shape -> refuse; proper save -> loads
        save_act_scales(ckpt, np.ones((4, 3, 4), np.float32))
        with pytest.raises(RuntimeError, match="shape"):
            load_act_scales(ckpt, 8, 3)
        save_act_scales(ckpt, np.ones((8, 3, 4), np.float32))
        got = load_act_scales(ckpt, 8, 3)
        assert got is not None and got.shape == (8, 3, 4)
        # checkpoint retrained after calibration -> fingerprint refuses
        with open(ckpt, "ab") as f:
            f.write(b"drift")
        with pytest.raises(RuntimeError, match="not bound to this"):
            load_act_scales(ckpt, 8, 3)
        # legacy tables without a recorded fingerprint are refused too
        np.savez(str(tmp_path / "checkpt_4.msgpack.int8_act_scales.npz"),
                 scales=np.ones((8, 3, 4), np.float32))
        with pytest.raises(RuntimeError, match="not bound to this"):
            load_act_scales(ckpt, 8, 3)
        # bf16_tail scheme crossed between calibration and serving ->
        # refuse (tail passthrough sites record amax 0; serving them
        # quantized with scale ~1e-14 would clip everything to garbage)
        save_act_scales(ckpt, np.ones((8, 3, 4), np.float32))
        monkeypatch.setenv("LDT_INT8_BF16_TAIL", "2")
        with pytest.raises(RuntimeError, match="bf16_tail"):
            load_act_scales(ckpt, 8, 3)
        monkeypatch.delenv("LDT_INT8_BF16_TAIL", raising=False)
        # predictor mismatch vs the running config -> refuse
        ddim_cfg = dict2namespace(dict(sde=dict(
            predictor="ddim", corrector=None)))
        with pytest.raises(RuntimeError, match="ancestral-only"):
            load_act_scales(ckpt, 8, 3, ddim_cfg)
        ok_cfg = dict2namespace(dict(sde=dict(
            predictor="ancestral", corrector=None)))
        assert load_act_scales(ckpt, 8, 3, ok_cfg) is not None
        corr_cfg = dict2namespace(dict(sde=dict(
            predictor="ancestral", corrector="langevin")))
        with pytest.raises(RuntimeError, match="corrector"):
            load_act_scales(ckpt, 8, 3, corr_cfg)
        # LDT_INT8_STATIC_FILE override wins (and skips the fingerprint
        # binding — the file is explicitly chosen)
        other = str(tmp_path / "other.npz")
        np.savez(other, scales=np.full((8, 3, 4), 2.0, np.float32))
        monkeypatch.setenv("LDT_INT8_STATIC_FILE", other)
        got = load_act_scales(ckpt, 8, 3)
        assert float(np.asarray(got)[0, 0, 0]) == 2.0
