"""int8 serving path for the latent DiT sampler (W8A8 dynamic).

The flagship sampler is compute-bound on its bf16 GEMMs at >92% MFU
(docs/sampler_profile.md); the only way past that roofline without changing
the architecture is a lower-precision MXU path — v5e executes int8 x int8
matmuls at 2x the bf16 rate. This module provides a quantized twin of the
sampler's hot path (`Score.denoise_with_mods`, the precomputed-modulation
fast path used by the 1000-step reverse-diffusion scan):

  * weights: per-output-channel symmetric int8, quantized ONCE per sampling
    run (outside the scan) from the trained bf16/f32 params;
  * activations: dynamic per-token symmetric int8 (amax over the feature
    axis), quantized inline — XLA fuses the quantize chain into the
    preceding elementwise ops;
  * accumulation in int32, dequantize = acc * s_act[m] * s_w[n];
  * the attention core, softmax, LayerNorms, AdaLN modulations, residuals
    and the tiny in/out projections (120-dim) stay bf16 — they carry <2% of
    step FLOPs and the softmax/LN numerics matter.

This changes the sampler's numerics, so it is gated by a golden-eval run
(scripts/int8_golden_gate.py): metric deltas vs the bf16 sampler must stay
within 1% before it is enabled for a config. The TRAINER's valsample path
ships OFF by default (enable with LDT_SERVE_INT8=1 after gating your
checkpoint); bench.py defaults it ON for the headline throughput number
because the gate PASSED on the flagship architecture (<=0.36% CD deltas,
docs/sampler_profile.md) — LDT_BENCH_INT8=0 gives the bf16-exact rate.

Matches the math of `Score.denoise_with_mods` + `ResidualBlock.__call__`
(AdaLN path) + `MLP` (gelu) + `FinalLayer` — reference
model/scorenet/score.py:117-151 and model/layers.py:202-248.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ldt_tpu.nn.layers import modulate as _modulate


def quantize_weight(w: jax.Array):
    """[K, N] float -> (int8 [K, N], f32 scale [N]) per-output-channel."""
    w = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=0)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    w_i8 = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return w_i8, scale


def int8_matmul(x: jax.Array, w_i8: jax.Array, w_scale: jax.Array,
                out_dtype=jnp.bfloat16, x_scale=None,
                record=None) -> jax.Array:
    """x [..., K] @ int8 weight with dynamic per-row activation quant.

    `w_scale=None` means the weight is a bf16 PASSTHROUGH (a block kept
    un-quantized by the `bf16_tail` mixed scheme below) — plain matmul.

    `x_scale` (STATIC scheme, LDT_INT8_STATIC): a precomputed scalar
    activation scale for this site/step (from `calibrate_act_scales`).
    Replaces the per-token amax reduce + its data-dependent quantize chain
    with a scalar multiply the compiler can fuse straight into the
    activation's producer — the dynamic scheme's reduce_max (0.18 ms) and
    part of its cast traffic (0.50 ms) are the only non-GEMM, non-attention
    costs left in the flagship int8 step (docs/sampler_profile.md).
    Coarser than per-token quantization — gate before serving.

    `record`: a Python list; when given, the pre-quantization activation
    amax (one f32 scalar) is appended per call — the calibration hook.

    Fusion note (profiled on v5e): computing the row amax from an f32
    upcast of x gives the upcast TWO consumers (the reduce and the divide),
    which XLA materializes as an f32 copy of the whole activation — ~0.5 ms
    of convert_element_type per flagship step. abs/max are EXACT in bf16,
    so the amax reduce runs on x directly and the f32 quantize chain
    (convert / div / round / clip / int8) stays single-consumer — one
    fusion, no f32 temp.
    """
    if w_scale is None:
        if record is not None:
            record.append(jnp.zeros((), jnp.float32))  # site alignment
        return jnp.asarray(x @ w_i8, out_dtype)
    if record is not None:
        record.append(jnp.max(jnp.abs(x)).astype(jnp.float32))
    if x_scale is None:
        amax = jnp.max(jnp.abs(x), axis=-1,
                       keepdims=True).astype(jnp.float32)
        s_x = jnp.maximum(amax, 1e-12) / 127.0
    else:
        s_x = jnp.asarray(x_scale, jnp.float32)
    x_i8 = jnp.clip(jnp.round(x.astype(jnp.float32) / s_x),
                    -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_i8, w_i8, (((x_i8.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * s_x * w_scale).astype(out_dtype)


def quantize_score_params(params: Dict[str, Any], num_blocks: int,
                          bf16_tail: Optional[int] = None) -> Dict[str, Any]:
    """Quantize the big per-block GEMM weights of a (non-UNet) Score net.

    Returns {'blocks': [per-block dict], 'ln_in': ..., 'ln_out': ...} with
    int8 kernels + f32 scales for qkv (packed), fc_o, mlp up/down; biases
    and the tiny in/out projections stay float (cast to bf16).

    `bf16_tail` (default from LDT_INT8_BF16_TAIL, 0): keep the LAST k
    blocks un-quantized (bf16 kernels, scale=None passthrough). Mixed
    scheme for few-step sampling where per-step quantization error doesn't
    average out (the DDIM-50 cov-CD refutation, docs/sampler_profile.md) —
    the late blocks sit closest to the output and dominate the error.
    """
    if bf16_tail is None:
        bf16_tail = int(os.environ.get("LDT_INT8_BF16_TAIL", "0"))

    def bf16(x):
        return jnp.asarray(x, jnp.bfloat16)

    blocks = []
    for i in range(num_blocks):
        blk = params[f"transformer_{i}"]
        attn = blk["attn"]
        keep_bf16 = i >= num_blocks - bf16_tail

        def qw(w):
            if keep_bf16:
                return bf16(w), None
            return quantize_weight(w)

        w_qkv = jnp.concatenate(
            [jnp.asarray(attn["fc_q"]["kernel"], jnp.float32),
             jnp.asarray(attn["fc_kv"]["kernel"], jnp.float32)], axis=1)
        b_qkv = jnp.concatenate(
            [jnp.asarray(attn["fc_q"]["bias"]),
             jnp.asarray(attn["fc_kv"]["bias"])])
        qkv_i8, qkv_s = qw(w_qkv)
        o_i8, o_s = qw(attn["fc_o"]["kernel"])
        up_i8, up_s = qw(blk["mlp"]["Dense_0"]["kernel"])
        dn_i8, dn_s = qw(blk["mlp"]["Dense_1"]["kernel"])
        blocks.append({
            "qkv_w": qkv_i8, "qkv_s": qkv_s, "qkv_b": bf16(b_qkv),
            "o_w": o_i8, "o_s": o_s, "o_b": bf16(attn["fc_o"]["bias"]),
            "up_w": up_i8, "up_s": up_s,
            "up_b": bf16(blk["mlp"]["Dense_0"]["bias"]),
            "dn_w": dn_i8, "dn_s": dn_s,
            "dn_b": bf16(blk["mlp"]["Dense_1"]["bias"]),
        })
    return {
        "blocks": blocks,
        "ln_in_w": bf16(params["ln_in"]["kernel"]),
        "ln_in_b": bf16(params["ln_in"]["bias"]),
        "ln_out_w": bf16(params["ln_out"]["ln"]["kernel"]),
        "ln_out_b": bf16(params["ln_out"]["ln"]["bias"]),
    }


def quantize_cond_score_params(params: Dict[str, Any],
                               num_blocks: int) -> Dict[str, Any]:
    """Quantize a CONDITIONAL (non-UNet) Score net for int8 serving.

    Differences from `quantize_score_params` (the unconditional fast path):

      * EVEN blocks cross-attend to the condition tokens
        (score.py:148-149 / our models/score.py::Score.__call__), so their
        fc_q (int8, per-step input) and fc_kv (kept bf16 — applied ONCE per
        sampling run to the static condition tokens, see
        `precompute_cond_kv`) stay separate; ODD blocks self-attend and get
        the packed int8 qkv GEMM.
      * The per-block AdaLN kernels are STACKED into one [t_dim,
        num_blocks*6*hidden] bf16 GEMM: c = t_emb + img_emb is per-sample,
        so modulations must be computed inside the scan — one wide matmul
        per step instead of 24 thin ones. They carry ~1.6% of step FLOPs,
        so they stay bf16 (no numerics risk for the gates/shifts).
    """
    def bf16(x):
        return jnp.asarray(x, jnp.bfloat16)

    blocks, ada_w, ada_b = [], [], []
    for i in range(num_blocks):
        blk = params[f"transformer_{i}"]
        attn = blk["attn"]
        entry = {}
        if i % 2 == 0:  # cross-attention to the condition tokens
            q_i8, q_s = quantize_weight(attn["fc_q"]["kernel"])
            entry.update({
                "q_w": q_i8, "q_s": q_s, "q_b": bf16(attn["fc_q"]["bias"]),
                "kv_w": bf16(attn["fc_kv"]["kernel"]),
                "kv_b": bf16(attn["fc_kv"]["bias"]),
            })
        else:  # self-attention: packed qkv
            w_qkv = jnp.concatenate(
                [jnp.asarray(attn["fc_q"]["kernel"], jnp.float32),
                 jnp.asarray(attn["fc_kv"]["kernel"], jnp.float32)], axis=1)
            b_qkv = jnp.concatenate(
                [jnp.asarray(attn["fc_q"]["bias"]),
                 jnp.asarray(attn["fc_kv"]["bias"])])
            qkv_i8, qkv_s = quantize_weight(w_qkv)
            entry.update({"qkv_w": qkv_i8, "qkv_s": qkv_s,
                          "qkv_b": bf16(b_qkv)})
        o_i8, o_s = quantize_weight(attn["fc_o"]["kernel"])
        up_i8, up_s = quantize_weight(blk["mlp"]["Dense_0"]["kernel"])
        dn_i8, dn_s = quantize_weight(blk["mlp"]["Dense_1"]["kernel"])
        entry.update({
            "o_w": o_i8, "o_s": o_s, "o_b": bf16(attn["fc_o"]["bias"]),
            "up_w": up_i8, "up_s": up_s,
            "up_b": bf16(blk["mlp"]["Dense_0"]["bias"]),
            "dn_w": dn_i8, "dn_s": dn_s,
            "dn_b": bf16(blk["mlp"]["Dense_1"]["bias"]),
        })
        blocks.append(entry)
        ada_w.append(bf16(blk["adaLN"]["kernel"]))
        ada_b.append(bf16(blk["adaLN"]["bias"]))
    return {
        "blocks": blocks,
        "ada_w": jnp.concatenate(ada_w, axis=1),
        "ada_b": jnp.concatenate(ada_b),
        "fin_w": bf16(params["ln_out"]["adaLN"]["kernel"]),
        "fin_b": bf16(params["ln_out"]["adaLN"]["bias"]),
        "ln_in_w": bf16(params["ln_in"]["kernel"]),
        "ln_in_b": bf16(params["ln_in"]["bias"]),
        "ln_out_w": bf16(params["ln_out"]["ln"]["kernel"]),
        "ln_out_b": bf16(params["ln_out"]["ln"]["bias"]),
    }


def precompute_cond_kv(q: Dict[str, Any], y: jax.Array):
    """KV projections of the STATIC condition tokens, once per sampling run.

    y [B, M, hidden] from `Score.encode_condition` is fixed across all
    denoise steps (the reference encodes once per run,
    completion_trainer/Latent_SDE_Trainer.py:150-151), so the even blocks'
    fc_kv GEMMs leave the scan entirely — full bf16 precision for free.
    Returns a list over blocks: [B, M, 2*hidden] for cross blocks, None for
    self-attention blocks.
    """
    y = y.astype(jnp.bfloat16)
    return [(y @ blk["kv_w"]) + blk["kv_b"] if "kv_w" in blk else None
            for blk in q["blocks"]]


def _ln(x: jax.Array) -> jax.Array:
    """Non-affine LayerNorm, epsilon matching nn.LayerNorm(1e-6)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + 1e-6)).astype(x.dtype)


def _block_int8(h: jax.Array, m: jax.Array, blk: Dict[str, Any],
                attention_fn, scales=None, record=None) -> jax.Array:
    """One DiT block of the int8 twins — shared by the unconditional and
    conditional paths so a numerics fix lands in both at once.

    modulate -> attention (via `attention_fn(q_in)`, the only part that
    differs between self- and cross-attention blocks) -> int8 fc_o ->
    gated residual -> modulate -> int8 MLP (gelu) -> gated residual.

    `scales`: this block's [4] static activation scales (site order
    qkv/o/up/dn — qkv is consumed inside `attention_fn`, which the caller
    builds with `scales[0]`); `record` collects amaxes in the same order.
    """

    def sc(i):
        return None if scales is None else scales[i]

    (shift_msa, scale_msa, gate_msa,
     shift_mlp, scale_mlp, gate_mlp) = jnp.split(m, 6, axis=-1)
    q_in = _modulate(_ln(h), shift_msa, scale_msa)
    att = attention_fn(q_in)
    att = int8_matmul(att, blk["o_w"], blk["o_s"], x_scale=sc(1),
                      record=record) + blk["o_b"]
    h = h + gate_msa * att
    m_in = _modulate(_ln(h), shift_mlp, scale_mlp)
    up = jax.nn.gelu(
        int8_matmul(m_in, blk["up_w"], blk["up_s"], x_scale=sc(2),
                    record=record) + blk["up_b"])
    dn = int8_matmul(up, blk["dn_w"], blk["dn_s"], x_scale=sc(3),
                     record=record) + blk["dn_b"]
    return h + gate_mlp * dn


def _final_int8(h: jax.Array, mf: jax.Array, q: Dict[str, Any]) -> jax.Array:
    """FinalLayer epilogue shared by both int8 twins."""
    shift, scale = jnp.split(mf, 2, axis=-1)
    out = _modulate(_ln(h), shift, scale)
    return out @ q["ln_out_w"] + q["ln_out_b"]


def denoise_with_mods_int8(x: jax.Array, mods: Dict[str, jax.Array],
                           q: Dict[str, Any], num_heads: int,
                           interpret: bool = False, act_scales=None,
                           record=None) -> jax.Array:
    """int8 twin of `Score.denoise_with_mods` for ONE denoise step.

    x: [B, z_scale, z_dim]; mods = {'blocks': [num_blocks, 6*hidden],
    'final': [2*hidden]} (this step's slice of `precompute_mods`); q from
    `quantize_score_params`.

    `act_scales`: this step's [num_blocks, 4] STATIC activation scales
    (LDT_INT8_STATIC scheme — see `int8_matmul` / `calibrate_act_scales`);
    None keeps the dynamic per-token quantization. `record`: Python list
    collecting per-site activation amaxes (calibration).
    """
    from ldt_tpu.ops.pallas_attention import fused_attention_packed

    h = (x.astype(jnp.bfloat16) @ q["ln_in_w"]) + q["ln_in_b"]
    for i, blk in enumerate(q["blocks"]):
        m = mods["blocks"][i]
        while m.ndim < 3:
            m = m[None]
        qkv_scale = None if act_scales is None else act_scales[i, 0]
        blk_scales = None if act_scales is None else act_scales[i]

        def self_attn(q_in, blk=blk, qkv_scale=qkv_scale):
            qkv = int8_matmul(q_in, blk["qkv_w"], blk["qkv_s"],
                              x_scale=qkv_scale,
                              record=record) + blk["qkv_b"]
            return fused_attention_packed(qkv, num_heads, interpret)

        h = _block_int8(h, m, blk, self_attn, scales=blk_scales,
                        record=record)
    mf = mods["final"]
    while mf.ndim < 3:
        mf = mf[None]
    return _final_int8(h, mf, q)


def denoise_cond_int8(x: jax.Array, t_emb: jax.Array, img_emb,
                      kv_cache, q: Dict[str, Any], num_heads: int,
                      interpret: bool = False) -> jax.Array:
    """int8 twin of the CONDITIONAL (non-UNet) `Score.__call__` for ONE step.

    x: [B, z_scale, z_dim]; t_emb: [t_dim] (this step's slice of
    `Score.embed_times` over the schedule); img_emb: [B, t_dim] image
    embedding or scalar 0.0; kv_cache from `precompute_cond_kv`; q from
    `quantize_cond_score_params`.

    Mirrors models/score.py::Score.__call__ (reference score.py:117-151):
    c = t_emb + img_emb, even blocks cross-attend to the cached condition
    KV, odd blocks self-attend via the packed int8 qkv GEMM; the AdaLN
    modulations are computed per step from ONE stacked bf16 GEMM.
    """
    from ldt_tpu.ops.pallas_attention import (
        fused_attention,
        fused_attention_packed,
    )

    c = (t_emb[None] + img_emb).astype(jnp.bfloat16)      # [B, t_dim]
    sc = jax.nn.silu(c)
    nb = len(q["blocks"])
    mods = (sc @ q["ada_w"] + q["ada_b"]).reshape(sc.shape[0], nb, -1)
    h = (x.astype(jnp.bfloat16) @ q["ln_in_w"]) + q["ln_in_b"]
    d = h.shape[-1]
    for i, blk in enumerate(q["blocks"]):
        m = mods[:, i][:, None, :]                        # [B, 1, 6*hidden]

        if kv_cache[i] is not None:
            def attn(q_in, blk=blk, kv=kv_cache[i]):
                qq = int8_matmul(q_in, blk["q_w"], blk["q_s"]) + blk["q_b"]
                return fused_attention(qq, kv[..., :d], kv[..., d:],
                                       num_heads, interpret)
        else:
            def attn(q_in, blk=blk):
                qkv = int8_matmul(q_in, blk["qkv_w"],
                                  blk["qkv_s"]) + blk["qkv_b"]
                return fused_attention_packed(qkv, num_heads, interpret)

        h = _block_int8(h, m, blk, attn)
    fm = (sc @ q["fin_w"] + q["fin_b"])[:, None, :]
    return _final_int8(h, fm, q)


def calibrate_act_scales(sde, mods, qparams, num_heads: int, rng,
                         num_samples: int, shape, N: int,
                         time_eps: float = 1e-6, interpret: bool = False):
    """Per-(step, block, site) STATIC activation scales for the int8
    sampler (LDT_INT8_STATIC scheme).

    Runs one full N-step ancestral reverse scan with the DYNAMIC int8
    sampler while recording each quantized GEMM input's amax; the returned
    scales are amax/127 — per-step scalars that replace the per-token amax
    reduce at serve time. The loop mirrors `sampling.sample_discrete`'s
    rng pattern and ancestral predictor EXACTLY (sampling.py:94-124,
    202-230; pinned-equality tested in tests/test_int8_serving.py) so the
    recorded trajectories are the ones serving will see.

    Returns (scales [N, num_blocks, 4] f32, x_mean [num_samples, *shape]).
    Site order per block: qkv / o / up / dn. Ancestral-predictor only —
    int8 serving is certified for 1000-step ancestral (DDIM-50 was
    gate-refuted, docs/sampler_profile.md).
    """
    nb = len(qparams["blocks"])

    def score_record(t, x, step):
        step_mods = jax.tree_util.tree_map(lambda m: m[step], mods)
        rec = []
        p = denoise_with_mods_int8(x, step_mods, qparams, num_heads,
                                   interpret=interpret, record=rec)
        std = sde.std(t)[:, None, None]
        return -p.astype(jnp.float32) / std, jnp.stack(rec).reshape(nb, 4)

    T = 1.0
    full_shape = (num_samples,) + tuple(shape)
    rng, init_rng = jax.random.split(rng)
    x0 = jax.random.normal(init_rng, full_shape)
    if sde.sde_type == "vesde":
        x0 = x0 * jnp.sqrt(sde.sigma2_max)
    timesteps = jnp.linspace(T, time_eps, N)

    def body(carry, ti):
        t, i = ti
        x, x_mean, step_rng = carry
        step_rng, k1, k2 = jax.random.split(step_rng, 3)
        tv = jnp.full((num_samples,), t)
        idx = (t * (N - 1) / T).astype(jnp.int32)
        beta = sde.betas[idx]
        score, amax = score_record(tv, x, i)
        x_mean = (x + beta * score) / jnp.sqrt(1.0 - beta)
        noise = jax.random.normal(k1, x.shape)
        return (x_mean + jnp.sqrt(beta) * noise, x_mean, step_rng), amax

    (x, x_mean, _), amaxes = jax.lax.scan(
        body, (x0, x0, rng),
        (timesteps, jnp.arange(N, dtype=jnp.int32)))
    scales = jnp.maximum(amaxes, 1e-12) / 127.0
    return scales, x_mean


def act_scales_path(ckpt_path: str) -> str:
    return ckpt_path + ".int8_act_scales.npz"


def save_act_scales(ckpt_path: str, scales, **meta_extra) -> str:
    """Write the calibration table next to the checkpoint, bound to its
    content (fingerprint) and to the quantization scheme active at
    calibration time (bf16_tail) — `load_act_scales` refuses on any
    mismatch, so stale or scheme-crossed scales can never silently pair
    with a different model (round-5 review findings)."""
    import json

    import numpy as np

    meta = {"checkpoint": _ckpt_fingerprint(ckpt_path),
            "bf16_tail": int(os.environ.get("LDT_INT8_BF16_TAIL", "0"))}
    meta.update(meta_extra)
    out = act_scales_path(ckpt_path)
    np.savez(out, scales=np.asarray(scales, np.float32),
             meta=json.dumps(meta))
    return out


def load_act_scales(ckpt_path: Optional[str], sample_N: int,
                    num_blocks: int, cfg=None):
    """Static activation scales for a checkpoint.

    LDT_INT8_STATIC=1 is an EXPLICIT opt-in, so any problem here RAISES
    instead of silently serving dynamic quantization — a silent fallback
    would mislabel gate runs and bench A/Bs as 'static' (round-5 review
    finding #2). Checks, beyond the (sample_N, num_blocks, 4) shape:
      * the npz's recorded checkpoint fingerprint matches the checkpoint
        being served (stale scales from a retrained chain are refused);
      * the bf16_tail scheme at calibration matches the serving env
        (a tail block's passthrough site records amax 0 — serving it
        quantized with scale ~1e-14 would clip everything to garbage);
      * the calibrated predictor is the running predictor (ancestral-only)
        and no corrector is configured.
    Reads LDT_INT8_STATIC_FILE if set (bench/experiments, skips the
    fingerprint binding since the file is explicitly chosen), else the
    `.int8_act_scales.npz` next to the checkpoint."""
    import json

    import numpy as np

    def refuse(why):
        raise RuntimeError(
            f"[int8-static] {why} — run scripts/int8_calibrate.py for this "
            "checkpoint/scheme, or unset LDT_INT8_STATIC to serve dynamic "
            "quantization")

    explicit = os.environ.get("LDT_INT8_STATIC_FILE")
    if explicit:
        path = explicit
    elif ckpt_path is None:
        refuse("no restored checkpoint to locate calibration scales "
               "(state was not restored through resume/load_pretrain)")
    else:
        path = act_scales_path(ckpt_path)
    if not os.path.exists(path):
        refuse(f"no calibration file {path}")
    try:
        data = np.load(path)
        scales = data["scales"]
        meta = json.loads(str(data["meta"])) if "meta" in data else {}
    except Exception as e:
        refuse(f"unreadable calibration file {path} ({e})")
    if scales.shape != (sample_N, num_blocks, 4):
        refuse(f"calibration shape {scales.shape} does not match the "
               f"running sampler ({sample_N}, {num_blocks}, 4)")
    if not explicit:
        # a table without a recorded fingerprint cannot be trusted either —
        # pre-binding files must be recalibrated (container resets retrain
        # the checkpoint chains under drifting tunnel compilers)
        if meta.get("checkpoint") != _ckpt_fingerprint(ckpt_path):
            refuse(f"calibration in {path} is not bound to this "
                   "checkpoint's content (missing or mismatched "
                   "fingerprint)")
    want_tail = int(os.environ.get("LDT_INT8_BF16_TAIL", "0"))
    if int(meta.get("bf16_tail", 0)) != want_tail:
        refuse(f"scales calibrated under bf16_tail="
               f"{meta.get('bf16_tail', 0)} but serving with "
               f"bf16_tail={want_tail}")
    if cfg is not None:
        pred = str(cfg.sde.predictor)
        cal_pred = str(meta.get("predictor", "ancestral"))
        if pred != cal_pred or pred != "ancestral":
            refuse(f"scales calibrated for predictor={cal_pred} but "
                   f"serving predictor={pred} (static int8 is "
                   "ancestral-only)")
        if getattr(cfg.sde, "corrector", None):
            refuse("static int8 scales are calibrated without a "
                   f"corrector; config has corrector={cfg.sde.corrector}")
    return jnp.asarray(scales, jnp.float32)


# --------------------------------------------------------------------------
# Golden-gate stamps (VERDICT r4 weak #2): the int8 path changes sampler
# numerics, so every (checkpoint, sampler-config) pair must be re-certified
# by scripts/int8_golden_gate.py before serving with it. The gate records
# its verdict in a JSON stamp next to the checkpoint; the serving path
# verifies the stamp at sample time and warns (or refuses, under
# LDT_SERVE_INT8_STRICT=1) when a checkpoint is served int8 without a
# matching PASSED stamp. Discipline enforced by code, not docs.

def _ckpt_fingerprint(ckpt_path: str) -> Dict[str, Any]:
    """Cheap content identity for a (possibly multi-GB) checkpoint: size +
    sha256 of the first and last 4 MB. Hashing the full flagship dual
    checkpoint (~5.5 GB) would cost ~a minute per sample call."""
    import hashlib

    h = hashlib.sha256()
    size = os.path.getsize(ckpt_path)
    chunk = 4 * 1024 * 1024
    with open(ckpt_path, "rb") as f:
        h.update(f.read(chunk))
        if size > chunk:
            # hash whatever tail the head read did not cover (up to 4 MB) —
            # a `size > 2*chunk` guard here left bytes [chunk, size-chunk)
            # of 4-8 MB checkpoints unhashed (round-5 review finding)
            tail = min(chunk, size - chunk)
            f.seek(size - tail)
            h.update(f.read(tail))
    return {"file": os.path.basename(ckpt_path), "size": size,
            "sha256_edges": h.hexdigest()}


def _sampler_signature(cfg, completion: bool) -> Dict[str, Any]:
    # the quantization-scheme knobs are part of the certified numerics: a
    # plain-W8A8 pass must not certify the int8-attention-core or
    # bf16-tail mixed schemes (both changed gate outcomes in round 4)
    return {"completion": bool(completion),
            "sample_N": int(cfg.sde.sample_N),
            "predictor": str(cfg.sde.predictor),
            "sample_mode": str(cfg.sde.sample_mode),
            "sde_type": str(cfg.sde.sde_type),
            "attn_int8": os.environ.get("LDT_ATTN_INT8", "0") == "1",
            "bf16_tail": int(os.environ.get("LDT_INT8_BF16_TAIL", "0")),
            # the conditional sampler has no static-scale path, so the env
            # knob must not fork its certification (review finding: a
            # completion gate under LDT_INT8_STATIC=1 measures the same
            # dynamic numerics)
            "static_act": (os.environ.get("LDT_INT8_STATIC", "0") == "1"
                           and not completion)}


def int8_serving_active(cfg, sample_mode: str, label=None,
                        condition=None) -> bool:
    """True iff the UNCONDITIONAL sampler will take the W8A8 path.

    Single source of truth for the serving predicate: the trace-time branch
    in `latent_sde_trainer.sample_step` and the gate-stamp check in
    `sample()` both call this (hand-duplicated copies of the condition
    drifted once already — round-5 review finding). The int8 twin
    hard-codes non-affine LayerNorm(1e-6) (`_ln`), precomputed-mods AdaLN
    DiT blocks, and a fixed discrete schedule; anything else falls through
    to the exact model path."""
    return (os.environ.get("LDT_SERVE_INT8", "0") == "1"
            and cfg.score.norm == "layer_norm"
            and label is None and condition is None
            and not cfg.score.unet and cfg.score.AdaLN
            and sample_mode != "continuous"
            and cfg.sde.predictor != "pndm")


def int8_cond_serving_active(cfg, sample_mode: str, cond_present) -> bool:
    """True iff the CONDITIONAL (completion) sampler will take the W8A8
    path — `cond_present` is `cond_enc[0] is not None` at trace time and
    `condition is not None` at the host-side gate check."""
    return (os.environ.get("LDT_SERVE_INT8", "0") == "1"
            and cfg.score.norm == "layer_norm"
            and not cfg.score.unet and cfg.score.AdaLN
            and sample_mode != "continuous"
            and cfg.sde.predictor != "pndm"
            and bool(cond_present))


def gate_stamp_path(ckpt_path: str) -> str:
    return ckpt_path + ".int8_gate.json"


def _load_stamp_entries(path: str):
    """Stamp entries on disk, or None when the file is unreadable/corrupt
    (e.g. a write truncated by a container reset — must WARN at serve time,
    not crash sample())."""
    import json

    try:
        with open(path) as f:
            stamp = json.load(f)
    except (OSError, ValueError):
        return None
    if isinstance(stamp, dict) and isinstance(stamp.get("entries"), list):
        return [e for e in stamp["entries"] if isinstance(e, dict)]
    if isinstance(stamp, dict):
        return [stamp]  # round-5 single-entry format
    return None


def write_gate_stamp(ckpt_path: str, cfg, completion: bool, passed: bool,
                     results: Dict[str, Any], threshold: float) -> str:
    """Called by scripts/int8_golden_gate.py after a verdict.

    Certification is per-(checkpoint, sampler-config), so the stamp file
    holds a LIST of entries: gating a second sampler config (e.g. DDIM-50
    after 1000-step ancestral) must not destroy the first config's verdict.
    Entries for the same config are replaced; entries recorded against a
    different checkpoint content (stale fingerprint) are dropped. The write
    is atomic (tmp + rename) so a killed gate can't leave a truncated stamp.
    """
    import json
    import time

    fp = _ckpt_fingerprint(ckpt_path)
    sig = _sampler_signature(cfg, completion)
    entry = {
        "checkpoint": fp,
        "sampler": sig,
        "passed": bool(passed),
        "threshold": float(threshold),
        "results": results,
        "written": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    path = gate_stamp_path(ckpt_path)
    entries = _load_stamp_entries(path) or []
    entries = [e for e in entries
               if e.get("sampler") != sig and e.get("checkpoint") == fp]
    entries.append(entry)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"entries": entries}, f, indent=1)
    os.replace(tmp, path)
    return path


def verify_gate_stamp(ckpt_path: Optional[str], cfg, completion: bool):
    """Check the stamp for a checkpoint about to be served int8.

    Returns a human-readable problem string (also printed), or None when a
    matching PASSED stamp exists. Under LDT_SERVE_INT8_STRICT=1 a problem
    raises instead of warning.
    """
    problem = None
    if ckpt_path is None:
        problem = ("int8 serving on a checkpoint of unknown origin (state "
                   "was not restored through resume/load_pretrain) — no "
                   "golden-gate stamp can be checked")
    elif not os.path.exists(gate_stamp_path(ckpt_path)):
        problem = (f"no int8 golden-gate stamp next to {ckpt_path} — run "
                   "scripts/int8_golden_gate.py for this checkpoint first")
    else:
        entries = _load_stamp_entries(gate_stamp_path(ckpt_path))
        want_sig = _sampler_signature(cfg, completion)
        if entries is None:
            problem = (f"int8 gate stamp {gate_stamp_path(ckpt_path)} is "
                       "unreadable (corrupt/truncated) — re-run "
                       "scripts/int8_golden_gate.py")
        else:
            fp = _ckpt_fingerprint(ckpt_path)
            fresh = [e for e in entries if e.get("checkpoint") == fp]
            match = [e for e in fresh if e.get("sampler") == want_sig]
            if not fresh:
                problem = (f"checkpoint content changed since the gate ran "
                           f"({ckpt_path}) — re-run "
                           "scripts/int8_golden_gate.py")
            elif not match:
                problem = ("int8 gate stamp certifies a different sampler "
                           f"config: stamped "
                           f"{[e.get('sampler') for e in fresh]} vs running "
                           f"{want_sig} (e.g. DDIM-50 int8 was REFUTED while "
                           "1000-step ancestral passed — re-gate per config)")
            elif not match[0].get("passed"):
                problem = (f"int8 golden gate FAILED for {ckpt_path} "
                           f"(stamp {gate_stamp_path(ckpt_path)})")
    if problem is None:
        return None
    if os.environ.get("LDT_SERVE_INT8_STRICT", "0") == "1":
        raise RuntimeError(f"[int8-gate] {problem} (LDT_SERVE_INT8_STRICT=1)")
    print(f"[int8-gate] WARNING: {problem}; serving int8 anyway "
          "(LDT_SERVE_INT8_STRICT=1 to refuse)", flush=True)
    return problem
