"""Pallas fused attention core for few-token set transformers.

Profiling the flagship latent DiT (32 tokens x 1024 dims x 16 heads) on v5e
shows the GEMMs at ~85% MFU but ~13% of device time burned in `reshape` —
the [B,N,D] <-> [B,N,H,dh] head relayouts around XLA's tiny batched
attention matmuls. This kernel computes the whole attention core

    out = softmax(q_h k_h^T / sqrt(dh)) v_h   (per head, concatenated)

inside VMEM with ONE program per batch element and no HBM round-trips:
per-head 2-D lane slices feed clean MXU matmuls (Mosaic has no general
in-kernel 3-D transpose, but 2-D lane slicing is free). Supports N != M
cross-attention — the Compressor's 2048-query x 32-key decode hot path
(reference model/Compressor/Network.py:80-83) uses the same kernel.

Round 2 adds a custom VJP with a Pallas BACKWARD kernel (same layout
trick), so the stage-2 *training* step also skips the head relayouts:

    dv_h = w^T g_h
    dw   = g_h v_h^T
    ds   = w * (dw - rowsum(dw * w))          (softmax Jacobian)
    dq_h = ds k_h * scale;  dk_h = ds^T q_h * scale

The projection GEMMs (q/kv/out) stay in XLA where batch x tokens fold into
MXU-sized matmuls.

Batch-folding note (kept from round 1): folding G batch elements into the
row axis with cross-batch masking measured SLOWER on v5e at N=32 (G=1: 458
clouds/min, G=2: 447, G=4: 448) — one batch element per program.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _softmax_rows(s):
    s = s - jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s)
    return e / jnp.sum(e, axis=1, keepdims=True)


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, num_heads: int):
    """Per-head attention entirely in VMEM for one batch element.

    q: [1, N, D]; k, v: [1, M, D]; o: [1, N, D]."""
    _, n, d = q_ref.shape
    m = k_ref.shape[1]
    h = num_heads
    dh = d // h
    q = q_ref[...].reshape(n, d)  # leading-dim collapse only
    k = k_ref[...].reshape(m, d)
    v = v_ref[...].reshape(m, d)
    scale = dh ** -0.5
    for i in range(h):
        sl = slice(i * dh, (i + 1) * dh)
        s = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale      # [N, M]
        w = _softmax_rows(s)
        o_ref[0, :, sl] = jnp.dot(
            w.astype(v.dtype), v[:, sl],
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref, *,
                num_heads: int):
    """Backward of `_fwd_kernel` for one batch element (w recomputed in
    VMEM — cheaper than spilling [N, M] weights to HBM for these token
    counts)."""
    _, n, d = q_ref.shape
    m = k_ref.shape[1]
    h = num_heads
    dh = d // h
    q = q_ref[...].reshape(n, d)
    k = k_ref[...].reshape(m, d)
    v = v_ref[...].reshape(m, d)
    g = g_ref[...].reshape(n, d)
    scale = dh ** -0.5
    for i in range(h):
        sl = slice(i * dh, (i + 1) * dh)
        s = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale      # [N, M]
        w = _softmax_rows(s)                                  # f32 [N, M]
        gh = g[:, sl]
        # dv = w^T g    ([M, N] @ [N, dh])
        dv_ref[0, :, sl] = jax.lax.dot_general(
            w.astype(gh.dtype), gh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dv_ref.dtype)
        # dw = g v^T    ([N, dh] @ [dh, M])
        dw = jax.lax.dot_general(
            gh, v[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)               # [N, M]
        ds = w * (dw - jnp.sum(dw * w, axis=1, keepdims=True))
        dsc = ds.astype(q.dtype)
        dq_ref[0, :, sl] = (jnp.dot(
            dsc, k[:, sl], preferred_element_type=jnp.float32)
            * scale).astype(dq_ref.dtype)
        dk_ref[0, :, sl] = (jax.lax.dot_general(
            dsc, q[:, sl], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale).astype(dk_ref.dtype)


def _fwd_kernel_packed(qkv_ref, o_ref, *, num_heads: int):
    """Self-attention forward on the PACKED [1, N, 3D] qkv GEMM output.

    The Attention module computes q/k/v as ONE [D, 3D] GEMM on the
    self-attention fast path; handing the packed tensor straight to the
    kernel removes the three XLA lane-slice ops and their materialized
    [B, N, D] copies (~12 MB HBM writes + reads per block at the flagship
    shape). The q/k/v regions sit at lane offsets 0 / D / 2D — multiples of
    1024, i.e. 128-lane aligned — so in-kernel slicing is free.
    """
    _, n, d3 = qkv_ref.shape
    d = d3 // 3
    h = num_heads
    dh = d // h
    x = qkv_ref[...].reshape(n, d3)
    scale = dh ** -0.5
    for i in range(h):
        q = x[:, i * dh:(i + 1) * dh]
        k = x[:, d + i * dh:d + (i + 1) * dh]
        v = x[:, 2 * d + i * dh:2 * d + (i + 1) * dh]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale      # [N, N]
        w = _softmax_rows(s)
        o_ref[0, :, i * dh:(i + 1) * dh] = jnp.dot(
            w.astype(v.dtype), v,
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _bwd_kernel_packed(qkv_ref, g_ref, dqkv_ref, *, num_heads: int):
    """Backward of `_fwd_kernel_packed`: gradients written into one packed
    [1, N, 3D] buffer (the VJP of the packed qkv GEMM consumes it whole)."""
    _, n, d3 = qkv_ref.shape
    d = d3 // 3
    h = num_heads
    dh = d // h
    x = qkv_ref[...].reshape(n, d3)
    g = g_ref[...].reshape(n, d)
    scale = dh ** -0.5
    for i in range(h):
        sl_q = slice(i * dh, (i + 1) * dh)
        sl_k = slice(d + i * dh, d + (i + 1) * dh)
        sl_v = slice(2 * d + i * dh, 2 * d + (i + 1) * dh)
        q, k, v = x[:, sl_q], x[:, sl_k], x[:, sl_v]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        w = _softmax_rows(s)
        gh = g[:, sl_q.start:sl_q.stop]
        dqkv_ref[0, :, sl_v] = jax.lax.dot_general(
            w.astype(gh.dtype), gh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dqkv_ref.dtype)
        dw = jax.lax.dot_general(
            gh, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = w * (dw - jnp.sum(dw * w, axis=1, keepdims=True))
        dsc = ds.astype(q.dtype)
        dqkv_ref[0, :, sl_q] = (jnp.dot(
            dsc, k, preferred_element_type=jnp.float32)
            * scale).astype(dqkv_ref.dtype)
        dqkv_ref[0, :, sl_k] = (jax.lax.dot_general(
            dsc, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale).astype(dqkv_ref.dtype)


def _fwd_kernel_packed_phased(qkv_ref, o_ref, s_scratch, *, num_heads: int):
    """Phase-separated (software-pipelined) packed self-attention forward.

    The per-head loop interleaves MXU matmul -> VPU softmax -> MXU matmul
    chains head by head; with [32, 64] half-lane-tile operands each chain is
    latency-bound and the units ping-pong. Here the schedule is split into
    three dense phases so same-unit ops issue back-to-back and the static
    scheduler can overlap across heads:

      1. all H score matmuls, outputs ROW-stacked into f32 scratch
         ([H*N, M] — row offsets are sublane-aligned, unlike the LANE-offset
         stacking that sank the grouped variant);
      2. ONE softmax over the whole stack (rows are independent; 16x fewer,
         16x taller VPU ops);
      3. all H weight @ v matmuls from scratch rows.

    Enabled with LDT_ATTN_PHASED=1 (bench-gated; see docs/sampler_profile.md).
    """
    _, n, d3 = qkv_ref.shape
    d = d3 // 3
    h = num_heads
    dh = d // h
    x = qkv_ref[...].reshape(n, d3)
    scale = dh ** -0.5
    for i in range(h):
        q = x[:, i * dh:(i + 1) * dh]
        k = x[:, d + i * dh:d + (i + 1) * dh]
        s_scratch[i * n:(i + 1) * n, :] = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
    w = _softmax_rows(s_scratch[...]).astype(x.dtype)   # [H*N, M] in one go
    for i in range(h):
        v = x[:, 2 * d + i * dh:2 * d + (i + 1) * dh]
        o_ref[0, :, i * dh:(i + 1) * dh] = jnp.dot(
            w[i * n:(i + 1) * n, :], v,
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _fwd_kernel_packed_phased_multi(qkv_ref, o_ref, s_scratch, *,
                                    num_heads: int, elems: int):
    """`_fwd_kernel_packed_phased` over `elems` batch elements per program.

    The per-element program is ~750 cycles of latency-bound work (16 score
    chains -> softmax -> 16 AV chains) plus per-program DMA/prologue
    overhead, 1536 programs per flagship step. Folding E elements into one
    program (grid b/E, block [E, N, 3D] collapsed to [E*N, 3D] — a free
    leading-dim reshape, NOT the cross-batch row-masking that lost in round
    1) gives the static scheduler E x more independent chains to overlap
    and halves/quarters the per-program overhead. Scores stack into ONE
    [E*H*N, M] scratch so the softmax still runs as a single VPU pass.
    """
    e_, n, d3 = qkv_ref.shape
    d = d3 // 3
    h = num_heads
    dh = d // h
    x = qkv_ref[...].reshape(e_ * n, d3)   # leading-dim collapse only
    scale = dh ** -0.5
    for e in range(elems):
        rs = slice(e * n, (e + 1) * n)
        for i in range(h):
            q = x[rs, i * dh:(i + 1) * dh]
            k = x[rs, d + i * dh:d + (i + 1) * dh]
            row = (e * h + i) * n
            s_scratch[row:row + n, :] = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
    w = _softmax_rows(s_scratch[...]).astype(x.dtype)   # [E*H*N, M] in one go
    for e in range(elems):
        rs = slice(e * n, (e + 1) * n)
        for i in range(h):
            v = x[rs, 2 * d + i * dh:2 * d + (i + 1) * dh]
            row = (e * h + i) * n
            o_ref[e, :, i * dh:(i + 1) * dh] = jnp.dot(
                w[row:row + n, :], v,
                preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _fwd_kernel_packed_phased_multi_int8(qkv_ref, o_ref, s_scratch, *,
                                         num_heads: int, elems: int):
    """int8-operand variant of `_fwd_kernel_packed_phased_multi`
    (VERDICT r3 #2): QK^T and AV run as int8 x int8 -> int32 MXU dots,
    softmax/accumulation stay f32.

    Quantization scheme (gated by scripts/int8_golden_gate.py like the
    serving GEMMs, reference math model/layers.py:183-200):
      * q, k, v: one symmetric per-program dynamic scale each
        (max|.| / 127 over the whole [E*N, D] operand block), quantized
        per-head-slice at use so only f32/bf16 values are lane-sliced
        (int8 sub-128-lane slice alignment is the risky Mosaic case);
      * scores: int32 dot * (sq*sk/127^2 * dh^-0.5) -> f32 scratch;
      * attention weights: in [0,1] by construction -> STATIC scale 127
        (w8 = round(w*127)), no reduction needed;
      * output: int32 dot * (sv/127) -> o dtype.
    Enabled with LDT_ATTN_INT8=1 (default off until golden-gated on TPU).
    """
    e_, n, d3 = qkv_ref.shape
    d = d3 // 3
    h = num_heads
    dh = d // h
    x = qkv_ref[...].reshape(e_ * n, d3)
    scale = dh ** -0.5

    xf = x.astype(jnp.float32)
    sq = jnp.max(jnp.abs(xf[:, :d])) / 127.0 + 1e-20
    sk = jnp.max(jnp.abs(xf[:, d:2 * d])) / 127.0 + 1e-20
    sv = jnp.max(jnp.abs(xf[:, 2 * d:])) / 127.0 + 1e-20

    def q8(sl, s):
        return jnp.clip(jnp.round(sl.astype(jnp.float32) / s),
                        -127.0, 127.0).astype(jnp.int8)

    for e in range(elems):
        rs = slice(e * n, (e + 1) * n)
        for i in range(h):
            qi = q8(x[rs, i * dh:(i + 1) * dh], sq)
            ki = q8(x[rs, d + i * dh:d + (i + 1) * dh], sk)
            row = (e * h + i) * n
            s_int = jax.lax.dot_general(
                qi, ki, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            s_scratch[row:row + n, :] = (
                s_int.astype(jnp.float32) * (sq * sk * scale))
    w = _softmax_rows(s_scratch[...])                       # f32 [E*H*N, M]
    w8 = jnp.clip(jnp.round(w * 127.0), 0.0, 127.0).astype(jnp.int8)
    for e in range(elems):
        rs = slice(e * n, (e + 1) * n)
        for i in range(h):
            vi = q8(x[rs, 2 * d + i * dh:2 * d + (i + 1) * dh], sv)
            row = (e * h + i) * n
            o_int = jax.lax.dot_general(
                w8[row:row + n, :], vi, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            o_ref[e, :, i * dh:(i + 1) * dh] = (
                o_int.astype(jnp.float32) * (sv / 127.0)).astype(o_ref.dtype)


def _bwd_kernel_packed_phased(qkv_ref, g_ref, dqkv_ref, s_scratch, d_scratch,
                              *, num_heads: int):
    """Phase-separated backward of `_fwd_kernel_packed`.

    Same idea as `_fwd_kernel_packed_phased`: the per-head bwd loop
    interleaves five [32, xx] matmuls with two VPU passes per head — each
    chain latency-bound, the units ping-pong (measured 445 us/block in the
    flagship train step vs 51 us for the phased forward). Split into five
    dense phases over ROW-stacked f32 scratch ([H*N, M], sublane-aligned):

      1. all H score matmuls -> s_scratch;
      2. ONE softmax over the stack (w kept f32 in s_scratch);
      3. all H dw = g_h @ v_h^T matmuls -> d_scratch;
      4. ONE ds = w * (dw - rowsum(dw * w)) pass over the stack;
      5. all H of dv = w^T g, dq = ds k, dk = ds^T q back-to-back.
    """
    _, n, d3 = qkv_ref.shape
    d = d3 // 3
    h = num_heads
    dh = d // h
    x = qkv_ref[...].reshape(n, d3)
    g = g_ref[...].reshape(n, d)
    scale = dh ** -0.5
    for i in range(h):
        q = x[:, i * dh:(i + 1) * dh]
        k = x[:, d + i * dh:d + (i + 1) * dh]
        s_scratch[i * n:(i + 1) * n, :] = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
    w = _softmax_rows(s_scratch[...])                      # [H*N, M] f32
    wb = w.astype(x.dtype)
    for i in range(h):
        v = x[:, 2 * d + i * dh:2 * d + (i + 1) * dh]
        gh = g[:, i * dh:(i + 1) * dh]
        d_scratch[i * n:(i + 1) * n, :] = jax.lax.dot_general(
            gh, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    dw = d_scratch[...]
    ds = w * (dw - jnp.sum(dw * w, axis=1, keepdims=True))  # [H*N, M] f32
    dsc = ds.astype(x.dtype)
    for i in range(h):
        sl_q = slice(i * dh, (i + 1) * dh)
        sl_k = slice(d + i * dh, d + (i + 1) * dh)
        sl_v = slice(2 * d + i * dh, 2 * d + (i + 1) * dh)
        q, k = x[:, sl_q], x[:, sl_k]
        gh = g[:, sl_q.start:sl_q.stop]
        wi = wb[i * n:(i + 1) * n, :]
        dsi = dsc[i * n:(i + 1) * n, :]
        dqkv_ref[0, :, sl_v] = jax.lax.dot_general(
            wi, gh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dqkv_ref.dtype)
        dqkv_ref[0, :, sl_q] = (jnp.dot(
            dsi, k, preferred_element_type=jnp.float32)
            * scale).astype(dqkv_ref.dtype)
        dqkv_ref[0, :, sl_k] = (jax.lax.dot_general(
            dsi, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale).astype(dqkv_ref.dtype)


def _fwd_kernel_grouped(q_ref, k_ref, v_ref, o_ref, qs, ks, vs, os_, *,
                        num_heads: int, group: int):
    """Grouped-heads forward for SELF-attention shapes (N == M, few tokens).

    The per-head loop issues 2*H tiny [N, dh] x [dh, N] matmuls per batch
    element; with dh = 64 every other head sits at a 64-lane offset (the lane
    tile is 128 wide), so each op runs on half-tiles and the whole core is
    instruction-latency-bound (measured: 18.9% of sampler device time for
    <1% of its FLOPs). Here heads are first copied into ROW-stacked VMEM
    scratch ([H*N, dh] — 16 strided tile copies, cheap on the VPU), then
    `group` heads at a time are contracted as ONE full-tile MXU matmul with
    a block-diagonal -inf mask before the softmax: exp(-inf) = 0 zeroes the
    cross-head weights, so the grouped W @ V matmul is exact with no
    extraction step. FLOP inflation is `group`x on the two score/AV matmuls
    (they carry <1% of model FLOPs), bought back many times over by full
    128-lane tiles and H/group-fold fewer instruction chains.
    """
    _, n, d = q_ref.shape
    h = num_heads
    dh = d // h
    q = q_ref[...].reshape(n, d)
    k = k_ref[...].reshape(n, d)
    v = v_ref[...].reshape(n, d)
    scale = dh ** -0.5
    for i in range(h):
        sl = slice(i * dh, (i + 1) * dh)
        rs = slice(i * n, (i + 1) * n)
        qs[rs, :] = q[:, sl]
        ks[rs, :] = k[:, sl]
        vs[rs, :] = v[:, sl]
    rpg = n * group  # rows per grouped matmul
    # block-diagonal mask: row r is head r//n, col c is head c//n
    rid = jax.lax.broadcasted_iota(jnp.int32, (rpg, rpg), 0) // n
    cid = jax.lax.broadcasted_iota(jnp.int32, (rpg, rpg), 1) // n
    neg = jnp.where(rid == cid, 0.0, -1e30).astype(jnp.float32)
    for j in range(h // group):
        gs = slice(j * rpg, (j + 1) * rpg)
        s = jax.lax.dot_general(
            qs[gs, :], ks[gs, :], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale + neg
        w = _softmax_rows(s)
        os_[gs, :] = jnp.dot(
            w.astype(v.dtype), vs[gs, :],
            preferred_element_type=jnp.float32).astype(os_.dtype)
    for i in range(h):
        o_ref[0, :, i * dh:(i + 1) * dh] = os_[i * n:(i + 1) * n, :]


def _block(n, d):
    return pl.BlockSpec((1, n, d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


# Heads per grouped-matmul in the self-attention forward kernel (see
# `_fwd_kernel_grouped`); 0 or 1 (the default) = the per-head loop. MEASURED
# SLOWER on v5e for the flagship DiT (32 tokens x 16 heads x dh 64): 250-step
# sampler bench per-head 450.6 clouds/min vs group=2 441.1 / group=4 435.1 —
# the 64-lane-offset stacking copies into scratch cost more than the bigger
# matmuls save (Mosaic lowers misaligned lane slices via mask+shift chains).
# Kept as an escape hatch for shapes where heads are 128-lane aligned.
_GROUP_HEADS = int(os.environ.get("LDT_ATTN_GROUP", "0"))

# Phase-separated packed self-attention forward (`_fwd_kernel_packed_phased`)
# — scores / softmax / AV as three dense phases instead of interleaved
# per-head chains. DEFAULT ON: measured 474.1 vs 454.0 clouds/min/chip on
# the 250-step flagship bench (v5e, round 3). LDT_ATTN_PHASED=0 restores
# the interleaved per-head loop.
_PHASED = os.environ.get("LDT_ATTN_PHASED", "1") == "1"

# Batch elements per PROGRAM in the phased self-attention forward
# (`_fwd_kernel_packed_phased_multi`); 1 = one element per program.
# E>1 amortizes per-program overhead and gives the static scheduler E x
# more independent matmul chains (see kernel docstring). DEFAULT 4:
# measured 726.5 clouds/min/chip vs 707.9 (E=2) / 669 (E=1) on the
# flagship int8 serving bench (v5e, round 3). Numerics-identical (same
# math, batched schedule; oracle-tested per-E in
# tests/test_pallas_attention.py). Batches not divisible by E fall back
# to the single-element phased kernel. Cost: the E=4 program compiles
# several minutes slower over the remote-compile transport — and since
# this forward kernel is SHARED with the train step, that compile cost
# applies to training runs too, not just the serving bench. Note for
# baseline reproduction: the documented 474 clouds/min bf16-exact number
# was measured at E=1, so reproducing it needs LDT_ATTN_ELEMS=1 in
# addition to LDT_BENCH_INT8=0 (same-session E-sweep under int8:
# E=1 667.9 / E=2 707.9 / E=4 726.5).
_ELEMS = int(os.environ.get("LDT_ATTN_ELEMS", "4"))

# Phase-separated packed BACKWARD (`_bwd_kernel_packed_phased`) — same
# schedule applied to the training-step bwd (profiled at 445 us/block,
# 19% of the flagship train step). Separate gate from the forward so the
# sampling fast path never depends on the bwd kernel's compile.
_PHASED_BWD = os.environ.get("LDT_ATTN_PHASED_BWD", "1") == "1"

# int8-operand phased forward (`_fwd_kernel_packed_phased_multi_int8`):
# QK^T / AV as int8 MXU dots, f32 softmax. OFF by default — numerics
# change, so it ships only behind the golden gate like the serving GEMMs
# (scripts/int8_golden_gate.py). Applies to the multi-element phased
# self-attention path only (the serving hot path). None = read the
# LDT_ATTN_INT8 env at TRACE time (the golden gate rebuilds its jits per
# mode after flipping the env, like LDT_SERVE_INT8); tests monkeypatch
# the module flag to a bool directly.
_INT8_ATTN = None


def _int8_attn_enabled() -> bool:
    if _INT8_ATTN is not None:
        return _INT8_ATTN
    return os.environ.get("LDT_ATTN_INT8", "0") == "1"


def _fwd_call(q, k, v, num_heads: int, interpret: bool):
    b, n, d = q.shape
    m = k.shape[1]
    dh = d // num_heads
    g = _GROUP_HEADS
    if (g > 1 and n == m and num_heads % g == 0 and n % 8 == 0
            and n * num_heads <= 2048):
        kernel = functools.partial(_fwd_kernel_grouped, num_heads=num_heads,
                                   group=g)
        scratch = [pltpu.VMEM((n * num_heads, dh), q.dtype)] * 3 + [
            pltpu.VMEM((n * num_heads, dh), q.dtype)]
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((b, n, d), q.dtype),
            grid=(b,),
            in_specs=[_block(n, d), _block(m, d), _block(m, d)],
            out_specs=_block(n, d),
            scratch_shapes=scratch,
            interpret=interpret,
        )(q, k, v)
    kernel = functools.partial(_fwd_kernel, num_heads=num_heads)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, n, d), q.dtype),
        grid=(b,),
        in_specs=[_block(n, d), _block(m, d), _block(m, d)],
        out_specs=_block(n, d),
        interpret=interpret,
    )(q, k, v)


def _bwd_call(q, k, v, g, num_heads: int, interpret: bool):
    b, n, d = q.shape
    m = k.shape[1]
    kernel = functools.partial(_bwd_kernel, num_heads=num_heads)
    return pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((b, n, d), q.dtype),
                   jax.ShapeDtypeStruct((b, m, d), k.dtype),
                   jax.ShapeDtypeStruct((b, m, d), v.dtype)),
        grid=(b,),
        in_specs=[_block(n, d), _block(m, d), _block(m, d), _block(n, d)],
        out_specs=(_block(n, d), _block(m, d), _block(m, d)),
        interpret=interpret,
    )(q, k, v, g)


def _fwd_call_packed(qkv, num_heads: int, interpret: bool):
    b, n, d3 = qkv.shape
    d = d3 // 3
    if _PHASED and _ELEMS > 1 and b % _ELEMS == 0:
        e = _ELEMS
        kernel = functools.partial(
            _fwd_kernel_packed_phased_multi_int8 if _int8_attn_enabled()
            else _fwd_kernel_packed_phased_multi,
            num_heads=num_heads, elems=e)
        eblock = lambda dd: pl.BlockSpec(  # noqa: E731
            (e, n, dd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((b, n, d), qkv.dtype),
            grid=(b // e,),
            in_specs=[eblock(d3)],
            out_specs=eblock(d),
            scratch_shapes=[pltpu.VMEM((e * num_heads * n, n), jnp.float32)],
            interpret=interpret,
        )(qkv)
    if _PHASED:
        kernel = functools.partial(_fwd_kernel_packed_phased,
                                   num_heads=num_heads)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((b, n, d), qkv.dtype),
            grid=(b,),
            in_specs=[_block(n, d3)],
            out_specs=_block(n, d),
            scratch_shapes=[pltpu.VMEM((num_heads * n, n), jnp.float32)],
            interpret=interpret,
        )(qkv)
    kernel = functools.partial(_fwd_kernel_packed, num_heads=num_heads)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, n, d), qkv.dtype),
        grid=(b,),
        in_specs=[_block(n, d3)],
        out_specs=_block(n, d),
        interpret=interpret,
    )(qkv)


def _bwd_call_packed(qkv, g, num_heads: int, interpret: bool):
    b, n, d3 = qkv.shape
    d = d3 // 3
    if _PHASED_BWD:
        kernel = functools.partial(_bwd_kernel_packed_phased,
                                   num_heads=num_heads)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((b, n, d3), qkv.dtype),
            grid=(b,),
            in_specs=[_block(n, d3), _block(n, d)],
            out_specs=_block(n, d3),
            scratch_shapes=[pltpu.VMEM((num_heads * n, n), jnp.float32),
                            pltpu.VMEM((num_heads * n, n), jnp.float32)],
            interpret=interpret,
        )(qkv, g)
    kernel = functools.partial(_bwd_kernel_packed, num_heads=num_heads)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, n, d3), qkv.dtype),
        grid=(b,),
        in_specs=[_block(n, d3), _block(n, d)],
        out_specs=_block(n, d3),
        interpret=interpret,
    )(qkv, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def fused_attention_packed(qkv: jax.Array, num_heads: int,
                           interpret: bool = False) -> jax.Array:
    """Self-attention on the packed [B, N, 3D] qkv projection output.

    Equivalent to `fused_attention(qkv[..., :D], qkv[..., D:2D],
    qkv[..., 2D:], ...)` but consumes the fused qkv GEMM's output directly —
    no XLA lane-slice ops, no materialized q/k/v copies (see
    `_fwd_kernel_packed`). Differentiable: the backward Pallas kernel emits
    a packed [B, N, 3D] gradient that flows straight into the qkv GEMM VJP.
    """
    return _fwd_call_packed(qkv, num_heads, interpret)


def _fused_attention_packed_fwd(qkv, num_heads, interpret):
    return _fwd_call_packed(qkv, num_heads, interpret), (qkv,)


def _fused_attention_packed_bwd(num_heads, interpret, residuals, g):
    (qkv,) = residuals
    return (_bwd_call_packed(qkv, g, num_heads, interpret),)


fused_attention_packed.defvjp(_fused_attention_packed_fwd,
                              _fused_attention_packed_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    num_heads: int, interpret: bool = False) -> jax.Array:
    """softmax(q k^T / sqrt(dh)) v per head, heads packed in the last dim.

    q: [B, N, D]; k, v: [B, M, D] (self- or cross-attention, any N, M);
    returns [B, N, D]. Differentiable: the backward pass is a Pallas kernel
    too (see module docstring). `interpret=True` runs both kernels in the
    Pallas interpreter (CPU tests).
    """
    return _fwd_call(q, k, v, num_heads, interpret)


def _fused_attention_fwd(q, k, v, num_heads, interpret):
    return _fwd_call(q, k, v, num_heads, interpret), (q, k, v)


def _fused_attention_bwd(num_heads, interpret, residuals, g):
    q, k, v = residuals
    dq, dk, dv = _bwd_call(q, k, v, g, num_heads, interpret)
    return dq, dk, dv


fused_attention.defvjp(_fused_attention_fwd, _fused_attention_bwd)


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def fused_attention_core(q: jax.Array, k: jax.Array, v: jax.Array,
                         num_heads: int, interpret: bool = False) -> jax.Array:
    """Jitted convenience wrapper around `fused_attention` (round-1 name)."""
    b, n, d = q.shape
    assert k.shape == v.shape and k.shape[0] == b and k.shape[2] == d
    assert d % num_heads == 0
    return fused_attention(q, k, v, num_heads, interpret)


def fused_attention_packed_tp(x: jax.Array, wq: jax.Array, bq: jax.Array,
                              wkv: jax.Array, bkv: jax.Array,
                              num_heads: int, mesh,
                              interpret: bool = False) -> jax.Array:
    """Packed self-attention under a tensor-parallel `model` mesh axis.

    Closes the TP-serving cliff (VERDICT r3 weak #3): GSPMD replicates a
    Pallas custom call it cannot partition, so with a model axis the fused
    core used to be disabled entirely and multi-chip serving fell back to
    XLA attention. But the Megatron layout (parallel/tp.py) is HEAD-ALIGNED:
    fc_q/fc_kv shard their output features over `model`, heads own
    contiguous dh channel slices, and model_parallel | num_heads — so every
    shard holds whole heads. `shard_map` therefore runs the packed qkv GEMM
    + the Pallas kernel per shard on purely LOCAL data:

      * weights enter as the raw fc_q [D, D] / fc_kv [D, 2D] kernels and are
        packed [q_l | k_l | v_l] INSIDE the shard (a global concat would
        interleave q/kv channels across shards);
      * each shard computes its num_heads/m heads with the unmodified
        single-chip kernel (pl.pallas_call never sees a sharded axis, so the
        GSPMD replication rule never fires);
      * the output emerges column-sharded P(..., "model") — exactly what the
        row-parallel fc_o that follows expects; XLA inserts only the psum
        the Megatron pair needs anyway. Zero extra collectives.

    `x` shards over `data` on the batch axis when it divides; activations
    within a shard are the full token set (32 latent tokens — SP applies to
    the 2048-point decode, not here). Differentiable: jax.shard_map
    transposes through the custom-VJP kernel shard-locally.

    Reference math unchanged: model/layers.py:183-200.
    """
    msize = mesh.shape["model"]
    dsize = dict(mesh.shape).get("data", 1)
    from jax.sharding import PartitionSpec as P
    batch = "data" if dsize > 1 and x.shape[0] % dsize == 0 else None
    xspec = P(batch, None, None)
    ospec = P(batch, None, "model")
    h_local = num_heads // msize
    d = wq.shape[1]
    # fc_kv's FLAT [D, 2D] output axis is col-sharded as one contiguous
    # chunk of the packed k-then-v channel space — a model shard of the flat
    # tensor does NOT own matching (k, v) head pairs (m=2 would put all of k
    # on shard 0 and all of v on shard 1). Split into the k and v halves
    # HERE so each enters shard_map with its own head-aligned P(None,
    # "model") spec; the reshard this inserts moves loop-invariant weights,
    # which XLA hoists out of the sampler scan (paid once per call, not per
    # step).
    wk, wv = wkv[:, :d], wkv[:, d:]
    bk, bv = bkv[:d], bkv[d:]

    def _local(xl, wql, bql, wkl, bkl, wvl, bvl):
        w = jnp.concatenate([wql, wkl, wvl], axis=1)  # [D, 3*D/m] local pack
        bias = jnp.concatenate([bql, bkl, bvl])       # [3*D/m]
        qkv = xl @ w + bias
        return fused_attention_packed(qkv, h_local, interpret)

    col, cb = P(None, "model"), P("model")
    return jax.shard_map(
        _local, mesh=mesh,
        in_specs=(xspec, col, cb, col, cb, col, cb),
        out_specs=ospec, check_vma=False,
    )(x, wq, bq, wk, bk, wv, bv)


def tp_attention_supported(num_heads: int, dim: int, mesh) -> bool:
    """True when `fused_attention_packed_tp` can shard this attention: whole
    heads per shard and 128-lane-aligned local q/k/v regions (the packed
    kernel lane-slices at multiples of the local D)."""
    if mesh is None or "model" not in mesh.axis_names:
        return False
    m = mesh.shape["model"]
    return m > 1 and num_heads % m == 0 and (dim // m) % 128 == 0


def reference_attention_core(q: jax.Array, k: jax.Array, v: jax.Array,
                             num_heads: int) -> jax.Array:
    """Pure-XLA oracle with identical semantics (for differential tests)."""
    b, n, d = q.shape
    m = k.shape[1]
    dh = d // num_heads
    qh = q.reshape(b, n, num_heads, dh)
    kh = k.reshape(b, m, num_heads, dh)
    vh = v.reshape(b, m, num_heads, dh)
    w = jnp.einsum("bnhd,bmhd->bhnm", qh, kh) * (dh ** -0.5)
    w = jax.nn.softmax(w.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhnm,bmhd->bnhd", w, vh).reshape(b, n, d)
