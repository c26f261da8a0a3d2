#!/bin/bash
# Round-4 queue G: same-session eval-EMD pair-batching sweep + bench control.
#
# Measures the pair-batched streaming Pallas eval-EMD kernel
# (LDT_EMD_PALLAS_PAIRS, ops/emd.py) against the XLA form and the round-4
# pairs=1 kernel, all in ONE session (tunnel-compiler deltas make
# cross-session comparisons meaningless — CLAUDE.md). VMEM budget keeps
# pairs * tile <= 512 at m = 2048. Finishes with a headline bench control.
#
# Fire only when the tunnel is free (single client!). Log: /tmp/queueG.log
set -u
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/queueG.log
mark() { echo "=== $* $(date -u +%H:%M:%S) ===" | tee -a "$LOG"; }

run_pairs() { # name, then env assignments and/or --flags for the script
  local name=$1; shift
  local envs=() extra=()
  for a in "$@"; do case $a in --*) extra+=("$a");; *) envs+=("$a");; esac; done
  mark "eval-pairs $name"
  env JAX_PLATFORMS= PYTHONUNBUFFERED=1 ${envs[@]+"${envs[@]}"} timeout 1200 \
      python scripts/bench_eval_pairs.py ${extra[@]+"${extra[@]}"} >> "$LOG" 2>&1
  mark "eval-pairs $name rc=$?"
}

mark "on-device parity (pt 1/2/4 vs XLA form)"
env JAX_PLATFORMS= PYTHONUNBUFFERED=1 timeout 1200 python - >> "$LOG" 2>&1 <<'EOF'
import numpy as np, jax, jax.numpy as jnp
from ldt_tpu.ops import emd as emd_mod
rng = np.random.RandomState(0)
x = rng.uniform(0, 1, size=(6, 2048, 3)).astype(np.float32)
y = rng.uniform(0, 1, size=(6, 2048, 3)).astype(np.float32)
want = np.asarray(jax.vmap(emd_mod._approx_match_cost_single)(
    jnp.asarray(x), jnp.asarray(y)))
for pt, tile in ((1, 256), (2, 256), (4, 128)):
    emd_mod._EMD_PAIRS, emd_mod._EMD_TILE = pt, tile
    got = np.asarray(emd_mod._approx_match_cost_pallas(
        jnp.asarray(x), jnp.asarray(y)))
    err = float(np.max(np.abs(got - want) / np.abs(want)))
    print(f"[parity] pt={pt} tile={tile}: max rel err {err:.2e}", flush=True)
    assert err < 2e-5, (pt, tile, err)
import ldt_tpu.ops as ops
from ldt_tpu.ops.chamfer import pairwise_cd_means_pallas
d1, d2, _, _ = ops.chamfer_distance(jnp.asarray(x), jnp.asarray(y))
want_cd = np.asarray(jnp.mean(d1, axis=1) + jnp.mean(d2, axis=1))
got_cd = np.asarray(pairwise_cd_means_pallas(jnp.asarray(x), jnp.asarray(y)))
err = float(np.max(np.abs(got_cd - want_cd) / np.abs(want_cd)))
print(f"[parity] cd-pallas: max rel err {err:.2e}", flush=True)
assert err < 1e-5, err
print("[parity] OK")
EOF
mark "parity rc=$?"

run_pairs "xla-control"        LDT_EVAL_EMD_PALLAS=0
# EMD sweep points skip the CD row (--emd-only): the CD tile does not
# depend on the EMD kernel variant, and each CD row costs a remote compile
run_pairs "pallas-pt1-t256"    LDT_EVAL_EMD_PALLAS=1 LDT_EMD_PALLAS_PAIRS=1 LDT_EMD_PALLAS_TILE=256 --emd-only
run_pairs "pallas-pt2-t256"    LDT_EVAL_EMD_PALLAS=1 LDT_EMD_PALLAS_PAIRS=2 LDT_EMD_PALLAS_TILE=256 --emd-only
run_pairs "pallas-pt4-t128"    LDT_EVAL_EMD_PALLAS=1 LDT_EMD_PALLAS_PAIRS=4 LDT_EMD_PALLAS_TILE=128 --emd-only
run_pairs "pallas-pt8-t64"     LDT_EVAL_EMD_PALLAS=1 LDT_EMD_PALLAS_PAIRS=8 LDT_EMD_PALLAS_TILE=64 --emd-only
# on-the-fly d (clouds in VMEM, zero [N,M] HBM traffic; tile can grow since
# no d blocks are double-buffered — VMEM holds only clouds + state)
run_pairs "otf-pt1-t256"       LDT_EVAL_EMD_PALLAS=1 LDT_EMD_PALLAS_OTF=1 LDT_EMD_PALLAS_PAIRS=1 --emd-only
run_pairs "otf-pt2-t256"       LDT_EVAL_EMD_PALLAS=1 LDT_EMD_PALLAS_OTF=1 LDT_EMD_PALLAS_PAIRS=2 --emd-only
run_pairs "otf-pt4-t256"       LDT_EVAL_EMD_PALLAS=1 LDT_EMD_PALLAS_OTF=1 LDT_EMD_PALLAS_PAIRS=4 --emd-only
run_pairs "otf-pt4-t512"       LDT_EVAL_EMD_PALLAS=1 LDT_EMD_PALLAS_OTF=1 LDT_EMD_PALLAS_PAIRS=4 LDT_EMD_PALLAS_TILE=512 --emd-only
# round-4 per-pair CD kernel: committed but never measured on TPU (the
# container reset ate queue F2) — CD row is the number that moves here
run_pairs "cd-pallas"          LDT_EVAL_CD_PALLAS=1
run_pairs "cd+emd-best-combo"  LDT_EVAL_CD_PALLAS=1 LDT_EVAL_EMD_PALLAS=1 LDT_EMD_PALLAS_PAIRS=2

# stage-1 step control on the fresh bootstrap checkpoint (docs freshness:
# the auction share was last profiled on the pre-update compiler)
S1=experiments/Compressor_Trainer/airplane_synth_stability/checkpt_600.msgpack
if [ -f "$S1" ]; then
  mark "stage1-step control"
  env JAX_PLATFORMS= PYTHONUNBUFFERED=1 timeout 1800 \
      python scripts/bench_stage1_step.py --restore 600 --real >> "$LOG" 2>&1
  mark "stage1-step rc=$?"
else
  mark "SKIP stage1-step (no checkpoint)"
fi
# NO bench control here: the round driver runs bench.py itself right after
# the session, and nothing this session touches the serving path.
mark "DONE"
