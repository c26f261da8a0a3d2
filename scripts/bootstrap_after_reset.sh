#!/bin/bash
# Rebuild everything a container reset wipes (synthetic data + the
# experiment checkpoint chains), in dependency order, fully guarded —
# safe to re-run, skips whatever already exists. This has been needed
# twice in round 4 alone; run it FIRST in any new session whose /tmp is
# fresh and data/ is absent.
#
#   bash scripts/bootstrap_after_reset.sh            # data + stage-1
#   bash scripts/bootstrap_after_reset.sh --full     # + completion chain
#   LDT_BOOTSTRAP_BUDGET_MIN=90 bash scripts/bootstrap_after_reset.sh --full
#     # stop starting new TPU stages once the budget is spent (stages are
#     # skipped with a logged reason; re-run to continue where it left off)
#
# One jax process at a time (single-client tunnel). Log: /tmp/bootstrap.log
set -u
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/bootstrap.log
mark() { echo "=== $* $(date -u +%H:%M:%S) ===" | tee -a "$LOG"; }

# Deadline guard: the TPU tunnel is single-client, and the round driver
# runs bench.py on it at end-of-round — an unattended chain still training
# then would deadlock the bench. LDT_BOOTSTRAP_BUDGET_MIN bounds the whole
# chain: a TPU stage only starts if its estimated duration fits in the
# remaining budget (and its timeout is clamped to the remainder).
BUDGET_MIN=${LDT_BOOTSTRAP_BUDGET_MIN:-0}   # 0 = unlimited (old behavior)
START_TS=$(date +%s)
# fits <est-minutes> <stage-name> -> 0 if the stage may start
fits() {
  [ "$BUDGET_MIN" -le 0 ] && return 0
  local now rem
  now=$(date +%s)
  rem=$(( BUDGET_MIN * 60 - (now - START_TS) ))
  if [ "$rem" -lt $(( $1 * 60 )) ]; then
    mark "SKIP $2: est ${1}m > ${rem}s left of LDT_BOOTSTRAP_BUDGET_MIN=${BUDGET_MIN}m (re-run later)"
    return 1
  fi
  return 0
}
# clamp <default-timeout-s> -> min(default, remaining budget)
clamp() {
  if [ "$BUDGET_MIN" -le 0 ]; then echo "$1"; return; fi
  local now rem
  now=$(date +%s)
  rem=$(( BUDGET_MIN * 60 - (now - START_TS) ))
  [ "$rem" -lt "$1" ] && echo "$rem" || echo "$1"
}

STAGE1_CKPT=experiments/Compressor_Trainer/airplane_synth_stability/checkpt_600.msgpack
COMP_VAE_CKPT=experiments/Compressor_Trainer/completion/plane_synth_smoke/checkpt_30.msgpack
COMP_SDE_CKPT=experiments/Latent_Diffusion_Trainer/completion/plane_synth_smoke/checkpt_300.msgpack

# 1) synthetic ShapeNet stand-in (val/test at 256 so golden gates can run
#    n>=256; the generator is deterministic per (split, index) and extends
#    an existing tree in place)
if [ ! -f data/ShapeNetCore.v2.PC15k/02691156/test/synth_00255.npy ]; then
  mark "make_synth_data"
  env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
      python scripts/make_synth_data.py --train 512 --val 256 --test 256 \
      >> "$LOG" 2>&1 || { mark "ABORT: make_synth_data failed"; exit 1; }
fi

# 2) synthetic ViPC tree (24 views/model — the non-preload loader samples
#    views 0..23 and crashes on a partial tree; --list_views 8 expands the
#    TEST list to 8 views/model = 64 rows so the completion int8 golden
#    gate runs at n=64, not the statistically thin n=8)
vipc_rows=$(wc -l < datasets/ViPC/test_list2.txt 2>/dev/null || echo 0)
if [ ! -f data/ShapeNetViPC-Dataset/ShapeNetViPC-GT/02691156/synth_train_0000/23.dat ] \
   || [ "$vipc_rows" -lt 64 ]; then
  mark "make_synth_vipc"
  rm -rf data/ShapeNetViPC-Dataset
  env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
      python scripts/make_synth_vipc.py --views 24 --list_views 8 \
      >> "$LOG" 2>&1 \
      || { mark "ABORT: make_synth_vipc failed"; exit 1; }
fi

# 3) stage-1 compressor, 600 epochs (~67 min on v5e; pretrain for both the
#    stage-2 twins and the completion VAE)
if [ ! -f "$STAGE1_CKPT" ]; then
  fits 75 "stage1" || exit 0
  mark "stage1 start"
  env JAX_PLATFORMS= PYTHONUNBUFFERED=1 timeout "$(clamp 7200)" \
      python train_Compressor.py --dataset airplane_synth_stability \
      >> "$LOG" 2>&1
  mark "stage1 rc=$?"
fi
[ -f "$STAGE1_CKPT" ] || { mark "ABORT: stage1 checkpoint missing"; exit 1; }

if [ "${1:-}" != "--full" ]; then
  mark "DONE (data + stage-1; pass --full for the completion chain)"
  exit 0
fi

# 4) completion compressor (30 epochs, bootstraps from stage-1)
if [ ! -f "$COMP_VAE_CKPT" ]; then
  fits 45 "completion-vae" || exit 0
  mark "completion-vae start"
  env JAX_PLATFORMS= PYTHONUNBUFFERED=1 timeout "$(clamp 5400)" \
      python train_Completion_Compressor.py --dataset plane_synth_smoke \
      >> "$LOG" 2>&1
  mark "completion-vae rc=$?"
fi
[ -f "$COMP_VAE_CKPT" ] || { mark "ABORT: completion VAE missing"; exit 1; }

# 5) completion stage-2 (300 epochs, frozen completion VAE)
if [ ! -f "$COMP_SDE_CKPT" ]; then
  fits 40 "completion-sde" || exit 0
  mark "completion-sde start"
  env JAX_PLATFORMS= PYTHONUNBUFFERED=1 timeout "$(clamp 10800)" \
      python train_Completion_Latent_Diffusion.py --dataset plane_synth_smoke \
      >> "$LOG" 2>&1
  mark "completion-sde rc=$?"
fi
[ -f "$COMP_SDE_CKPT" ] || { mark "ABORT: completion stage-2 missing"; exit 1; }
mark "DONE (full chain)"
