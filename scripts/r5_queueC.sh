#!/bin/bash
# Round-5 TPU queue C — post-reset evidence rebuild (fourth container
# reset; data/ + every checkpoint + .jax_cache wiped again). Dependency
# order, one jax process at a time (single-client tunnel):
#   1) bootstrap --full: synth data -> stage-1 600ep -> completion VAE
#      30ep -> completion stage-2 300ep (all guarded/resumable)
#   2) stage-2 m32ctl 400ep (uncond flagship twin; auto train-fused guard)
#   3) uncond int8 golden gate n=256 -> stamp next to checkpt_400
#   4) completion int8 golden gate -> stamp
#   5) plain bench (session control + repopulates .jax_cache for the
#      driver's end-of-round run)
#   6) trained-checkpoint bench control (LDT_BENCH_CKPT)
#
# Wall-budget guard: stages only start while the elapsed time is under
# LDT_QUEUE_BUDGET_MIN (default 360) so an unattended chain can never
# collide with the driver's end-of-round bench on the single-client TPU.
# Log: /tmp/r5_queueC.log
set -u
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/r5_queueC.log
mark() { echo "=== $* $(date -u +%H:%M:%S) ===" | tee -a "$LOG"; }

BUDGET_MIN=${LDT_QUEUE_BUDGET_MIN:-360}
START_TS=$(date +%s)
fits() {  # fits <est-minutes> <stage> -> 0 if the stage may start
  local rem=$(( BUDGET_MIN * 60 - ($(date +%s) - START_TS) ))
  if [ "$rem" -lt $(( $1 * 60 )) ]; then
    mark "SKIP $2: est ${1}m > ${rem}s left of budget ${BUDGET_MIN}m"
    return 1
  fi
}

STAGE1_CKPT=experiments/Compressor_Trainer/airplane_synth_stability/checkpt_600.msgpack
CTL_DIR=experiments/Latent_Diffusion_Trainer/airplane_synth_m32ctl
COMP_DIR=experiments/Latent_Diffusion_Trainer/completion/plane_synth_smoke

# 1) full chain rebuild (internally guarded + budget-clamped)
mark "bootstrap --full start"
LDT_BOOTSTRAP_BUDGET_MIN=$BUDGET_MIN bash scripts/bootstrap_after_reset.sh --full \
  >> "$LOG" 2>&1
mark "bootstrap rc=$?"
[ -f "$STAGE1_CKPT" ] || { mark "ABORT: stage-1 checkpoint missing"; exit 1; }

# 2) uncond stage-2 flagship twin (the gate + trained-bench checkpoint)
if [ -s "$CTL_DIR/checkpt_400.msgpack" ]; then
  mark "stage2 m32ctl SKIPPED: checkpoint exists"
else
  fits 50 "stage2-m32ctl" || exit 0
  rm -f "$CTL_DIR"/checkpt_*.msgpack "$CTL_DIR"/training.csv "$CTL_DIR"/eval.csv
  mark "stage2 m32ctl start (auto train-fused guard)"
  env JAX_PLATFORMS= PYTHONUNBUFFERED=1 timeout 10800 \
      python train_Latent_Diffusion.py --dataset airplane_synth_m32ctl \
      >> "$LOG" 2>&1
  mark "stage2 m32ctl rc=$?"
fi

# 3) uncond int8 gate -> stamp
if [ -s "$CTL_DIR/checkpt_400.msgpack" ] \
   && [ ! -s "$CTL_DIR/checkpt_400.msgpack.int8_gate.json" ]; then
  fits 60 "int8-gate-uncond" && {
    mark "int8 gate (uncond) start"
    env JAX_PLATFORMS= PYTHONUNBUFFERED=1 timeout 5400 \
        python scripts/int8_golden_gate.py --exp "$CTL_DIR" --epoch 400 \
        --num 256 >> "$LOG" 2>&1
    mark "int8 gate (uncond) rc=$?"
  }
fi

# 4) completion int8 gate -> stamp
if [ -s "$COMP_DIR/checkpt_300.msgpack" ] \
   && [ ! -s "$COMP_DIR/checkpt_300.msgpack.int8_gate.json" ]; then
  fits 45 "int8-gate-completion" && {
    mark "int8 gate (completion) start"
    env JAX_PLATFORMS= PYTHONUNBUFFERED=1 timeout 5400 \
        python scripts/int8_golden_gate.py --completion --exp "$COMP_DIR" \
        >> "$LOG" 2>&1
    mark "int8 gate (completion) rc=$?"
  }
fi

# 5) plain bench control (also repopulates .jax_cache for the driver)
fits 40 "bench-plain" && {
  mark "bench plain start"
  env JAX_PLATFORMS= PYTHONUNBUFFERED=1 LDT_BENCH_REPS=3 timeout 3600 \
      python bench.py >> "$LOG" 2>&1
  mark "bench plain rc=$?"
}

# 6) trained-checkpoint bench control
if [ -s "$CTL_DIR/checkpt_400.msgpack" ]; then
  fits 30 "bench-trained" && {
    mark "bench trained-ckpt start"
    env JAX_PLATFORMS= PYTHONUNBUFFERED=1 LDT_BENCH_REPS=3 \
        LDT_BENCH_CKPT="$CTL_DIR" timeout 3600 python bench.py \
        >> "$LOG" 2>&1
    mark "bench trained-ckpt rc=$?"
  }
fi
mark "QUEUE C DONE"
