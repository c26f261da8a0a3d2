#!/bin/bash
# Round-5 TPU queue B — VERDICT r4 evidence runs, in dependency order:
#   1) bench (second process): persistent-compile-cache hit timing — the
#      warm-up line should drop from minutes to seconds (VERDICT #4).
#   2) queue A: eval-EMD pair-batch sweep at tile=128 (VERDICT #6).
#   3) stage-2 m32ctl 400 ep retrain WITHOUT LDT_TRAIN_FUSED — live
#      validation that resolve_train_fused auto-falls back at flagship
#      scale instead of wedging the compile (VERDICT weak #1 fix).
#   4) int8 golden gate on the fresh checkpoint — now writes the gate
#      STAMP next to the checkpoint (VERDICT #5).
#   5) bench with LDT_BENCH_CKPT: trained-weight serving control
#      (VERDICT weak #6) + another cache-hit datapoint.
#
# One jax process at a time (single-client tunnel). Log: /tmp/r5_queueB.log
set -u
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/r5_queueB.log
mark() { echo "=== $* $(date -u +%H:%M:%S) ===" | tee -a "$LOG"; }

STAGE1_CKPT=experiments/Compressor_Trainer/airplane_synth_stability/checkpt_600.msgpack
CTL_DIR=experiments/Latent_Diffusion_Trainer/airplane_synth_m32ctl

# 1) cache-hit bench (process 2 of the day: .jax_cache populated by run 1)
mark "bench cache-hit run start"
env JAX_PLATFORMS= PYTHONUNBUFFERED=1 LDT_BENCH_REPS=3 timeout 3600 \
    python bench.py >> "$LOG" 2>&1
mark "bench cache-hit rc=$?"

# 2) eval-EMD pair sweep
mark "queueA (EMD sweep) start"
bash scripts/r5_queueA.sh >> "$LOG" 2>&1
mark "queueA rc=$?"
cat /tmp/r5_queueA.log >> "$LOG" 2>/dev/null

# 3) stage-2 flagship retrain, auto wedge-guard (NO LDT_TRAIN_FUSED set)
if [ ! -f "$STAGE1_CKPT" ]; then
  mark "ABORT: stage-1 checkpoint missing"; exit 1
fi
if [ -s "$CTL_DIR/checkpt_400.msgpack" ]; then
  mark "stage2 m32ctl SKIPPED: checkpoint exists"
else
  rm -f "$CTL_DIR"/checkpt_*.msgpack "$CTL_DIR"/training.csv "$CTL_DIR"/eval.csv
  mark "stage2 m32ctl start (auto train-fused guard)"
  env JAX_PLATFORMS= PYTHONUNBUFFERED=1 timeout 10800 \
      python train_Latent_Diffusion.py --dataset airplane_synth_m32ctl \
      >> "$LOG" 2>&1
  mark "stage2 m32ctl rc=$?"
fi

# 4) int8 golden gate -> stamp
if [ -s "$CTL_DIR/checkpt_400.msgpack" ]; then
  mark "int8 gate start"
  env JAX_PLATFORMS= PYTHONUNBUFFERED=1 timeout 3600 \
      python scripts/int8_golden_gate.py --exp "$CTL_DIR" --epoch 400 \
      --num 256 >> "$LOG" 2>&1
  mark "int8 gate rc=$?"
  ls -la "$CTL_DIR"/checkpt_400.msgpack.int8_gate.json >> "$LOG" 2>&1
else
  mark "int8 gate SKIPPED: no checkpoint"
fi

# 5) trained-weight bench control
if [ -s "$CTL_DIR/checkpt_400.msgpack" ]; then
  mark "bench trained-ckpt start"
  env JAX_PLATFORMS= PYTHONUNBUFFERED=1 LDT_BENCH_REPS=3 \
      LDT_BENCH_CKPT="$CTL_DIR" timeout 3600 python bench.py \
      >> "$LOG" 2>&1
  mark "bench trained-ckpt rc=$?"
else
  mark "bench trained-ckpt SKIPPED: no checkpoint"
fi
mark "QUEUE B DONE"
