#!/bin/bash
# Round-5 TPU queue E — STATIC activation-scale int8 evaluation
# (LDT_INT8_STATIC, ldt_tpu/serving/int8.py::calibrate_act_scales):
#   1) calibrate per-step scales from the m32ctl 400-epoch checkpoint
#   2) golden gate under LDT_INT8_STATIC=1 (writes a static_act stamp
#      entry next to the checkpoint — the dynamic entry is preserved)
#   3) bench A/B: LDT_BENCH_INT8_STATIC=1 vs the queue-C dynamic control
# Run AFTER queue C/D (single-client tunnel). Log: /tmp/r5_queueE.log
set -u
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/r5_queueE.log
mark() { echo "=== $* $(date -u +%H:%M:%S) ===" | tee -a "$LOG"; }

CTL_DIR=experiments/Latent_Diffusion_Trainer/airplane_synth_m32ctl
CKPT=$CTL_DIR/checkpt_400.msgpack
[ -s "$CKPT" ] || { mark "ABORT: no checkpoint $CKPT"; exit 1; }

mark "calibrate start"
env JAX_PLATFORMS= PYTHONUNBUFFERED=1 timeout 3600 \
    python scripts/int8_calibrate.py --exp "$CTL_DIR" --epoch 400 \
    >> "$LOG" 2>&1
mark "calibrate rc=$?"
[ -s "$CKPT.int8_act_scales.npz" ] || { mark "ABORT: no scales"; exit 1; }

mark "static gate start"
env JAX_PLATFORMS= PYTHONUNBUFFERED=1 LDT_INT8_STATIC=1 timeout 5400 \
    python scripts/int8_golden_gate.py --exp "$CTL_DIR" --epoch 400 \
    --num 256 >> "$LOG" 2>&1
mark "static gate rc=$?"

mark "bench static start"
env JAX_PLATFORMS= PYTHONUNBUFFERED=1 LDT_BENCH_REPS=3 \
    LDT_BENCH_INT8_STATIC=1 timeout 3600 python bench.py >> "$LOG" 2>&1
mark "bench static rc=$?"
mark "QUEUE E DONE"
