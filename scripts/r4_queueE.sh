#!/bin/bash
# Round-4 queue E: rebuild the experiment chain lost to the second container
# reset and finish VERDICT r3 items 6+7 — the moment-dtype twins (400 ep,
# LDT_TRAIN_FUSED=0 per the compiler-update wedge in CLAUDE.md) and the
# DDIM-50 int8 bf16-tail gates — then a same-session bench control.
#
# One jax process at a time (single-client tunnel). Results append to
# /tmp/r4_queueE.log. Every step is guarded on its input checkpoint.
set -u
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/r4_queueE.log
mark() { echo "=== $* $(date -u +%H:%M:%S) ===" >> "$LOG"; }

STAGE1_CKPT=experiments/Compressor_Trainer/airplane_synth_stability/checkpt_600.msgpack
CTL_DIR=experiments/Latent_Diffusion_Trainer/airplane_synth_m32ctl
BF16_DIR=experiments/Latent_Diffusion_Trainer/airplane_synth_mbf16

# 0) synthetic stand-in data (CPU-only; regenerate only if missing)
if [ ! -d data/ShapeNetCore.v2.PC15k/02691156/train ]; then
  mark "make_synth_data"
  env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
      python scripts/make_synth_data.py --train 512 --val 64 --test 64 \
      >> "$LOG" 2>&1
fi

# 1) stage-1 synthetic stability compressor (pretrain for the twins)
if [ ! -f "$STAGE1_CKPT" ]; then
  mark "stage1 start"
  env JAX_PLATFORMS= PYTHONUNBUFFERED=1 timeout 7200 \
      python train_Compressor.py --dataset airplane_synth_stability \
      >> "$LOG" 2>&1
  mark "stage1 rc=$?"
fi
if [ ! -f "$STAGE1_CKPT" ]; then
  mark "ABORT: stage1 checkpoint missing"; exit 1
fi

# 2) stage-2 moment-dtype twins (400 ep each, shared XLA-attention fallback
#    so the comparison stays apples-to-apples; the fused-bwd flagship update
#    compile wedges on the updated tunnel-side compiler)
for d in "$CTL_DIR" "$BF16_DIR"; do
  name=$(basename "$d")
  if [ -s "$d/checkpt_400.msgpack" ]; then
    mark "stage2 $name SKIPPED: checkpoint exists"
    continue
  fi
  rm -f "$d"/checkpt_*.msgpack "$d"/training.csv "$d"/eval.csv
  mark "stage2 $name start (TRAIN_FUSED=0)"
  env JAX_PLATFORMS= PYTHONUNBUFFERED=1 LDT_TRAIN_FUSED=0 timeout 10800 \
      python train_Latent_Diffusion.py --dataset "$name" >> "$LOG" 2>&1
  mark "stage2 $name rc=$?"
done

# 3) DDIM-50 int8 bf16-tail gates (n=256) on the f32-moment control
if [ -s "$CTL_DIR/checkpt_400.msgpack" ]; then
  for tail in 4 8; do
    mark "ddim50-tail$tail start"
    env JAX_PLATFORMS= PYTHONUNBUFFERED=1 LDT_INT8_BF16_TAIL=$tail \
        timeout 3600 python scripts/int8_golden_gate.py --exp "$CTL_DIR" \
        --epoch 400 --num 256 --steps 50 --predictor ddim >> "$LOG" 2>&1
    mark "ddim50-tail$tail rc=$?"
  done
else
  mark "gates SKIPPED: no stage-2 control checkpoint"
fi

# 4) same-session bench control (default int8 + E=4 headline)
mark "bench control start"
env JAX_PLATFORMS= PYTHONUNBUFFERED=1 timeout 3600 python bench.py \
    >> "$LOG" 2>&1
mark "bench control rc=$?"
echo "QUEUE E DONE" >> "$LOG"
