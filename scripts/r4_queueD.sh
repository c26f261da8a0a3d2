#!/bin/bash
# Round-4 queue D: stage-2 twins with the XLA-attention training fallback
# (LDT_TRAIN_FUSED=0). The fused-bwd flagship update compile WEDGES on the
# updated tunnel-side compiler (two twins stuck >20 min at the first step,
# CPU frozen, relay + small compiles healthy; the completion B=8 variant
# compiled fine). The sampler path keeps the fused forward core either way,
# and both twins share the fallback so the moment-dtype comparison stays
# apples-to-apples. Then the DDIM-50 gates + queue C content.
set -u
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/r4_queueB.log
mark() { echo "=== $* $(date -u +%H:%M:%S) ===" >> "$LOG"; }

CTL_DIR=experiments/Latent_Diffusion_Trainer/airplane_synth_m32ctl
BF16_DIR=experiments/Latent_Diffusion_Trainer/airplane_synth_mbf16

for d in "$CTL_DIR" "$BF16_DIR"; do
  name=$(basename "$d")
  if [ -s "$d/checkpt_400.msgpack" ]; then
    mark "stage2D $name SKIPPED: checkpoint exists"
    continue
  fi
  rm -f "$d"/checkpt_*.msgpack "$d"/training.csv "$d"/eval.csv
  mark "stage2D $name start (TRAIN_FUSED=0)"
  env JAX_PLATFORMS= PYTHONUNBUFFERED=1 LDT_TRAIN_FUSED=0 timeout 9000 \
      python train_Latent_Diffusion.py --dataset "$name" >> "$LOG" 2>&1
  mark "stage2D $name rc=$?"
done

if [ -s "$CTL_DIR/checkpt_400.msgpack" ]; then
  for tail in 4 8; do
    mark "ddim50-tail$tail start"
    env JAX_PLATFORMS= PYTHONUNBUFFERED=1 LDT_INT8_BF16_TAIL=$tail \
        timeout 3600 python scripts/int8_golden_gate.py --exp "$CTL_DIR" \
        --epoch 400 --num 256 --steps 50 --predictor ddim >> "$LOG" 2>&1
    mark "ddim50-tail$tail rc=$?"
  done
else
  mark "ddim gates SKIPPED: no ctl checkpoint"
fi
bash scripts/r4_queueC.sh
echo "QUEUE D DONE" >> "$LOG"
