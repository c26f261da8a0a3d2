#!/bin/bash
# Round-4 queue A (VERDICT r3 item 1): regenerate the completion smoke
# checkpoint chain lost to the container reset, then re-certify the
# completion int8 golden gate after the ConditionNet k fix.
#
# One jax process at a time (single-client tunnel). Results append to
# /tmp/r4_queueA.log. Every step is guarded on its input checkpoint so a
# failed stage can't burn tunnel time on a guaranteed-to-fail successor
# (ADVICE r3 item 4).
set -u
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/r4_queueA.log
mark() { echo "=== $* $(date -u +%H:%M:%S) ===" >> "$LOG"; }

STAGE1_CKPT=experiments/Compressor_Trainer/airplane_synth_stability/checkpt_600.msgpack
COMP_VAE_CKPT=experiments/Compressor_Trainer/completion/plane_synth_smoke/checkpt_30.msgpack
COMP_SDE_DIR=experiments/Latent_Diffusion_Trainer/completion/plane_synth_smoke
COMP_SDE_CKPT=$COMP_SDE_DIR/checkpt_300.msgpack

# 0) synthetic stand-in data (CPU-only; regenerate only if missing)
if [ ! -d data/ShapeNetCore.v2.PC15k/02691156/train ]; then
  mark "make_synth_data"
  env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
      python scripts/make_synth_data.py --train 512 --val 64 --test 64 \
      >> "$LOG" 2>&1
fi
# the non-preload loader samples views 0..23 (reference ViPC.py parity),
# so the tree must have TRAIN models with all 24 views — a partial tree
# (test-only, or 8 views) crashes the loader mid-epoch
if [ ! -f data/ShapeNetViPC-Dataset/ShapeNetViPC-GT/02691156/synth_train_0000/23.dat ]; then
  mark "make_synth_vipc"
  rm -rf data/ShapeNetViPC-Dataset
  env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
      python scripts/make_synth_vipc.py --views 24 >> "$LOG" 2>&1
fi

# 1) stage-1 synthetic stability compressor (pretrain for the completion VAE)
if [ ! -f "$STAGE1_CKPT" ]; then
  mark "stage1 start"
  env JAX_PLATFORMS= timeout 7200 python train_Compressor.py \
      --dataset airplane_synth_stability >> "$LOG" 2>&1
  mark "stage1 rc=$?"
fi
if [ ! -f "$STAGE1_CKPT" ]; then
  mark "ABORT: stage1 checkpoint missing"; exit 1
fi

# 2) completion compressor (30 epochs, bootstraps from stage-1)
if [ ! -f "$COMP_VAE_CKPT" ]; then
  mark "completion-vae start"
  env JAX_PLATFORMS= timeout 5400 python train_Completion_Compressor.py \
      --dataset plane_synth_smoke >> "$LOG" 2>&1
  mark "completion-vae rc=$?"
fi
if [ ! -f "$COMP_VAE_CKPT" ]; then
  mark "ABORT: completion VAE checkpoint missing"; exit 1
fi

# 3) completion stage-2 (300 epochs, frozen completion VAE)
if [ ! -f "$COMP_SDE_CKPT" ]; then
  mark "completion-sde start"
  env JAX_PLATFORMS= timeout 10800 python train_Completion_Latent_Diffusion.py \
      --dataset plane_synth_smoke >> "$LOG" 2>&1
  mark "completion-sde rc=$?"
fi
if [ ! -f "$COMP_SDE_CKPT" ]; then
  mark "ABORT: completion stage-2 checkpoint missing"; exit 1
fi

# 4) the re-gate itself (45 min budget)
mark "regate-completion start"
env JAX_PLATFORMS= timeout 2700 python scripts/int8_golden_gate.py \
    --completion --exp "$COMP_SDE_DIR" >> "$LOG" 2>&1
mark "regate-completion rc=$?"
echo "QUEUE A DONE" >> "$LOG"
