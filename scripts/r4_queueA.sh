#!/bin/bash
# Round-4 queue A (VERDICT r3 item 1): regenerate the completion smoke
# checkpoint chain lost to the container reset, then re-certify the
# completion int8 golden gate after the ConditionNet k fix.
#
# The chain rebuild (synth data -> stage-1 -> completion VAE -> completion
# stage-2) lives in bootstrap_after_reset.sh — one guarded copy, shared
# with every other queue. This script adds only the gate itself.
# One jax process at a time (single-client tunnel). Log: /tmp/r4_queueA.log
set -u
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/r4_queueA.log
mark() { echo "=== $* $(date -u +%H:%M:%S) ===" >> "$LOG"; }

bash scripts/bootstrap_after_reset.sh --full >> "$LOG" 2>&1 \
    || { mark "ABORT: bootstrap failed (see /tmp/bootstrap.log)"; exit 1; }

# the re-gate itself (45 min budget; n = test-list rows, 64 with the
# bootstrap's --list_views 8)
mark "regate-completion start"
env JAX_PLATFORMS= PYTHONUNBUFFERED=1 timeout 2700 \
    python scripts/int8_golden_gate.py --completion \
    --exp experiments/Latent_Diffusion_Trainer/completion/plane_synth_smoke \
    --num 64 >> "$LOG" 2>&1
mark "regate-completion rc=$?"
echo "QUEUE A DONE" >> "$LOG"
