#!/bin/bash
# Round-5 TPU queue D — short follow-ups after queue C:
#   1) bench_full_eval --cd-only: symmetric-vs-full CD eval A/B, now that
#      the symmetric tiles are square (the round-5 review found the first
#      cut degenerated to 1x1 tiles at 2048-pt clouds — the A/B was never
#      validly measured on TPU).
#   2) compile_cache_probe: second-process cache-hit timing datapoint.
# One jax process at a time. Log: /tmp/r5_queueD.log
set -u
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/r5_queueD.log
mark() { echo "=== $* $(date -u +%H:%M:%S) ===" | tee -a "$LOG"; }

mark "cd-only A/B start"
env JAX_PLATFORMS= PYTHONUNBUFFERED=1 timeout 3600 \
    python scripts/bench_full_eval.py --cd-only --num 256 --batch 64 \
    >> "$LOG" 2>&1
mark "cd-only A/B rc=$?"

mark "compile cache probe start"
env JAX_PLATFORMS= PYTHONUNBUFFERED=1 timeout 1800 \
    python scripts/compile_cache_probe.py >> "$LOG" 2>&1
mark "compile cache probe rc=$?"
mark "QUEUE D DONE"
