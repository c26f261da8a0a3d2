#!/bin/bash
# Round-5 TPU queue A — VERDICT r4 item #6: eval-EMD pair-batch sweep at
# tile=128 (pairs=1/2/4 fit the 16 MB VMEM budget that OOM'd tile=256 at
# pairs=2), with a same-session tile=256/pairs=1 control (the shipped
# default, 731 pairs/s round-4). One process per point (env knobs are read
# at import). Results -> /tmp/r5_queueA.log.
#
# Usage: bash scripts/r5_queueA.sh
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r5_queueA.log
: > "$LOG"

run() {
  local label="$1"; shift
  echo "=== $label ($(date -u +%H:%M:%S)) ===" | tee -a "$LOG"
  timeout 1800 env JAX_PLATFORMS="" "$@" 2>&1 | tail -6 | tee -a "$LOG"
  echo "" | tee -a "$LOG"
}

# control first (shipped default), then the sweep points
run "ctl tile=256 pairs=1" python scripts/bench_eval_pairs.py --emd-only
run "tile=128 pairs=1" env LDT_EMD_PALLAS_TILE=128 \
  python scripts/bench_eval_pairs.py --emd-only
run "tile=128 pairs=2" env LDT_EMD_PALLAS_TILE=128 LDT_EMD_PALLAS_PAIRS=2 \
  python scripts/bench_eval_pairs.py --emd-only
run "tile=128 pairs=4" env LDT_EMD_PALLAS_TILE=128 LDT_EMD_PALLAS_PAIRS=4 \
  python scripts/bench_eval_pairs.py --emd-only

echo "=== queue A done ($(date -u +%H:%M:%S)) ===" | tee -a "$LOG"
