#!/bin/bash
# Round-4 queue F2: retry of queue F's failed steps after two fixes —
# (1) the per-pair Pallas CD kernel's 1-D min-reduce tripped a Mosaic
# relayout bug on v5e (now keepdims/2-D), (2) tile-512 Pallas EMD is a
# recorded negative (scoped-VMEM OOM: 18.02M > 16M), so EMD runs stay at
# the default tile 256. Control rates from the same session (queue F,
# cdpallas=0): CD 1747 pairs/s, CD+EMD 513 pairs/s.
set -u
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/r4_queueF2.log
mark() { echo "=== $* $(date -u +%H:%M:%S) ===" >> "$LOG"; }

# 1) fixed CD kernel: parity on real TPU first
mark "cd-pallas-parity start"
env JAX_PLATFORMS= PYTHONUNBUFFERED=1 timeout 1200 python - >> "$LOG" 2>&1 <<'PYEOF'
import numpy as np, sys
sys.path.insert(0, ".")
import jax, jax.numpy as jnp
from ldt_tpu.ops import chamfer as ch
rng = np.random.RandomState(0)
x = rng.uniform(0, 1, size=(4, 2048, 3)).astype(np.float32)
y = rng.uniform(0, 1, size=(4, 2048, 3)).astype(np.float32)
d1, d2, _, _ = ch.chamfer_distance(jnp.asarray(x), jnp.asarray(y))
want = np.asarray(jnp.mean(d1, axis=1) + jnp.mean(d2, axis=1))
got = np.asarray(ch.pairwise_cd_means_pallas(jnp.asarray(x), jnp.asarray(y)))
rel = np.abs(got - want) / np.maximum(np.abs(want), 1e-9)
print(f"[cd-pallas] max rel {rel.max():.2e}")
assert rel.max() < 1e-4, rel
print("[cd-pallas] parity OK")
PYEOF
mark "cd-pallas-parity rc=$?"

# 2) CD-kernel rate
mark "eval-pairs cdpallas=1 start"
env JAX_PLATFORMS= PYTHONUNBUFFERED=1 LDT_EVAL_CD_PALLAS=1 timeout 1800 \
    python scripts/bench_eval_pairs.py >> "$LOG" 2>&1
mark "eval-pairs cdpallas=1 rc=$?"

# 3) EMD kernel at default tile 256 (re-confirm round-4's +20% same-session)
mark "eval-pairs emdpallas=1 start"
env JAX_PLATFORMS= PYTHONUNBUFFERED=1 LDT_EVAL_EMD_PALLAS=1 timeout 1800 \
    python scripts/bench_eval_pairs.py >> "$LOG" 2>&1
mark "eval-pairs emdpallas=1 rc=$?"

# 4) combined best-known config (tile 256)
mark "eval-pairs combined start"
env JAX_PLATFORMS= PYTHONUNBUFFERED=1 LDT_EVAL_CD_PALLAS=1 \
    LDT_EVAL_EMD_PALLAS=1 timeout 1800 \
    python scripts/bench_eval_pairs.py >> "$LOG" 2>&1
mark "eval-pairs combined rc=$?"
echo "QUEUE F2 DONE" >> "$LOG"
