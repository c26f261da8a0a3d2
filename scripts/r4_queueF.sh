#!/bin/bash
# Round-4 queue F: the eval-kernel measurements queue C never got tunnel
# time for (chained after r4_queueE.sh). Parity on real TPU first, then
# pairs/s rates for: Pallas eval-EMD at tile 512, the per-pair Pallas CD
# kernel, and the combined best-known eval config; then a refreshed serving
# per-op profile. Every step is independent — a failure marks rc and moves
# on. Results append to /tmp/r4_queueF.log.
set -u
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/r4_queueF.log
mark() { echo "=== $* $(date -u +%H:%M:%S) ===" >> "$LOG"; }

# 1) Pallas eval-EMD at tile 512: parity then rate
mark "emd-pallas-512-parity start"
env JAX_PLATFORMS= PYTHONUNBUFFERED=1 LDT_EMD_PALLAS_TILE=512 \
    timeout 1200 python - >> "$LOG" 2>&1 <<'PYEOF'
import numpy as np, sys
sys.path.insert(0, ".")
import jax, jax.numpy as jnp
from ldt_tpu.ops import emd as emd_mod
rng = np.random.RandomState(0)
x = rng.uniform(0, 1, size=(4, 2048, 3)).astype(np.float32)
y = rng.uniform(0, 1, size=(4, 2048, 3)).astype(np.float32)
want = np.asarray(jax.vmap(emd_mod._approx_match_cost_single)(jnp.asarray(x), jnp.asarray(y)))
got = np.asarray(emd_mod._approx_match_cost_pallas(jnp.asarray(x), jnp.asarray(y)))
rel = np.abs(got - want) / np.maximum(np.abs(want), 1e-9)
print(f"[emd-pallas-512] max rel {rel.max():.2e}")
assert rel.max() < 1e-4, rel
print("[emd-pallas-512] parity OK")
PYEOF
mark "emd-pallas-512-parity rc=$?"
mark "eval-pairs emd-pallas-512 start"
env JAX_PLATFORMS= PYTHONUNBUFFERED=1 LDT_EVAL_EMD_PALLAS=1 \
    LDT_EMD_PALLAS_TILE=512 timeout 1800 \
    python scripts/bench_eval_pairs.py >> "$LOG" 2>&1
mark "eval-pairs emd-pallas-512 rc=$?"

# 2) per-pair Pallas CD kernel: parity then rate (vs XLA control)
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
for ck in 1 0; do
  mark "eval-pairs cdpallas=$ck start"
  env JAX_PLATFORMS= PYTHONUNBUFFERED=1 LDT_EVAL_CD_PALLAS=$ck \
      timeout 1800 python scripts/bench_eval_pairs.py >> "$LOG" 2>&1
  mark "eval-pairs cdpallas=$ck rc=$?"
done

# 3) combined best-known eval config
mark "eval-pairs combined start"
env JAX_PLATFORMS= PYTHONUNBUFFERED=1 LDT_EVAL_CD_PALLAS=1 \
    LDT_EVAL_EMD_PALLAS=1 LDT_EMD_PALLAS_TILE=512 timeout 1800 \
    python scripts/bench_eval_pairs.py >> "$LOG" 2>&1
mark "eval-pairs combined rc=$?"

# 4) refreshed serving per-op profile at the shipping default
mark "sampler-profile start"
env JAX_PLATFORMS= PYTHONUNBUFFERED=1 timeout 2400 \
    python scripts/profile_sampler.py >> "$LOG" 2>&1
mark "sampler-profile rc=$?"
echo "QUEUE F DONE" >> "$LOG"
