#!/bin/bash
# Round-4 queue H: close out the eval-EMD sweep (queue G follow-up).
#
# Queue G results (/tmp/queueG.log, 2026-08-20): XLA control 521 pairs/s;
# best survivor otf-pt2-t256 at 756 (+45%); pallas-pt2-t256 and otf-pt4-*
# died of scoped-VMEM OOM (16.02M vs 16.00M — tuning limits, not bugs);
# cd-pallas 2050 vs 1796 XLA (+14%). Queue G's parity step crashed at the
# non-otf pt=2 OOM BEFORE testing any OTF point, so the winner is unproven
# on device. This queue: (1) on-device parity for the OTF points actually
# shippable, (2) one more tile point for the winner, (3) the best-combo
# rerun with the OTF winner instead of the OOMing non-otf pt2.
#
# Fire only when the tunnel is free (single client!). Log: /tmp/queueH.log
set -u
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/queueH.log
mark() { echo "=== $* $(date -u +%H:%M:%S) ===" | tee -a "$LOG"; }

run_pairs() { # name, then env assignments and/or --flags for the script
  local name=$1; shift
  local envs=() extra=()
  for a in "$@"; do case $a in --*) extra+=("$a");; *) envs+=("$a");; esac; done
  mark "eval-pairs $name"
  env JAX_PLATFORMS= PYTHONUNBUFFERED=1 ${envs[@]+"${envs[@]}"} timeout 1200 \
      python scripts/bench_eval_pairs.py ${extra[@]+"${extra[@]}"} >> "$LOG" 2>&1
  mark "eval-pairs $name rc=$?"
}

mark "OTF on-device parity (pt 1/2 vs XLA form)"
env JAX_PLATFORMS= PYTHONUNBUFFERED=1 timeout 1200 python - >> "$LOG" 2>&1 <<'PYEOF'
import numpy as np, jax, jax.numpy as jnp
from ldt_tpu.ops import emd as emd_mod
rng = np.random.RandomState(0)
x = rng.uniform(0, 1, size=(6, 2048, 3)).astype(np.float32)
y = rng.uniform(0, 1, size=(6, 2048, 3)).astype(np.float32)
want = np.asarray(jax.vmap(emd_mod._approx_match_cost_single)(
    jnp.asarray(x), jnp.asarray(y)))
emd_mod._EMD_OTF = True
for pt, tile in ((1, 256), (2, 256)):
    emd_mod._EMD_PAIRS, emd_mod._EMD_TILE = pt, tile
    got = np.asarray(emd_mod._approx_match_cost_pallas(
        jnp.asarray(x), jnp.asarray(y)))
    err = float(np.max(np.abs(got - want) / np.abs(want)))
    print(f"[parity] otf pt={pt} tile={tile}: max rel err {err:.2e}", flush=True)
    assert err < 2e-5, (pt, tile, err)
print("[parity] OK")
PYEOF
mark "parity rc=$?"

# one more tile point for the winner (VMEM: OTF holds clouds + per-pair
# state, not d tiles — t512 died only at pt4)
run_pairs "otf-pt2-t512"  LDT_EVAL_EMD_PALLAS=1 LDT_EMD_PALLAS_OTF=1 LDT_EMD_PALLAS_PAIRS=2 LDT_EMD_PALLAS_TILE=512 --emd-only
# best-combo rerun: queue G's combo used the OOMing non-otf pt2
run_pairs "cd+emd-best-combo" LDT_EVAL_CD_PALLAS=1 LDT_EVAL_EMD_PALLAS=1 LDT_EMD_PALLAS_OTF=1 LDT_EMD_PALLAS_PAIRS=2
mark "DONE"
