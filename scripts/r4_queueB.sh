#!/bin/bash
# Round-4 queue B: TPU measurements + long-horizon runs, ordered by value.
# Run AFTER scripts/r4_queueA.sh completes (single-client tunnel, one jax
# process at a time). Results -> /tmp/r4_queueB.log.
#
# 1. stage-1 step bench with the compact auction (VERDICT r3 #3): trained
#    regime (checkpt_600 + real synth batch), compact vs dense control.
# 2. serving bench with the int8 attention core (VERDICT #2): experiment
#    vs same-session control.
# 3+4. stage-2 400-epoch twins: f32-moment control + bf16-moment run
#    (VERDICT #7) — the f32 checkpoint also feeds the later gates.
# 5. DDIM-50 int8 re-certification attempts with the bf16-tail mixed
#    scheme at n=256 (VERDICT #6).
# 6. int8-attention golden gate on the fresh checkpoint (ships only if
#    this passes AND step 2 showed a win).
set -u
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/r4_queueB.log
mark() { echo "=== $* $(date -u +%H:%M:%S) ===" >> "$LOG"; }

STAGE1_CKPT=experiments/Compressor_Trainer/airplane_synth_stability/checkpt_600.msgpack
CTL_DIR=experiments/Latent_Diffusion_Trainer/airplane_synth_m32ctl
BF16_DIR=experiments/Latent_Diffusion_Trainer/airplane_synth_mbf16

# --- 1. stage-1 compact-auction bench ---------------------------------
if [ -f "$STAGE1_CKPT" ]; then
  for c in 1 0; do
    mark "stage1-emd compact=$c start"
    env JAX_PLATFORMS= LDT_EMD_COMPACT=$c timeout 2400 \
        python scripts/bench_stage1_step.py --restore 600 --real \
        >> "$LOG" 2>&1
    mark "stage1-emd compact=$c rc=$?"
  done
  # random-regime control (dense phase never exits; must not regress)
  mark "stage1-emd compact=1 randregime start"
  env JAX_PLATFORMS= LDT_EMD_COMPACT=1 timeout 2400 \
      python scripts/bench_stage1_step.py >> "$LOG" 2>&1
  mark "stage1-emd randregime rc=$?"
else
  mark "stage1-emd SKIPPED: no stage-1 checkpoint"
fi

# --- 1b. eval pairwise rates (cost-only EMD restructure, then the
# streaming Pallas kernel variant) --------------------------------------
for pk in 0 1; do
  mark "eval-pairs pallas=$pk start"
  env JAX_PLATFORMS= LDT_EVAL_EMD_PALLAS=$pk timeout 1800 \
      python scripts/bench_eval_pairs.py >> "$LOG" 2>&1
  mark "eval-pairs pallas=$pk rc=$?"
done
# parity spot-check of the Pallas kernel on real hardware (not interpret)
mark "emd-pallas-parity start"
env JAX_PLATFORMS= timeout 900 python - >> "$LOG" 2>&1 <<'PYEOF'
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
print(f"[emd-pallas-parity] max rel {rel.max():.2e} want {want[:2]} got {got[:2]}")
assert rel.max() < 1e-4, rel
print("[emd-pallas-parity] OK")
PYEOF
mark "emd-pallas-parity rc=$?"

# --- 1c. JSD on-device timing (vectorized occupancy grid) --------------
mark "jsd-timing start"
env JAX_PLATFORMS= timeout 900 python - >> "$LOG" 2>&1 <<'PYEOF'
import time, numpy as np, sys
sys.path.insert(0, ".")
from ldt_tpu.eval.metrics import jsd_between_point_cloud_sets
rng = np.random.RandomState(0)
a = rng.randn(128, 2048, 3).astype(np.float32)
a /= np.linalg.norm(a, axis=-1).max() * 1.05
b = rng.randn(128, 2048, 3).astype(np.float32)
b /= np.linalg.norm(b, axis=-1).max() * 1.05
v = jsd_between_point_cloud_sets(a, b, resolution=28)  # compile
t0 = time.perf_counter()
v = jsd_between_point_cloud_sets(a, b, resolution=28)
print(f"[jsd] 256 clouds @ res 28: {time.perf_counter()-t0:.2f} s "
      f"(value {v:.4f})")
PYEOF
mark "jsd-timing rc=$?"

# --- 2. int8 attention core bench (vs control, same session) ----------
for a in 1 0; do
  mark "bench int8attn=$a start"
  env JAX_PLATFORMS= LDT_ATTN_INT8=$a LDT_BENCH_REPS=2 timeout 3600 \
      python bench.py >> "$LOG" 2>&1
  mark "bench int8attn=$a rc=$?"
done

# --- 2b. E=8 phased-attention point (E=4 is the default; the sweep was
# monotone 667.9 / 707.9 / 726.5 for E=1/2/4 — check the knee) ----------
mark "bench elems=8 start"
env JAX_PLATFORMS= LDT_ATTN_ELEMS=8 LDT_BENCH_REPS=2 timeout 3600 \
    python bench.py >> "$LOG" 2>&1
mark "bench elems=8 rc=$?"

# --- 3+4. stage-2 moment-dtype twins (400 epochs each) -----------------
for d in "$CTL_DIR" "$BF16_DIR"; do
  name=$(basename "$d")
  if [ -f "$d/checkpt_400.msgpack" ]; then
    mark "stage2 $name SKIPPED: checkpoint exists"
    continue
  fi
  mark "stage2 $name start"
  env JAX_PLATFORMS= timeout 10800 python train_Latent_Diffusion.py \
      --dataset "$name" >> "$LOG" 2>&1
  mark "stage2 $name rc=$?"
done

# --- 5. DDIM-50 int8 with bf16 tail (n=256) ----------------------------
if [ -f "$CTL_DIR/checkpt_400.msgpack" ]; then
  for tail in 4 8; do
    mark "ddim50-tail$tail start"
    env JAX_PLATFORMS= LDT_INT8_BF16_TAIL=$tail timeout 3600 \
        python scripts/int8_golden_gate.py --exp "$CTL_DIR" --epoch 400 \
        --num 256 --steps 50 --predictor ddim >> "$LOG" 2>&1
    mark "ddim50-tail$tail rc=$?"
  done
  # --- 6. int8-attention golden gate (1000-step ancestral) -------------
  mark "int8attn-gate start"
  env JAX_PLATFORMS= timeout 3600 \
      python scripts/int8_golden_gate.py --exp "$CTL_DIR" --epoch 400 \
      --num 64 --attn-int8 >> "$LOG" 2>&1
  mark "int8attn-gate rc=$?"
else
  mark "gates SKIPPED: no stage-2 control checkpoint"
fi
echo "QUEUE B DONE" >> "$LOG"
