#!/bin/bash
# Trimmed round-3 continuation queue: highest-value TPU measurements first.
# One jax process at a time (single-client tunnel). Results append to
# /tmp/tpu_queue.log.
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/tpu_queue.log
mark() { echo "=== $* $(date -u +%H:%M:%S) ===" >> $LOG; }
# 1) ELEMS attention sweep under the shipping int8 serving path
for e in 2 4 1; do
  mark "ELEMS=$e start"
  env JAX_PLATFORMS="" LDT_ATTN_ELEMS=$e LDT_BENCH_REPS=2 \
      timeout 1800 python bench.py >> $LOG 2>&1
  mark "ELEMS=$e rc=$? end"
done
# 2) re-gate completion int8 after the ConditionNet k fix
mark "regate-completion start"
env JAX_PLATFORMS="" timeout 2700 python scripts/int8_golden_gate.py \
    --completion \
    --exp experiments/Latent_Diffusion_Trainer/completion/plane_synth_smoke \
    >> $LOG 2>&1
mark "regate-completion rc=$? end"
# 3) bf16 Adam-moment storage: stage-2 update perf vs f32 control
for m in bf16 f32; do
  mark "moments=$m start"
  env JAX_PLATFORMS="" timeout 1800 python scripts/bench_train_step.py \
      --moments $m >> $LOG 2>&1
  mark "moments=$m rc=$? end"
done
echo "QUEUE DONE" >> $LOG
