#!/bin/bash
# Pending TPU measurements queued during the round-3 tunnel outage.
# Fire when the relay is back (`timeout 180 python -c "import jax;
# print(jax.devices())"` answers). One jax process at a time; results
# append to /tmp/tpu_queue.log.
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/tpu_queue.log
mark() { echo "=== $* $(date -u +%H:%M:%S) ===" >> $LOG; }
# 1) ELEMS attention sweep (default 1 vs 2 vs 4), 2 reps each
for e in 1 2 4; do
  mark "ELEMS=$e start"
  env JAX_PLATFORMS="" LDT_ATTN_ELEMS=$e LDT_BENCH_REPS=2 \
      timeout 2700 python bench.py >> $LOG 2>&1
  mark "ELEMS=$e rc=$? end"
done
# 2) bf16 Adam-moment storage: stage-2 update perf vs f32 control
for m in bf16 f32; do
  mark "moments=$m start"
  env JAX_PLATFORMS="" timeout 1800 python scripts/bench_train_step.py \
      --moments $m >> $LOG 2>&1
  mark "moments=$m rc=$? end"
done
# 3) stage-1 step: steady rate + op profile
mark "stage1 start"
env JAX_PLATFORMS="" timeout 2400 python scripts/bench_stage1_step.py \
    --profile /tmp/s1_prof >> $LOG 2>&1
mark "stage1 rc=$? end"
# 4) re-gate completion int8 after the ConditionNet k fix (conditional
#    forward architecture changed: k = 128//patch*2, was N//patch*2)
mark "regate-completion start"
env JAX_PLATFORMS="" timeout 2700 python scripts/int8_golden_gate.py \
    --completion \
    --exp experiments/Latent_Diffusion_Trainer/completion/plane_synth_smoke \
    >> $LOG 2>&1
mark "regate-completion rc=$? end"
echo "QUEUE DONE" >> $LOG
