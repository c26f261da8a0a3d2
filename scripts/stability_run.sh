#!/bin/bash
# Long-horizon stage-1 stability run (VERDICT round-1, item 2a):
# flagship Compressor config on the fixed synthetic airplane dataset,
# 600 epochs end-to-end on the real TPU — loss/metric trajectories land in
# experiments/Compressor_Trainer/airplane_synth_stability/training.csv and
# eval.csv; the divergence watchdog and warm-up+cosine LR schedule run
# exactly as in a real training.
set -u
cd /root/repo
# dataset generation is CPU-only (no tunnel): gate out the axon plugin
env PALLAS_AXON_POOL_IPS= PYTHONPATH=/root/repo \
    python scripts/make_synth_data.py --train 512 --val 64 --test 64
exec env JAX_PLATFORMS= python train_Compressor.py \
    --dataset airplane_synth_stability
