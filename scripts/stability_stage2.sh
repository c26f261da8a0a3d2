#!/bin/bash
# Stage-2 long-horizon stability run: 457M latent DiT on the frozen synthetic
# stage-1 compressor (checkpt_600), 400 epochs with periodic 1000-step
# valsample + CD/EMD metrics — run AFTER scripts/stability_run.sh completes.
set -u
cd /root/repo
exec env JAX_PLATFORMS= python train_Latent_Diffusion.py \
    --dataset airplane_synth_stability
