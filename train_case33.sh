#!/bin/bash
# Launch the 7-algorithm case33 sweep (reference train_case33.sh analog).
# The reference farms processes across GPUs with CUDA_VISIBLE_DEVICES;
# with a single TPU host the runs go sequentially by default, or spread
# them across hosts/slices yourself. Each run is internally parallel over
# --n-envs vectorized environments.  (Single-host tip: scripts/train_zoo.py
# runs the whole sweep in ONE process, avoiding per-process device-lease
# reacquisition.)
set -e
SCENARIO=case33_3min_final
BARRIER=${BARRIER:-bowl}
NENVS=${NENVS:-256}
for ALG in iddpg maddpg matd3 ippo mappo coma sqddpg; do
  python train.py --alg "$ALG" --mode distributed --scenario "$SCENARIO" \
    --voltage-barrier-type "$BARRIER" --n-envs "$NENVS" \
    --alias "sweep" "$@" 2>&1 | tee "train_${SCENARIO}_${ALG}.log"
done
