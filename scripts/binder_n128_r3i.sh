#!/bin/bash
# Campaign r3i (optional, after r3h): fourth system size N=128 for the
# Binder FSS fit - adds the ratio-2 (64,128) pair crossing. Two-sided
# mini-ladders over the crossing window only (theta = 0.85, 0.875, 0.9);
# N=128 needs solve_dtype=float64 (auto-defaulted at V>=500) and runs at
# ~18 ms/SR-iteration, so an 8k block is ~2.5 min.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
CONV=scripts/binder_converge_bm.sh

train_cold() { # THETA VER SEED
  local T=$1 VER=$2 SEED=$3
  for attempt in 1 2 3; do
    timeout 5400 python -m neural_network_quantum_state_tpu.drivers.train \
      -model=LICH -ansatz=rbmtrsymm -L=128 -nf=4 -theta=$T -alpha=2.5 -ver=$VER \
      -ns=8192 -niter=8000 -nwarm=500 -lr=1e-2 -nbeta=4 -fused=1 -blockmoves=1 \
      -path=runs -nrec=2000 -seed=$SEED | tail -1 && return 0
    echo "train_cold attempt $attempt failed; sleeping 120s" >&2
    sleep 120
  done
}

train_warm() { # THETA VER FROMPREFIX SEED
  local T=$1 VER=$2 FROM=$3 SEED=$4
  for attempt in 1 2 3; do
    timeout 5400 python -m neural_network_quantum_state_tpu.drivers.train \
      -model=LICH -ansatz=rbmtrsymm -L=128 -nf=4 -theta=$T -alpha=2.5 -ver=$VER \
      -ns=8192 -niter=8000 -nwarm=500 -lr=1e-2 -nbeta=4 -fused=1 -blockmoves=1 \
      -ifprefix=$FROM -path=runs -nrec=2000 -seed=$SEED | tail -1 && return 0
    echo "train_warm attempt $attempt failed; sleeping 120s" >&2
    sleep 120
  done
}

echo "#### N=128 from-below ladder (V14) ####"
train_cold 0.7 14 101
bash $CONV 128 0.7 14 2 0.005
PREV=RBMTrSymmLICH-L128NF4A2.5T0.7V14
for T in 0.85 0.875 0.9; do
  train_warm $T 14 $PREV 101
  bash $CONV 128 $T 14 5 0.005
  PREV=RBMTrSymmLICH-L128NF4A2.5T${T}V14
done

echo "#### N=128 from-above ladder (V15) ####"
train_cold 1.2 15 102
bash $CONV 128 1.2 15 2 0.005
PREV=RBMTrSymmLICH-L128NF4A2.5T1.2V15
for T in 0.95 0.9 0.875 0.85; do
  train_warm $T 15 $PREV 102
  bash $CONV 128 $T 15 5 0.005
  PREV=RBMTrSymmLICH-L128NF4A2.5T${T}V15
done

echo "#### N=128 final measurement pass ####"
bash scripts/binder_final_measure.sh 128 "0.7 0.85 0.875 0.9 0.95 1.2" logs/measure_stag_N128_final.log
echo "#### N128 r3i DONE ####"
