#!/bin/bash
# Campaign r3h STAGE B only (N=96 two-sided ladders), split out of
# binder_n96_r3h.sh so the r3j resumption can interleave the Hubbard L=32
# deliverable between the 32/64 crossing work and the third FSS size.
# Explicit PREV chaining (the original stage B picked the anneal source
# with `ls | tail -1`, which sorts T0.85 after T0.875 lexically and so
# annealed theta=0.9 from 0.85 instead of 0.875 - correct protocol, but
# make the ladder order explicit).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
CONV=scripts/binder_converge_bm.sh

train_warm() { # THETA VER FROMPREFIX SEED
  local T=$1 VER=$2 FROM=$3 SEED=$4
  for attempt in 1 2 3; do
    timeout 4500 python -m neural_network_quantum_state_tpu.drivers.train \
      -model=LICH -ansatz=rbmtrsymm -L=96 -nf=4 -theta=$T -alpha=2.5 -ver=$VER \
      -ns=8192 -niter=8000 -nwarm=500 -lr=1e-2 -nbeta=4 -fused=1 -blockmoves=1 \
      -ifprefix=$FROM -path=runs -nrec=2000 -seed=$SEED | tail -1 && return 0
    echo "train_warm attempt $attempt failed; sleeping 120s" >&2
    sleep 120
  done
}

train_cold() { # THETA VER SEED
  local T=$1 VER=$2 SEED=$3
  for attempt in 1 2 3; do
    timeout 4500 python -m neural_network_quantum_state_tpu.drivers.train \
      -model=LICH -ansatz=rbmtrsymm -L=96 -nf=4 -theta=$T -alpha=2.5 -ver=$VER \
      -ns=8192 -niter=8000 -nwarm=500 -lr=1e-2 -nbeta=4 -fused=1 -blockmoves=1 \
      -path=runs -nrec=2000 -seed=$SEED | tail -1 && return 0
    echo "train_cold attempt $attempt failed; sleeping 120s" >&2
    sleep 120
  done
}

echo "#### STAGE B: N=96 two-sided ladders ####"
echo "######## N=96 from-below ladder (V1) ########"
train_cold 0.7 1 97
bash $CONV 96 0.7 1 2 0.005
PREV=RBMTrSymmLICH-L96NF4A2.5T0.7V1
for T in 0.85 0.875 0.9 0.925; do
  train_warm $T 1 $PREV 97
  bash $CONV 96 $T 1 5 0.005
  PREV=RBMTrSymmLICH-L96NF4A2.5T${T}V1
done

echo "######## N=96 from-above ladder (V2) ########"
train_cold 1.2 2 98
bash $CONV 96 1.2 2 2 0.005
PREV=RBMTrSymmLICH-L96NF4A2.5T1.2V2
for T in 0.95 0.925 0.9 0.875 0.85; do
  train_warm $T 2 $PREV 98
  bash $CONV 96 $T 2 5 0.005
  PREV=RBMTrSymmLICH-L96NF4A2.5T${T}V2
done

echo "#### N=96 final measurement pass ####"
bash scripts/binder_final_measure.sh 96 "0.7 0.85 0.875 0.9 0.925 0.95 1.2" logs/measure_stag_N96_final.log
echo "#### N96 STAGE B DONE ####"
