#!/bin/bash
# Third VMC system size for the Binder FSS program: N=96 near-critical
# curve, two-sided at the crossing-deciding thetas (0.9, 0.925) and
# one-sided from the matching phase elsewhere. Run AFTER campaign r3g
# (serial chip). Ladder design:
#   from-below (V1, disordered side): cold train at 0.7, anneal up
#     0.7 -> 0.875 -> 0.9 -> 0.925
#   from-above (V2, ordered side): cold train at 1.2, anneal down
#     1.2 -> 0.95 -> 0.925 -> 0.9
# Each converge call extends in 8k-iteration -resume blocks until the
# tempered Binder moves < 0.005 between blocks.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
CONV=scripts/binder_converge_retry.sh

train_cold() { # THETA VER SEED
  local T=$1 VER=$2 SEED=$3
  for attempt in 1 2 3; do
    timeout 4500 python -m neural_network_quantum_state_tpu.drivers.train \
      -model=LICH -ansatz=rbmtrsymm -L=96 -nf=4 -theta=$T -alpha=2.5 -ver=$VER \
      -ns=8192 -niter=8000 -nwarm=500 -lr=1e-2 -nbeta=4 -fused=1 \
      -path=runs -nrec=2000 -seed=$SEED | tail -1 && return 0
    echo "train_cold attempt $attempt failed; sleeping 120s" >&2
    sleep 120
  done
}

train_warm() { # THETA VER FROMPREFIX SEED
  local T=$1 VER=$2 FROM=$3 SEED=$4
  for attempt in 1 2 3; do
    timeout 4500 python -m neural_network_quantum_state_tpu.drivers.train \
      -model=LICH -ansatz=rbmtrsymm -L=96 -nf=4 -theta=$T -alpha=2.5 -ver=$VER \
      -ns=8192 -niter=8000 -nwarm=500 -lr=1e-2 -nbeta=4 -fused=1 \
      -ifprefix=$FROM -path=runs -nrec=2000 -seed=$SEED | tail -1 && return 0
    echo "train_warm attempt $attempt failed; sleeping 120s" >&2
    sleep 120
  done
}

echo "#### N=96 from-below ladder (V1) ####"
train_cold 0.7 1 97
bash $CONV 96 0.7 1 2 0.005
train_warm 0.875 1 RBMTrSymmLICH-L96NF4A2.5T0.7V1 97
bash $CONV 96 0.875 1 5 0.005
train_warm 0.9 1 RBMTrSymmLICH-L96NF4A2.5T0.875V1 97
bash $CONV 96 0.9 1 6 0.005
train_warm 0.925 1 RBMTrSymmLICH-L96NF4A2.5T0.9V1 97
bash $CONV 96 0.925 1 6 0.005

echo "#### N=96 from-above ladder (V2) ####"
train_cold 1.2 2 98
bash $CONV 96 1.2 2 2 0.005
train_warm 0.95 2 RBMTrSymmLICH-L96NF4A2.5T1.2V2 98
bash $CONV 96 0.95 2 5 0.005
train_warm 0.925 2 RBMTrSymmLICH-L96NF4A2.5T0.95V2 98
bash $CONV 96 0.925 2 6 0.005
train_warm 0.9 2 RBMTrSymmLICH-L96NF4A2.5T0.925V2 98
bash $CONV 96 0.9 2 6 0.005

echo "#### N=96 final measurement pass ####"
bash scripts/binder_final_measure.sh 96 "0.7 0.875 0.9 0.925 0.95 1.2" logs/measure_stag_N96_final.log
echo "#### N96 r3h DONE ####"
