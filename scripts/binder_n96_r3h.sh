#!/bin/bash
# Campaign r3h (auto-launched after r3g): close the crossing from below.
#
# The fine-grid ED pair crossings drift DOWNWARD with size - (8,16) at
# theta=0.9240, (10,20) at 0.9088, two-point 1/N extrapolation ~0.85 -
# so the VMC (32,64) crossing likely sits near 0.87, BELOW the r3g
# campaign's two-sided coverage (0.9/0.925/0.95). Stage A adds two-sided
# convergence at theta = 0.875 and 0.85 for N=32 and N=64 (V14 =
# from-below lineage annealed up from T0.7, V15 = from-above lineage
# annealed down from T0.9V11). Stage B trains the third VMC size N=96
# two-sided over the same near-critical window for the FSS fit.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
CONV=scripts/binder_converge_bm.sh

train_warm() { # L THETA VER FROMPREFIX SEED
  local L=$1 T=$2 VER=$3 FROM=$4 SEED=$5
  for attempt in 1 2 3; do
    timeout 4500 python -m neural_network_quantum_state_tpu.drivers.train \
      -model=LICH -ansatz=rbmtrsymm -L=$L -nf=4 -theta=$T -alpha=2.5 -ver=$VER \
      -ns=8192 -niter=8000 -nwarm=500 -lr=1e-2 -nbeta=4 -fused=1 -blockmoves=1 \
      -ifprefix=$FROM -path=runs -nrec=2000 -seed=$SEED | tail -1 && return 0
    echo "train_warm attempt $attempt failed; sleeping 120s" >&2
    sleep 120
  done
}

train_cold() { # L THETA VER SEED
  local L=$1 T=$2 VER=$3 SEED=$4
  for attempt in 1 2 3; do
    timeout 4500 python -m neural_network_quantum_state_tpu.drivers.train \
      -model=LICH -ansatz=rbmtrsymm -L=$L -nf=4 -theta=$T -alpha=2.5 -ver=$VER \
      -ns=8192 -niter=8000 -nwarm=500 -lr=1e-2 -nbeta=4 -fused=1 -blockmoves=1 \
      -path=runs -nrec=2000 -seed=$SEED | tail -1 && return 0
    echo "train_cold attempt $attempt failed; sleeping 120s" >&2
    sleep 120
  done
}

echo "#### STAGE A0: redo theta=0.9 from-below with block moves (V16) ####"
train_warm 32 0.9 16 RBMTrSymmLICH-L32NF4A2.5T0.7V10 85
bash $CONV 32 0.9 16 6 0.005
train_warm 64 0.9 16 RBMTrSymmLICH-L64NF4A2.5T0.7V9 85
bash $CONV 64 0.9 16 6 0.005

echo "#### STAGE A: 32/64 two-sided at theta = 0.85, 0.875 ####"
for L in 32 64; do
  BELOW_SRC=RBMTrSymmLICH-L${L}NF4A2.5T0.7V10
  [ "$L" = "64" ] && BELOW_SRC=RBMTrSymmLICH-L64NF4A2.5T0.7V9
  echo "######## N=$L theta=0.85 V14 from-below (anneal from T0.7) ########"
  train_warm $L 0.85 14 $BELOW_SRC 81
  bash $CONV $L 0.85 14 5 0.005
  echo "######## N=$L theta=0.875 V14 from-below (anneal from T0.85V14) ########"
  train_warm $L 0.875 14 RBMTrSymmLICH-L${L}NF4A2.5T0.85V14 82
  bash $CONV $L 0.875 14 5 0.005
  echo "######## N=$L theta=0.875 V15 from-above (anneal from T0.9V11) ########"
  train_warm $L 0.875 15 RBMTrSymmLICH-L${L}NF4A2.5T0.9V11 83
  bash $CONV $L 0.875 15 5 0.005
  echo "######## N=$L theta=0.85 V15 from-above (anneal from T0.875V15) ########"
  train_warm $L 0.85 15 RBMTrSymmLICH-L${L}NF4A2.5T0.875V15 84
  bash $CONV $L 0.85 15 5 0.005
done

echo "#### STAGE B: N=96 two-sided ladders ####"
echo "######## N=96 from-below ladder (V1) ########"
train_cold 96 0.7 1 97
bash $CONV 96 0.7 1 2 0.005
for T in 0.85 0.875 0.9 0.925; do
  FROM=$(ls runs/RBMTrSymmLICH-L96NF4A2.5T*V1 2>/dev/null | grep -Ev '\.(jsonl|npz|dat)$' | tail -1)
  train_warm 96 $T 1 $(basename $FROM) 97
  bash $CONV 96 $T 1 5 0.005
done
echo "######## N=96 from-above ladder (V2) ########"
train_cold 96 1.2 2 98
bash $CONV 96 1.2 2 2 0.005
PREV=RBMTrSymmLICH-L96NF4A2.5T1.2V2
for T in 0.95 0.925 0.9 0.875 0.85; do
  train_warm 96 $T 2 $PREV 98
  bash $CONV 96 $T 2 5 0.005
  PREV=RBMTrSymmLICH-L96NF4A2.5T${T}V2
done

echo "#### N=96 final measurement pass ####"
bash scripts/binder_final_measure.sh 96 "0.7 0.85 0.875 0.9 0.925 0.95 1.2" logs/measure_stag_N96_final.log
echo "#### 32/64 supplementary final pass at the new thetas ####"
bash scripts/binder_final_measure.sh 32 "0.85 0.875" logs/measure_stag_N32_lowtheta.log
bash scripts/binder_final_measure.sh 64 "0.85 0.875" logs/measure_stag_N64_lowtheta.log
echo "#### N96 r3h DONE ####"
