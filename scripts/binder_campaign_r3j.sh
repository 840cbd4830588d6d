#!/bin/bash
# Campaign r3j: resumption after the VM restart that killed r3g mid-point
# (logs/binder_campaign_r3g.log ends inside the N=32 theta=0.925 V12
# from-below converge: ext 1-3 ran, |dU| still 0.015, then the session
# died). One serial chip schedule for the remaining round-3 deliverables,
# highest value first:
#   1. r3g remnants: N=32 theta=0.925 V12 / theta=0.95 V13 from-below
#   2. r3h stage A0+A: block-move redo of the trapped theta=0.9
#      from-below points + two-sided theta=0.85/0.875 at N=32 and N=64
#      (the (32,64)-crossing-deciding window; ED pair crossings sit at
#      0.909-0.924 drifting DOWN with size)
#   3. final tempered measurement passes for N=32/64 (full theta grid)
#   4. Hubbard L=32 harmonic-trap physics deliverable (verdict item 4c)
#   5. r3h stage B: N=96 two-sided ladders + measurement (third FSS size)
#   6. r3i: N=128 mini-ladders (fourth size - only if the window allows)
# Logs: steps 1-2 -> logs/binder_campaign_r3j.log (this script's stdout,
# parsed by scripts/binder_assemble.py); stage B/r3i keep their own logs.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
CONVBM=scripts/binder_converge_bm.sh

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

echo "#### [r3j-1] r3g remnants ####"
echo "######## N=32 theta=0.925 V12 from-below converge (resume) ########"
bash $CONVBM 32 0.925 12 5 0.005
echo "######## N=32 theta=0.95 V13 from-below (anneal from T0.925V12) ########"
train_warm 32 0.95 13 RBMTrSymmLICH-L32NF4A2.5T0.925V12 79
bash $CONVBM 32 0.95 13 4 0.005

echo "#### [r3j-2] stage A0: theta=0.9 from-below redo with block moves (V16) ####"
train_warm 32 0.9 16 RBMTrSymmLICH-L32NF4A2.5T0.7V10 85
bash $CONVBM 32 0.9 16 6 0.005
train_warm 64 0.9 16 RBMTrSymmLICH-L64NF4A2.5T0.7V9 85
bash $CONVBM 64 0.9 16 6 0.005

echo "#### [r3j-2] stage A: 32/64 two-sided at theta = 0.85, 0.875 ####"
for L in 32 64; do
  BELOW_SRC=RBMTrSymmLICH-L${L}NF4A2.5T0.7V10
  [ "$L" = "64" ] && BELOW_SRC=RBMTrSymmLICH-L64NF4A2.5T0.7V9
  echo "######## N=$L theta=0.85 V14 from-below (anneal from T0.7) ########"
  train_warm $L 0.85 14 $BELOW_SRC 81
  bash $CONVBM $L 0.85 14 5 0.005
  echo "######## N=$L theta=0.875 V14 from-below (anneal from T0.85V14) ########"
  train_warm $L 0.875 14 RBMTrSymmLICH-L${L}NF4A2.5T0.85V14 82
  bash $CONVBM $L 0.875 14 5 0.005
  echo "######## N=$L theta=0.875 V15 from-above (anneal from T0.9V11) ########"
  train_warm $L 0.875 15 RBMTrSymmLICH-L${L}NF4A2.5T0.9V11 83
  bash $CONVBM $L 0.875 15 5 0.005
  echo "######## N=$L theta=0.85 V15 from-above (anneal from T0.875V15) ########"
  train_warm $L 0.85 15 RBMTrSymmLICH-L${L}NF4A2.5T0.875V15 84
  bash $CONVBM $L 0.85 15 5 0.005
done

echo "#### [r3j-3] final measurement passes N=64 / N=32 ####"
bash scripts/binder_final_measure.sh 64 "0.4 0.7 0.85 0.875 0.9 0.925 0.95 1 1.05 1.1 1.2 1.3 1.4 1.5 1.57" logs/measure_stag_N64_final.log
bash scripts/binder_final_measure.sh 32 "0.4 0.7 0.85 0.875 0.9 0.925 0.95 1 1.05 1.1 1.2 1.3 1.4 1.5 1.57" logs/measure_stag_N32_final.log

echo "#### [r3j-4] Hubbard L=32 trap deliverable ####"
bash scripts/hubbard_l32_trap.sh > logs/hubbard_l32_trap.log 2>&1 \
  && echo "hubbard L32 trap OK" || echo "hubbard L32 trap FAILED (see logs/hubbard_l32_trap.log)"

echo "#### [r3j-5] N=96 stage B ####"
bash scripts/binder_n96_stageB.sh > logs/binder_n96_r3h.log 2>&1 \
  && echo "N96 stage B OK" || echo "N96 stage B FAILED (see logs/binder_n96_r3h.log)"

echo "#### [r3j-6] N=128 mini-ladders (r3i) ####"
bash scripts/binder_n128_r3i.sh > logs/binder_n128_r3i.log 2>&1 \
  && echo "N128 r3i OK" || echo "N128 r3i FAILED (see logs/binder_n128_r3i.log)"

echo "#### CAMPAIGN r3j DONE ####"
