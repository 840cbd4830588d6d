#!/bin/bash
# r4 chip queue: the FOURTH system size for the Binder finite-size-scaling
# program (round-3 verdict item 8; protocol of scripts/r3q_queue.sh, which
# round 3 scripted but never got chip time to run). N=128 has a disordered
# from-below anchor (T0.7 V14) and deep-ordered states (T2 V6) to anneal
# from; two-sided crossing-window ladder at theta = 0.875/0.9/0.925 ->
# (96,128) and (64,128) pair crossings for a four-size FSS extrapolation.
# V14 = from-below lineage, V15 = from-above lineage, block-move extension
# blocks, tempered measurement (identical to the N=96 ladder,
# binder_n96_r3h.sh). Cutoff: /tmp/r4_cutoff (epoch secs, live) or
# now + 2h15m at launch; the final re-measure passes ALWAYS run on
# whatever points finished.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

LAUNCH_CUTOFF=$(( $(date -u +%s) + 8100 ))
cutoff_epoch() {
  if [ -r /tmp/r4_cutoff ]; then cat /tmp/r4_cutoff; else echo "$LAUNCH_CUTOFF"; fi
}
time_left() { [ "$(date -u +%s)" -lt "$(cutoff_epoch)" ]; }

CONV=scripts/binder_converge_bm.sh

train_warm() { # THETA VER FROMPREFIX SEED
  local T=$1 VER=$2 FROM=$3 SEED=$4
  for attempt in 1 2 3; do
    timeout 4500 python -m neural_network_quantum_state_tpu.drivers.train \
      -model=LICH -ansatz=rbmtrsymm -L=128 -nf=4 -theta=$T -alpha=2.5 -ver=$VER \
      -ns=8192 -niter=8000 -nwarm=500 -lr=1e-2 -nbeta=4 -fused=1 -blockmoves=1 \
      -ifprefix=$FROM -path=runs -nrec=2000 -seed=$SEED | tail -1 && return 0
    echo "train_warm attempt $attempt failed; sleeping 120s" >&2
    sleep 120
  done
}

echo "#### [r4-1] from-below lineage V14: anneal up 0.7 -> 0.875 -> 0.9 -> 0.925 ####"
PREV=RBMTrSymmLICH-L128NF4A2.5T0.7V14
for T in 0.875 0.9 0.925; do
  time_left || { echo "r4 cutoff before below T=$T"; break; }
  echo "######## N=128 theta=$T V14 from-below (anneal from $PREV) ########"
  train_warm $T 14 $PREV 85
  bash $CONV 128 $T 14 2 0.005
  PREV=RBMTrSymmLICH-L128NF4A2.5T${T}V14
done

echo "#### [r4-2] from-above lineage V15: anneal down T2 -> 1.05 -> 0.95 -> 0.925 -> 0.9 -> 0.875 ####"
# bootstrap stages (1.05, 0.95) get one warm train each, no convergence
# loop - they only seed the ladder; the crossing-window points converge.
if time_left; then
  echo "######## N=128 theta=1.05 V15 bootstrap (anneal from T2V6) ########"
  train_warm 1.05 15 RBMTrSymmLICH-L128NF4A2.5T2V6 86
  echo "######## N=128 theta=0.95 V15 bootstrap ########"
  train_warm 0.95 15 RBMTrSymmLICH-L128NF4A2.5T1.05V15 86
fi
PREV=RBMTrSymmLICH-L128NF4A2.5T0.95V15
for T in 0.925 0.9 0.875; do
  time_left || { echo "r4 cutoff before above T=$T"; break; }
  echo "######## N=128 theta=$T V15 from-above (anneal from $PREV) ########"
  train_warm $T 15 $PREV 87
  bash $CONV 128 $T 15 2 0.005
  PREV=RBMTrSymmLICH-L128NF4A2.5T${T}V15
done

echo "#### [r4-3] final re-measure passes (N=128) ####"
bash scripts/binder_final_measure.sh 128 "0.875 0.9 0.925" logs/measure_stag_N128_final.log
bash scripts/corrratio_measure.sh 128 "0.875 0.9 0.925" logs/corrratio_N128_r4.log

echo "#### R4 N128 QUEUE DONE ####"
