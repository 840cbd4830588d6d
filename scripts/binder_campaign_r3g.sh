#!/bin/bash
# Resumption of campaign r3e after the session restart that killed it
# mid-point (logs/binder_campaign_r3e.log: N=32 theta=0.9 V11 had trained
# extension block 4 but the post-block measurement never ran). Picks up at
# that point and runs the remaining r3e stages, then the r3f from-below
# supplement, then the final measurement passes and phase 2. Serial chip
# jobs; all train/measure calls retried (tunnel can drop for minutes).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
CONV=scripts/binder_converge_retry.sh

train_warm() { # L THETA VER FROMPREFIX SEED [NITER]
  local L=$1 T=$2 VER=$3 FROM=$4 SEED=$5 NI=${6:-8000}
  for attempt in 1 2 3; do
    timeout 3600 python -m neural_network_quantum_state_tpu.drivers.train \
      -model=LICH -ansatz=rbmtrsymm -L=$L -nf=4 -theta=$T -alpha=2.5 -ver=$VER \
      -ns=8192 -niter=$NI -nwarm=500 -lr=1e-2 -nbeta=4 -fused=1 \
      -ifprefix=$FROM -path=runs -nrec=2000 -seed=$SEED | tail -1 && return 0
    echo "train_warm attempt $attempt failed; sleeping 120s" >&2
    sleep 120
  done
}

echo "#### N=32 theta=0.9 V11 converge (resume: block 4 trained, unmeasured) ####"
bash $CONV 32 0.9 11 4 0.005

echo "#### N=32 theta=0.925 V11 (anneal from T0.95V11) ####"
train_warm 32 0.925 11 RBMTrSymmLICH-L32NF4A2.5T0.95V11 77
bash $CONV 32 0.925 11 4 0.005

echo "#### N=64 theta=0.9 sandwich: from-below (V10) ####"
bash $CONV 64 0.9 10 8 0.005

echo "#### N=64 theta=0.9 sandwich: from-above (V11) ####"
bash $CONV 64 0.9 11 8 0.005

echo "#### N=64 theta=0.925 from-below check (V12, anneal from T0.9V10) ####"
train_warm 64 0.925 12 RBMTrSymmLICH-L64NF4A2.5T0.9V10 77
bash $CONV 64 0.925 12 5 0.005

echo "#### N=32 from-below supplement (r3f) ####"
echo "######## N=32 theta=0.9 V10 from-below converge ########"
bash $CONV 32 0.9 10 8 0.005
echo "######## N=32 theta=0.925 V12 from-below (anneal from T0.9V10) ########"
train_warm 32 0.925 12 RBMTrSymmLICH-L32NF4A2.5T0.9V10 78
bash $CONV 32 0.925 12 6 0.005
echo "######## N=32 theta=0.95 V13 from-below (anneal from T0.925V12) ########"
train_warm 32 0.95 13 RBMTrSymmLICH-L32NF4A2.5T0.925V12 79
bash $CONV 32 0.95 13 4 0.005

echo "#### FINAL MEASUREMENT PASSES ####"
bash scripts/binder_final_measure.sh 64 "0.4 0.7 0.85 0.875 0.9 0.925 0.95 1 1.05 1.1 1.2 1.3 1.4 1.5 1.57" logs/measure_stag_N64_final.log
bash scripts/binder_final_measure.sh 32 "0.4 0.7 0.85 0.875 0.9 0.925 0.95 1 1.05 1.1 1.2 1.3 1.4 1.5 1.57" logs/measure_stag_N32_final.log

echo "#### PHASE 2 (full) ####"
bash scripts/chip_phase2_r3.sh
echo "#### CAMPAIGN r3g DONE ####"
