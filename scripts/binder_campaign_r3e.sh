#!/bin/bash
# Round-3 Binder campaign, resumption after the tunnel outage that killed
# r3d mid-flight (logs/binder_campaign_r3c.log tail). Finishes the N=32
# V11 grid, tightens the N=64 theta=0.9 two-sided sandwich (the
# crossing-deciding point: ED anchors put theta_c ~ 0.91), adds a
# from-below check at N=64 theta=0.925, then runs the final measurement
# passes and phase 2. All chip jobs serial; measure/train calls retried
# because the remote tunnel can drop for minutes at a time.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
CONV=scripts/binder_converge_retry.sh

train_warm() { # L THETA VER FROMPREFIX [NITER]
  local L=$1 T=$2 VER=$3 FROM=$4 NI=${5:-8000}
  for attempt in 1 2 3; do
    timeout 3600 python -m neural_network_quantum_state_tpu.drivers.train \
      -model=LICH -ansatz=rbmtrsymm -L=$L -nf=4 -theta=$T -alpha=2.5 -ver=$VER \
      -ns=8192 -niter=$NI -nwarm=500 -lr=1e-2 -nbeta=4 -fused=1 \
      -ifprefix=$FROM -path=runs -nrec=2000 -seed=77 | tail -1 && return 0
    echo "train_warm attempt $attempt failed; sleeping 120s" >&2
    sleep 120
  done
}

echo "#### N=32 theta=0.95 V11 converge (resume after outage) ####"
bash $CONV 32 0.95 11 4 0.005

echo "#### N=32 theta=0.9 V11 converge ####"
bash $CONV 32 0.9 11 6 0.005

echo "#### N=32 theta=0.925 V11 (anneal from T0.95V11) ####"
train_warm 32 0.925 11 RBMTrSymmLICH-L32NF4A2.5T0.95V11
bash $CONV 32 0.925 11 4 0.005

echo "#### N=64 theta=0.9 sandwich: from-below (V10) ####"
bash $CONV 64 0.9 10 8 0.005

echo "#### N=64 theta=0.9 sandwich: from-above (V11) ####"
bash $CONV 64 0.9 11 8 0.005

echo "#### N=64 theta=0.925 from-below check (V12, anneal from T0.9V10) ####"
train_warm 64 0.925 12 RBMTrSymmLICH-L64NF4A2.5T0.9V10
bash $CONV 64 0.925 12 5 0.005

echo "#### FINAL MEASUREMENT PASSES ####"
bash scripts/binder_final_measure.sh 64 "0.4 0.7 0.85 0.875 0.9 0.925 0.95 1 1.05 1.1 1.2 1.3 1.4 1.5 1.57" logs/measure_stag_N64_final.log
bash scripts/binder_final_measure.sh 32 "0.4 0.7 0.85 0.875 0.9 0.925 0.95 1 1.05 1.1 1.2 1.3 1.4 1.5 1.57" logs/measure_stag_N32_final.log

echo "#### PHASE 2 (full) ####"
bash scripts/chip_phase2_r3.sh
echo "#### CAMPAIGN r3e DONE ####"
