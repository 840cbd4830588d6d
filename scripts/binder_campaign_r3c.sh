#!/bin/bash
# Round-3 Binder campaign, trimmed continuation (replaces r3b phases A2-C
# after phase A finished; see logs/binder_campaign_r3b.log for phase A).
#
# Changes vs r3b: adds theta=0.925 at BOTH sizes (the (32,64) crossing
# resolution lives there), drops the theta=0.875 fill-in, keeps the
# from-above anneals (two-sided protocol) and the N=16 VMC-vs-ED
# validation, then runs the final measurement passes.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
CONV=scripts/binder_converge.sh

train_warm() { # L THETA VER FROMPREFIX [NITER]
  local L=$1 T=$2 VER=$3 FROM=$4 NI=${5:-8000}
  timeout 3600 python -m neural_network_quantum_state_tpu.drivers.train \
    -model=LICH -ansatz=rbmtrsymm -L=$L -nf=4 -theta=$T -alpha=2.5 -ver=$VER \
    -ns=8192 -niter=$NI -nwarm=500 -lr=1e-2 -nbeta=4 -fused=1 \
    -ifprefix=$FROM -path=runs -nrec=2000 -seed=77 | tail -1
}

echo "#### N=64 theta=0.925 V11 (anneal from T0.95V10) ####"
train_warm 64 0.925 11 RBMTrSymmLICH-L64NF4A2.5T0.95V10
bash $CONV 64 0.925 11 4 0.005

echo "#### N=64 theta=0.9 V11 from-above (anneal from T0.95V10) ####"
train_warm 64 0.9 11 RBMTrSymmLICH-L64NF4A2.5T0.95V10
bash $CONV 64 0.9 11 6 0.005

echo "#### N=64 theta=0.95 V11 from-above (anneal from T1V10) ####"
train_warm 64 0.95 11 RBMTrSymmLICH-L64NF4A2.5T1V10
bash $CONV 64 0.95 11 4 0.005

echo "#### N=32 V11 converge: theta = 1, 0.95, 0.9 ####"
for T in 1 0.95 0.9; do
  echo "######## N=32 theta=$T V11 ########"
  bash $CONV 32 $T 11 6 0.005
done

echo "#### N=32 theta=0.925 V11 (anneal from T0.95V11) ####"
train_warm 32 0.925 11 RBMTrSymmLICH-L32NF4A2.5T0.95V11
bash $CONV 32 0.925 11 5 0.005

echo "#### N=16 VMC-vs-ED validation: theta = 0.9, 0.95 ####"
for T in 0.9 0.95; do
  echo "######## N=16 theta=$T V20 (cold PT) ########"
  timeout 3600 python -m neural_network_quantum_state_tpu.drivers.train \
    -model=LICH -ansatz=rbmtrsymm -L=16 -nf=4 -theta=$T -alpha=2.5 -ver=20 \
    -ns=8192 -niter=4000 -nwarm=500 -lr=1e-2 -nbeta=4 -fused=1 \
    -path=runs -nrec=2000 -seed=7 | tail -1
  bash $CONV 16 $T 20 5 0.005
done

echo "#### FINAL MEASUREMENT PASSES ####"
bash scripts/binder_final_measure.sh 64 "0.9 0.925 0.95 1 1.05" logs/measure_stag_N64_final.log
bash scripts/binder_final_measure.sh 32 "0.9 0.925 0.95 1" logs/measure_stag_N32_final.log
bash scripts/binder_final_measure.sh 16 "0.9 0.95" logs/measure_stag_N16_final.log
echo "#### CAMPAIGN r3c DONE ####"
