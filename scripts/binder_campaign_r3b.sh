#!/bin/bash
# Round-3 Binder-crossing closure campaign (serial chip jobs).
#
# Protocol (memory: binder-convergence-protocol): every near-critical point
# is converged from BELOW (extend-from-current via structured -resume,
# scripts/binder_converge.sh) and checked from ABOVE (fresh warm start from
# the converged neighbor at theta+0.05 via -ifprefix, then the same extend
# loop); a point is accepted when the two sides agree within tolerance.
#
# Phases:
#   A : N=64 V10 extend-from-below at theta = 1.0, 0.95, 1.05, 0.9
#   A2: N=64 V11 from-above anneals: theta=0.95 <- T1V10, theta=0.9 <- T0.95V10
#   B : N=32 V11 (warm-from-ordered) converge at theta = 0.9, 0.95, 1.0
#   B2: N=32 V11 new thetas 0.925, 0.875 warm-started from converged neighbors
#   C : N=16 VMC validation points vs exact diagonalization (theta=0.9, 0.95)
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

echo "#### PHASE A: N=64 extend-from-below ####"
for T in 1 0.95 1.05 0.9; do
  echo "######## N=64 theta=$T V10 ########"
  bash $CONV 64 $T 10 8 0.005
done

echo "#### PHASE A2: N=64 from-above anneals ####"
echo "######## N=64 theta=0.95 V11 (from T1V10) ########"
train_warm 64 0.95 11 RBMTrSymmLICH-L64NF4A2.5T1V10
bash $CONV 64 0.95 11 4 0.005
echo "######## N=64 theta=0.9 V11 (from T0.95V10) ########"
train_warm 64 0.9 11 RBMTrSymmLICH-L64NF4A2.5T0.95V10
bash $CONV 64 0.9 11 6 0.005
echo "######## N=64 theta=1.05 V11 (from T1.1V10) ########"
train_warm 64 1.05 11 RBMTrSymmLICH-L64NF4A2.5T1.1V10
bash $CONV 64 1.05 11 4 0.005

echo "#### PHASE B: N=32 V11 converge ####"
for T in 1 0.95 0.9; do
  echo "######## N=32 theta=$T V11 ########"
  bash $CONV 32 $T 11 6 0.005
done

echo "#### PHASE B2: N=32 fill-in thetas ####"
echo "######## N=32 theta=0.925 V11 (from T0.95V11) ########"
train_warm 32 0.925 11 RBMTrSymmLICH-L32NF4A2.5T0.95V11
bash $CONV 32 0.925 11 6 0.005
echo "######## N=32 theta=0.875 V11 (from T0.9V11) ########"
train_warm 32 0.875 11 RBMTrSymmLICH-L32NF4A2.5T0.9V11
bash $CONV 32 0.875 11 6 0.005

echo "#### PHASE C: N=16 VMC-vs-ED validation ####"
for T in 0.9 0.95; do
  echo "######## N=16 theta=$T V20 (cold PT) ########"
  timeout 3600 python -m neural_network_quantum_state_tpu.drivers.train \
    -model=LICH -ansatz=rbmtrsymm -L=16 -nf=4 -theta=$T -alpha=2.5 -ver=20 \
    -ns=8192 -niter=4000 -nwarm=500 -lr=1e-2 -nbeta=4 -fused=1 \
    -path=runs -nrec=2000 -seed=7 | tail -1
  bash $CONV 16 $T 20 6 0.005
done
echo "#### CAMPAIGN DONE ####"
