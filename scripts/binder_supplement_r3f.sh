#!/bin/bash
# Supplement to campaign r3e: two-sided bounds for N=32 in the crossing
# region. The V11 N=32 points were annealed from ABOVE (ordered neighbor);
# this adds from-BELOW convergence (V10 lineage, trained cold/disordered in
# round 2) at theta = 0.9 and 0.925 so the (32,64) sign determination at
# the crossing-deciding thetas is bounded from both sides, same as N=64.
# V12 = from-below anneal at 0.925 (warm from the T0.9V10 disordered-side
# state), since no V10 checkpoint exists at 0.925.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
CONV=scripts/binder_converge_retry.sh

echo "#### N=32 theta=0.9 V10 from-below converge ####"
bash $CONV 32 0.9 10 8 0.005

echo "#### N=32 theta=0.925 V12 from-below (anneal from T0.9V10) ####"
for attempt in 1 2 3; do
  timeout 3600 python -m neural_network_quantum_state_tpu.drivers.train \
    -model=LICH -ansatz=rbmtrsymm -L=32 -nf=4 -theta=0.925 -alpha=2.5 -ver=12 \
    -ns=8192 -niter=8000 -nwarm=500 -lr=1e-2 -nbeta=4 -fused=1 \
    -ifprefix=RBMTrSymmLICH-L32NF4A2.5T0.9V10 -path=runs -nrec=2000 -seed=78 \
    | tail -1 && break
  echo "train attempt $attempt failed; sleeping 120s" >&2
  sleep 120
done
bash $CONV 32 0.925 12 6 0.005

echo "#### N=32 theta=0.95 V13 from-below (anneal from T0.925V12) ####"
for attempt in 1 2 3; do
  timeout 3600 python -m neural_network_quantum_state_tpu.drivers.train \
    -model=LICH -ansatz=rbmtrsymm -L=32 -nf=4 -theta=0.95 -alpha=2.5 -ver=13 \
    -ns=8192 -niter=8000 -nwarm=500 -lr=1e-2 -nbeta=4 -fused=1 \
    -ifprefix=RBMTrSymmLICH-L32NF4A2.5T0.925V12 -path=runs -nrec=2000 -seed=79 \
    | tail -1 && break
  echo "train attempt $attempt failed; sleeping 120s" >&2
  sleep 120
done
bash $CONV 32 0.95 13 4 0.005

echo "#### SUPPLEMENT r3f DONE ####"
