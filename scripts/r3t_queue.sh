#!/bin/bash
# r3t chip queue: methodology-consistent re-measure of the full N=64
# S2(theta) row with the pure in-chain-quadrature increment estimator
# (-l0=0 -z2q=1) - the estimator the r3s A/B validated (RESULTS 6h).
# The deep-ordered points (1.3, 1.57) already have pure-z2q values;
# this fills the near-critical and disordered points so the corrected
# QPT entanglement row carries one estimator everywhere.
# Gated on /tmp/r3t_cutoff (epoch seconds, live-updatable).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

cutoff_epoch() {
  if [ -r /tmp/r3t_cutoff ]; then cat /tmp/r3t_cutoff; else
    date -u -d '2026-08-19 11:40' +%s
  fi
}
time_left() { [ "$(date -u +%s)" -lt "$(cutoff_epoch)" ]; }

for T in 1.1 1.2 0.9 0.4; do
  time_left || { echo "r3t cutoff before theta=$T"; break; }
  TAG=$(echo $T | tr -d '.')
  echo "#### [r3t] z2q pure-chain S2 at theta=$T ####  $(date -u +%H:%M:%S)"
  timeout 420 python -m neural_network_quantum_state_tpu.drivers.measure \
    -what=renyi_inc -ansatz=rbmtrsymm -L=64 -nf=4 -ns=256 \
    -prefix=runs/RBMTrSymmLICH-L64NF4A2.5T${T}V9 -l=32 -l0=0 -z2q=1 \
    -init=neel -niter=500 -nms=2 -nwarm=400 -seed=41 -mchunk=25 \
    > logs/renyi_z2q_N64_T${TAG}.log 2>&1 \
    && tail -1 logs/renyi_z2q_N64_T${TAG}.log || echo "theta=$T FAILED (see log)"
done

echo "#### R3T QUEUE DONE ####  $(date -u +%H:%M:%S)"
