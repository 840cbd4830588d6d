#!/bin/bash
# Heavier-sampling Renyi-2 re-measure at N=64 (BACKLOG "chip time only" item).
#
# Round-2 readings (RESULTS.md 6b, V9 states, light defaults) gave
# S2(l=32) = 0.580 / 0.589 at theta = 1.3 / 1.57 - below the ln 2 = 0.693
# floor of a symmetric two-fold cat. The N=12 exact study (RESULTS.md 6c)
# refuted the sector-asymmetry explanation and left two suspects:
#   (a) the two-replica swap estimator's small-sample low bias
#       (ratio-of-means with heavy tails at l = N/2), and
#   (b) sampler ergodicity: deep-ordered walkers stuck in one Neel sector
#       under-sample cross-sector swap configurations.
# This pass separates them: (1) light repro at round-2 settings, (2) 16x
# heavier sampling (4x walkers, 4x iterations - shrinks (a) roughly 16x),
# (3) PT-tempered estimator chains (-nbeta=4, in-kernel exchange - fixes
# (b) regardless of sample count), (4) a second seed at the heavy setting
# for scatter. ~15 min of chip.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=logs/renyi_n64_heavy.log
: > "$LOG"

run() { # tag, extra args...
  local TAG=$1; shift
  echo "#### [$TAG] $*" | tee -a "$LOG"
  for attempt in 1 2 3; do
    timeout 2400 python -m neural_network_quantum_state_tpu.drivers.measure \
      -what=renyi -ansatz=rbmtrsymm -L=64 -nf=4 -l=32 -mchunk=100 "$@" 2>>"$LOG" | tail -2 | tee -a "$LOG" \
      && return 0
    echo "[$TAG] attempt $attempt failed; sleeping 60s" | tee -a "$LOG"
    sleep 60
  done
}

for THETA in 1.3 1.57; do
  PREFIX=runs/RBMTrSymmLICH-L64NF4A2.5T${THETA}V9
  run "t${THETA}-light"  -prefix=$PREFIX -ns=2048 -niter=500  -seed=0
  run "t${THETA}-heavy"  -prefix=$PREFIX -ns=8192 -niter=4000 -seed=0
  run "t${THETA}-heavy2" -prefix=$PREFIX -ns=8192 -niter=4000 -seed=777
  run "t${THETA}-pt"     -prefix=$PREFIX -ns=8192 -niter=4000 -seed=0 -nbeta=4 -fused=1
done
echo "#### RENYI N=64 HEAVY DONE ####" | tee -a "$LOG"
