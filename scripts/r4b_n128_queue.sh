#!/bin/bash
# r4b trimmed N=128 queue: the full r4_n128_queue.sh ladder (3 thetas x
# two-sided x converge loops) needs ~2h15m of chip, but N=128 blocks
# measure at 150-230 ms/iter (logs/binder_n128_r3i.log: 1164s/1861s per
# 8000-iter block), which doesn't fit this session. This trim buys the
# highest-value subset: a TWO-SIDED U(theta=0.9) at N=128 - the center of
# the crossing window - with 4000-iter anneal blocks, measuring each arm
# as it lands so a cutoff anywhere still leaves usable data. The
# MEASUREMENT protocol (ns=8192 nbeta=8 niter=300 nms=3) is identical to
# every other campaign size, so U values are comparable; only the training
# budget is trimmed, and the two-lineage midpoint +/- halfspread captures
# residual convergence error honestly.
# Lineages: V14 = from-below (anneal up from the converged T0.7 V14,
# U=0.0145), V15 = from-above (bootstrap T2 V6 -> 0.95 -> 0.9).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

LOG=logs/r4b_n128_queue.log
: > "$LOG"
exec >> "$LOG" 2>&1

train_anneal() { # THETA VER FROMPREFIX SEED NITER
  local T=$1 VER=$2 FROM=$3 SEED=$4 NITER=$5
  timeout 2400 python -m neural_network_quantum_state_tpu.drivers.train \
    -model=LICH -ansatz=rbmtrsymm -L=128 -nf=4 -theta=$T -alpha=2.5 -ver=$VER \
    -ns=8192 -niter=$NITER -nwarm=500 -lr=1e-2 -nbeta=4 -fused=1 -blockmoves=1 \
    -ifprefix=$FROM -path=runs -nrec=2000 -seed=$SEED | tail -1
}

measure_stag() { # THETA VER
  local T=$1 VER=$2
  local PREFIX=runs/RBMTrSymmLICH-L128NF4A2.5T${T}V${VER}
  echo "=== stag theta=$T V$VER ==="
  timeout 900 python -m neural_network_quantum_state_tpu.drivers.measure \
    -what=stag -ansatz=rbmtrsymm -L=128 -nf=4 -ns=8192 -prefix=$PREFIX \
    -niter=300 -nms=3 -nwarm=500 -nbeta=8 -fused=1 -seed=21 2>/dev/null | tail -1
}

echo "#### [r4b-1] from-below arm: V14 T0.7 (converged, U=0.0145) -> T0.9, 4000 iters ####"
train_anneal 0.9 14 RBMTrSymmLICH-L128NF4A2.5T0.7V14 85 4000
measure_stag 0.9 14

echo "#### [r4b-2] from-above bootstrap: V15 T2 V6 -> T0.95, 2500 iters ####"
train_anneal 0.95 15 RBMTrSymmLICH-L128NF4A2.5T2V6 86 2500

echo "#### [r4b-3] from-above arm: V15 T0.95 -> T0.9, 4000 iters ####"
train_anneal 0.9 15 RBMTrSymmLICH-L128NF4A2.5T0.95V15 87 4000
measure_stag 0.9 15

echo "#### [r4b-4] corr-ratio on both arms (independent observable) ####"
for VER in 14 15; do
  PREFIX=runs/RBMTrSymmLICH-L128NF4A2.5T0.9V${VER}
  echo "=== corrratio theta=0.9 V$VER ==="
  timeout 900 python -m neural_network_quantum_state_tpu.drivers.measure \
    -what=corrratio -ansatz=rbmtrsymm -L=128 -nf=4 -ns=8192 -prefix=$PREFIX \
    -niter=300 -nms=3 -nwarm=500 -nbeta=8 -fused=1 -seed=23 2>/dev/null | tail -1
done

echo "#### [r4b-5] stretch: extend from-below another 4000 iters (convergence delta) ####"
timeout 2400 python -m neural_network_quantum_state_tpu.drivers.train \
  -model=LICH -ansatz=rbmtrsymm -L=128 -nf=4 -theta=0.9 -alpha=2.5 -ver=14 \
  -ns=8192 -niter=4000 -nwarm=0 -lr=1e-2 -nbeta=4 -fused=1 -blockmoves=1 \
  -resume=RBMTrSymmLICH-L128NF4A2.5T0.9V14 -path=runs -nrec=2000 -seed=88 | tail -1
measure_stag 0.9 14

echo "#### R4B N128 QUEUE DONE ####"
