#!/bin/bash
# r4c: chip work chained behind the r4b N=128 queue (waits on its PID).
# Completes the corrected N=64 S2(theta) row: the r3t queue was cut off
# after theta=1.1 (ADVICE r3 low item), leaving theta = 1.2 / 0.9 / 0.4
# still carrying only hybrid-estimator values. Protocol is byte-identical
# to the r3t invocation (pure chain -l0=0 -z2q=1, 256 walkers, 500 iters)
# so the row stays one-estimator-consistent.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
# fail fast when the queue pid file is missing/stale: silently skipping the
# wait would start these measurements while the r4b queue still holds the
# chip (the contention RESULTS.md blames for the 420s timeouts)
[ -f /tmp/r4b.pid ] || { echo "ABORT: /tmp/r4b.pid missing - launch r4b first"; exit 1; }
QPID=$(cat /tmp/r4b.pid)
case "$QPID" in
  ''|*[!0-9]*) echo "ABORT: /tmp/r4b.pid holds no numeric pid: '$QPID'"; exit 1 ;;
esac
while kill -0 "$QPID" 2>/dev/null; do sleep 20; done

for T in 1.2 0.9 0.4; do
  TAG=$(echo $T | tr -d '.')
  echo "#### [r4c] z2q pure-chain S2 at theta=$T ####  $(date -u +%H:%M:%S)"
  timeout 420 python -m neural_network_quantum_state_tpu.drivers.measure \
    -what=renyi_inc -ansatz=rbmtrsymm -L=64 -nf=4 -ns=256 \
    -prefix=runs/RBMTrSymmLICH-L64NF4A2.5T${T}V9 -l=32 -l0=0 -z2q=1 \
    -init=neel -niter=500 -nms=2 -nwarm=400 -seed=41 -mchunk=25 \
    > logs/renyi_z2q_N64_T${TAG}.log 2>&1 \
    && tail -1 logs/renyi_z2q_N64_T${TAG}.log || echo "theta=$T FAILED (see log)"
done
echo "#### R4C DONE ####  $(date -u +%H:%M:%S)"
