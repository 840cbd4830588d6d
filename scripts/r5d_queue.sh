#!/bin/bash
# r5d follow-up (launched while r5c still runs; waits for it):
#  1. CLEAN direct from-above arm at theta=0.925: the V15 ladder chain
#     degraded (theta=0.95 ext left near-singular weights; the 0.95->0.925
#     anneal collapsed its walker ensemble and NaN'd at step 1, saving a
#     variationally invalid E=-0.691 state vs the from-below plateau's
#     E=-0.828). Re-anneal DIRECTLY from the healthy deep-ordered T2 V6
#     state: if order melts here too, the disordered two-sided answer at
#     0.925 is confirmed from both sides; if it holds with E < -0.828, the
#     from-below plateau is refuted. Decisive either way.
#  2. stag measure (standard point-block format -> logs/r5d_points.log).
#  3. recur_cos sweep-kernel A/B (round-4 verdict item 2).
#  4. corr-ratio on the two theta=0.925 arms (best effort).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=logs/r5d_queue.log
: > "$LOG"
exec >> "$LOG" 2>&1

# wait (max 35 min) for the r5c queue to release the chip
for i in $(seq 1 70); do
  grep -q "R5C QUEUE DONE" logs/r5c_queue.log && break
  sleep 30
done
date -u

echo "#### [r5d-1] direct from-above anneal: T2 V6 -> theta=0.925 (V15, 4000 iters) ####"
for attempt in 1 2; do
  timeout 2700 python -m neural_network_quantum_state_tpu.drivers.train \
    -model=LICH -ansatz=rbmtrsymm -L=128 -nf=4 -theta=0.925 -alpha=2.5 -ver=15 \
    -ns=8192 -niter=4000 -nwarm=500 -lr=1e-2 -nbeta=4 -fused=1 -blockmoves=1 \
    -rsd=0 -cgmax=120 -ifprefix=RBMTrSymmLICH-L128NF4A2.5T2V6 -path=runs -nrec=2000 -seed=95 \
    | tail -1 && break
  echo "train attempt $attempt failed; sleeping 60s" >&2
  sleep 60
done

echo "#### [r5d-2] stag measure -> logs/r5d_points.log ####"
PREFIX=runs/RBMTrSymmLICH-L128NF4A2.5T0.925V15
for attempt in 1 2 3; do
  U=$(timeout 900 python -m neural_network_quantum_state_tpu.drivers.measure \
    -what=stag -ansatz=rbmtrsymm -L=128 -nf=4 -ns=8192 -prefix=$PREFIX \
    -niter=300 -nms=3 -nwarm=500 -nbeta=8 -fused=1 -seed=21 2>/dev/null \
    | grep -o 'binder=[0-9.-]*' | cut -d= -f2)
  if [ -n "$U" ]; then
    echo "direct from-above U(128, 0.925) = $U"
    { echo "# r5d direct T2->0.925 from-above arm (supersedes the degraded ladder chain)";
      echo "point L=128 T=0.925 V15: U0=$U";
      echo "NOT converged after 0 extensions: U=$U"; } > logs/r5d_points.log
    break
  fi
  echo "measure attempt $attempt empty; sleeping 120s" >&2
  sleep 120
done

echo "#### [r5d-3] recur_cos sweep-kernel A/B ####"
timeout 1200 python scripts/bench_sweep_recurcos_ab.py

echo "#### [r5d-4] corr-ratio on the theta=0.925 arms (best effort) ####"
for VER in 14 15; do
  echo "=== corrratio theta=0.925 V$VER ==="
  timeout 900 python -m neural_network_quantum_state_tpu.drivers.measure \
    -what=corrratio -ansatz=rbmtrsymm -L=128 -nf=4 -ns=8192 \
    -prefix=runs/RBMTrSymmLICH-L128NF4A2.5T0.925V${VER} \
    -niter=300 -nms=3 -nwarm=500 -nbeta=8 -fused=1 -seed=23 2>/dev/null | tail -1
done
echo "#### R5D DONE ####"
date -u
