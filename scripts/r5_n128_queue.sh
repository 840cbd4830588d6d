#!/bin/bash
# r5 N=128 queue: CONVERGE the fourth-size Binder crossing (round-4 verdict
# item 1). Root cause of the r3/r4 from-above stall found this round: every
# campaign train ran with the driver default -rsd=1e-3, and deep-ordered
# N=128 states sit at rsd ~9e-4, so every from-above anneal block
# early-stopped at step ~0 (runs/RBMTrSymmLICH-L128NF4A2.5T0.95V15.metrics
# .jsonl: ONE step; T0.9V15: 41 steps at E=-0.681 vs the from-below arm's
# -0.832). The "lineage split" judged in VERDICT.md was an early-stop
# artifact, not basin physics. Every train here passes -rsd=0.
#
# Plan (trimmed to ~4h of chip): two-sided ladder at theta = 0.95 and
# 0.925 - the (96,128) crossing window implied by the (64,96) crossing at
# 0.922 and the four theta_c>0.9 brackets. V14 = from-below (anneal up
# from the converged T0.9 from-below arm), V15 = from-above (anneal down
# from T2 V6 with rsd=0). Measurement protocol identical to the N=32/64/96
# campaign (ns=8192 nbeta=8 niter=300 nms=3 nwarm=500 seed=21) so U values
# are comparable. Emits binder_assemble-compatible point/ext blocks.
# Energies live in runs/*.metrics.jsonl as the lineage arbiter.
# Cutoff: /tmp/r5_cutoff (epoch secs, live) or launch + 4h15m.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

LOG=logs/r5_n128_queue.log
: > "$LOG"
exec >> "$LOG" 2>&1

LAUNCH_CUTOFF=$(( $(date -u +%s) + 15300 ))
cutoff_epoch() {
  if [ -r /tmp/r5_cutoff ]; then cat /tmp/r5_cutoff; else echo "$LAUNCH_CUTOFF"; fi
}
time_left() { [ "$(date -u +%s)" -lt "$(cutoff_epoch)" ]; }

train_anneal() { # THETA VER FROMPREFIX SEED NITER
  local T=$1 VER=$2 FROM=$3 SEED=$4 NITER=$5
  for attempt in 1 2 3; do
    timeout 2700 python -m neural_network_quantum_state_tpu.drivers.train \
      -model=LICH -ansatz=rbmtrsymm -L=128 -nf=4 -theta=$T -alpha=2.5 -ver=$VER \
      -ns=8192 -niter=$NITER -nwarm=500 -lr=1e-2 -nbeta=4 -fused=1 -blockmoves=1 \
      -rsd=0 -cgmax=120 -ifprefix=$FROM -path=runs -nrec=2000 -seed=$SEED | tail -1 && return 0
    echo "train_anneal attempt $attempt failed; sleeping 60s" >&2
    sleep 60
  done
  return 1
}

CONV="bash scripts/binder_converge_bm.sh"  # L THETA VER MAXEXT TOL NITER NBETA CGMAX
# cgmax=120: the T2->0.95 anneal hit cg_iters=517 (full Krylov, f64-emulated
# matvecs -> 1.24 s/iter); the well-conditioned from-below arm runs ~100
# iters naturally, so a 120 cap bounds block cost without changing the
# converged-regime direction (truncated CG = Krylov minimizer).

echo "#### [r5-A1] from-above V15: T2 V6 -> theta=0.95, 4000 iters, rsd=0 ####"
time_left && train_anneal 0.95 15 RBMTrSymmLICH-L128NF4A2.5T2V6 90 4000
echo "#### [r5-A2] converge from-above at 0.95 (1 ext x 3000) ####"
time_left && $CONV 128 0.95 15 1 0.01 3000 4 120

echo "#### [r5-B1] from-below V14: T0.9 (8k-iter arm) -> theta=0.925, 4000 iters ####"
time_left && train_anneal 0.925 14 RBMTrSymmLICH-L128NF4A2.5T0.9V14 91 4000
echo "#### [r5-B2] converge from-below at 0.925 (2 ext x 3000) ####"
time_left && $CONV 128 0.925 14 2 0.01 3000 4 120

echo "#### [r5-A3] from-above V15: 0.95 -> 0.925, 3000 iters ####"
time_left && train_anneal 0.925 15 RBMTrSymmLICH-L128NF4A2.5T0.95V15 92 3000
echo "#### [r5-A4] converge from-above at 0.925 (2 ext x 3000) ####"
time_left && $CONV 128 0.925 15 2 0.01 3000 4 120

echo "#### [r5-B3] from-below V14: 0.925 -> 0.95, 3000 iters ####"
time_left && train_anneal 0.95 14 RBMTrSymmLICH-L128NF4A2.5T0.925V14 93 3000
echo "#### [r5-B4] converge from-below at 0.95 (1 ext x 3000) ####"
time_left && $CONV 128 0.95 14 1 0.01 3000 4 120

echo "#### [r5-C] corr-ratio (independent observable) on all four landed arms ####"
for T in 0.925 0.95; do
  for VER in 14 15; do
    time_left || break 2
    PREFIX=runs/RBMTrSymmLICH-L128NF4A2.5T${T}V${VER}
    [ -f ${PREFIX}Dw.dat ] || [ -f ${PREFIX}.state.npz ] || continue
    echo "=== corrratio theta=$T V$VER ==="
    timeout 900 python -m neural_network_quantum_state_tpu.drivers.measure \
      -what=corrratio -ansatz=rbmtrsymm -L=128 -nf=4 -ns=8192 -prefix=$PREFIX \
      -niter=300 -nms=3 -nwarm=500 -nbeta=8 -fused=1 -seed=23 2>/dev/null | tail -1
  done
done

echo "#### [r5-D] stretch: tighten theta=0.9 from-above (anneal 0.925 -> 0.9 + measure) ####"
if time_left; then
  train_anneal 0.9 15 RBMTrSymmLICH-L128NF4A2.5T0.925V15 94 4000
  $CONV 128 0.9 15 1 0.01 3000 4 120
fi

echo "#### R5 N128 QUEUE DONE ####"
