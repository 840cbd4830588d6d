#!/bin/bash
# r5c chip queue (resumed after VM restart killed scripts/r5_n128_queue.sh
# mid-flight). Serial, single-chip, self-contained. Two goals, in order:
#
#  1. N=28 precision-anchor VMC arm (round-4 verdict item 4 second half):
#     the k=0-sector ED anchor E0=-0.845145963 is already in
#     logs/precision_anchor_ed_N28.json; this runs the production
#     mixed-precision staged-lr training and the report stage.
#
#  2. N=128 two-sided Binder ladder at theta = 0.925 / 0.95 (verdict item
#     1) - the r5 plan, restarted from the landed state:
#       * from-above V15 at 0.95 landed (A1, 4000 iters, U0=0.505127);
#         its convergence extension died with the VM.
#       * from-below V14 still sits at theta=0.9 (the 8k-iter r4 arm).
#     All .state.npz walker snapshots were removed by the artifact policy,
#     so the FIRST extension of each lineage warm-starts from the text
#     checkpoint (-ifprefix, params only, nwarm=500); subsequent blocks in
#     this session resume the fresh .state.npz. rsd=0 everywhere (the
#     from-above stall root cause), cgmax=120 (ill-conditioned from-above
#     states otherwise run full-Krylov f64 solves).
#
# Cutoff: /tmp/r5_cutoff (epoch secs, live-adjustable) else launch+4h05m.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

LOG=logs/r5c_queue.log
: > "$LOG"
exec >> "$LOG" 2>&1

LAUNCH_CUTOFF=$(( $(date -u +%s) + 14700 ))
cutoff_epoch() {
  if [ -r /tmp/r5_cutoff ]; then cat /tmp/r5_cutoff; else echo "$LAUNCH_CUTOFF"; fi
}
time_left() { [ "$(date -u +%s)" -lt "$(cutoff_epoch)" ]; }

echo "#### [r5c-0] N=28 precision-anchor VMC (mixed-precision, staged lr) ####"
date -u
time_left && timeout 4200 python examples/precision_anchor.py train 28 11
time_left && python examples/precision_anchor.py report

# ---------------- N=128 ladder machinery ----------------

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

measure_u() { # PREFIX
  local u
  for attempt in 1 2 3; do
    u=$(timeout 900 python -m neural_network_quantum_state_tpu.drivers.measure \
      -what=stag -ansatz=rbmtrsymm -L=128 -nf=4 -ns=8192 -prefix=$1 \
      -niter=300 -nms=3 -nwarm=500 -nbeta=8 -fused=1 -seed=21 2>/dev/null \
      | grep -o 'binder=[0-9.-]*' | cut -d= -f2)
    if [ -n "$u" ]; then echo "$u"; return 0; fi
    echo "measure attempt $attempt empty; sleeping 120s" >&2
    sleep 120
  done
  echo ""
}

train_ext() { # THETA VER SEED NITER  (resume state.npz if present, else ifprefix)
  local T=$1 VER=$2 SEED=$3 NITER=$4
  local NAME=RBMTrSymmLICH-L128NF4A2.5T${T}V${VER}
  local SRC
  if [ -f runs/${NAME}.state.npz ]; then SRC="-resume=${NAME} -nwarm=0"; else SRC="-ifprefix=${NAME} -nwarm=500"; fi
  for attempt in 1 2 3; do
    timeout 2700 python -m neural_network_quantum_state_tpu.drivers.train \
      -model=LICH -ansatz=rbmtrsymm -L=128 -nf=4 -theta=$T -alpha=2.5 -ver=$VER \
      -ns=8192 -niter=$NITER -lr=1e-2 -nbeta=4 -fused=1 -blockmoves=1 \
      -rsd=0 -cgmax=120 $SRC -path=runs -nrec=2000 -seed=$SEED | tail -1 && return 0
    echo "train_ext attempt $attempt failed; sleeping 60s" >&2
    sleep 60
  done
  return 1
}

converge() { # THETA VER U_PREV MAXEXT SEEDBASE  (prints point/ext lines)
  local T=$1 VER=$2 U_PREV=$3 MAXEXT=$4 SB=$5
  local PREFIX=runs/RBMTrSymmLICH-L128NF4A2.5T${T}V${VER}
  if [ -z "$U_PREV" ]; then
    U_PREV=$(measure_u $PREFIX)
    [ -z "$U_PREV" ] && { echo "ABORT $PREFIX: initial measure failed"; return 1; }
    echo "point L=128 T=$T V$VER: U0=$U_PREV"
  fi
  for i in $(seq 1 $MAXEXT); do
    time_left || { echo "cutoff inside converge T=$T V$VER"; return 0; }
    train_ext $T $VER $((SB + i)) 3000 || { echo "ABORT $PREFIX: ext $i train failed"; return 1; }
    local U_NEW=$(measure_u $PREFIX)
    [ -z "$U_NEW" ] && { echo "ABORT $PREFIX: ext $i measure failed"; return 1; }
    echo "ext $i: T=$T V$VER U=$U_NEW (prev $U_PREV, |dU|=$(python -c "print(abs($U_NEW - $U_PREV))"))"
    if python -c "import sys; sys.exit(0 if abs($U_NEW - $U_PREV) < 0.01 else 1)"; then
      echo "converged: T=$T V$VER U=$U_NEW after $i extensions"; return 0
    fi
    U_PREV=$U_NEW
  done
  echo "NOT converged after $MAXEXT extensions: T=$T V$VER U=$U_PREV"
}

echo "#### [r5c-1] from-above V15 at 0.95: converge (U0=0.505127 from r5-A2) ####"
date -u
time_left && converge 0.95 15 0.505127 1 50

echo "#### [r5c-2] from-below V14: anneal 0.9 -> 0.925 (4000 iters) ####"
date -u
time_left && train_anneal 0.925 14 RBMTrSymmLICH-L128NF4A2.5T0.9V14 91 4000
echo "#### [r5c-3] converge from-below at 0.925 (max 2 ext) ####"
time_left && converge 0.925 14 "" 2 60

echo "#### [r5c-4] from-above V15: anneal 0.95 -> 0.925 (3000 iters) ####"
date -u
time_left && train_anneal 0.925 15 RBMTrSymmLICH-L128NF4A2.5T0.95V15 92 3000
echo "#### [r5c-5] converge from-above at 0.925 (max 2 ext) ####"
time_left && converge 0.925 15 "" 2 70

echo "#### [r5c-6] from-below V14: anneal 0.925 -> 0.95 (3000 iters) ####"
date -u
time_left && train_anneal 0.95 14 RBMTrSymmLICH-L128NF4A2.5T0.925V14 93 3000
echo "#### [r5c-7] converge from-below at 0.95 (max 1 ext) ####"
time_left && converge 0.95 14 "" 1 80

echo "#### [r5c-8] corr-ratio (independent observable) on all landed arms ####"
date -u
for T in 0.925 0.95; do
  for VER in 14 15; do
    time_left || break 2
    PREFIX=runs/RBMTrSymmLICH-L128NF4A2.5T${T}V${VER}
    [ -f ${PREFIX} ] || continue
    echo "=== corrratio theta=$T V$VER ==="
    timeout 900 python -m neural_network_quantum_state_tpu.drivers.measure \
      -what=corrratio -ansatz=rbmtrsymm -L=128 -nf=4 -ns=8192 -prefix=$PREFIX \
      -niter=300 -nms=3 -nwarm=500 -nbeta=8 -fused=1 -seed=23 2>/dev/null | tail -1
  done
done

echo "#### [r5c-9] stretch: theta=0.9 from-above (anneal 0.925 -> 0.9) ####"
date -u
if time_left; then
  train_anneal 0.9 15 RBMTrSymmLICH-L128NF4A2.5T0.925V15 94 3000
  converge 0.9 15 "" 1 90
fi

echo "#### R5C QUEUE DONE ####"
date -u
