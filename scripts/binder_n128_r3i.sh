#!/bin/bash
# Campaign r3i slot, re-prioritized mid-round: the post-campaign chip queue
# (scripts/post_campaign_r3k.sh - verify drive, kernel A/B, corr-ratio VMC
# passes, theta=1.1 fixup, Hubbard L=32 trap re-run after the TPU worker
# crash, bench sanity) carries more round-3 value than a fourth FSS size,
# so it runs FIRST in this slot. The N=128 mini-ladders then run point by
# point behind a wall-clock gate (R3I_CUTOFF_EPOCH, default 14:15 UTC) so
# they can never crowd out the end-of-round analysis window; whatever
# trained before the cutoff still gets its measurement pass.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
CONV=scripts/binder_converge_bm.sh
# Cutoff is re-read from /tmp/r3i_cutoff (epoch seconds) at every gate so a
# live session can extend or shrink the window; default 14:15 UTC.
cutoff_epoch() {
  if [ -r /tmp/r3i_cutoff ]; then cat /tmp/r3i_cutoff; else
    echo "${R3I_CUTOFF_EPOCH:-$(date -u -d '2026-08-18 14:15' +%s)}"
  fi
}

echo "#### [r3i-0] post-campaign chip queue (r3k) first ####"
bash scripts/post_campaign_r3k.sh > logs/post_campaign_r3k.log 2>&1 \
  && echo "r3k OK" || echo "r3k FAILED (see logs/post_campaign_r3k.log)"
touch /tmp/r3k_done

time_left() { # true while before the (live-updatable) cutoff
  [ "$(date -u +%s)" -lt "$(cutoff_epoch)" ]
}

train_cold() { # THETA VER SEED
  local T=$1 VER=$2 SEED=$3
  for attempt in 1 2 3; do
    timeout 5400 python -m neural_network_quantum_state_tpu.drivers.train \
      -model=LICH -ansatz=rbmtrsymm -L=128 -nf=4 -theta=$T -alpha=2.5 -ver=$VER \
      -ns=8192 -niter=8000 -nwarm=500 -lr=1e-2 -nbeta=4 -fused=1 -blockmoves=1 \
      -path=runs -nrec=2000 -seed=$SEED | tail -1 && return 0
    echo "train_cold attempt $attempt failed; sleeping 120s" >&2
    sleep 120
  done
}

train_warm() { # THETA VER FROMPREFIX SEED
  local T=$1 VER=$2 FROM=$3 SEED=$4
  for attempt in 1 2 3; do
    timeout 5400 python -m neural_network_quantum_state_tpu.drivers.train \
      -model=LICH -ansatz=rbmtrsymm -L=128 -nf=4 -theta=$T -alpha=2.5 -ver=$VER \
      -ns=8192 -niter=8000 -nwarm=500 -lr=1e-2 -nbeta=4 -fused=1 -blockmoves=1 \
      -ifprefix=$FROM -path=runs -nrec=2000 -seed=$SEED | tail -1 && return 0
    echo "train_warm attempt $attempt failed; sleeping 120s" >&2
    sleep 120
  done
}

TRAINED_THETAS=""
echo "#### [r3i-1] N=128 from-below mini-ladder (V14), time-gated ####"
if time_left; then
  train_cold 0.7 14 101
  bash $CONV 128 0.7 14 2 0.005
  TRAINED_THETAS="0.7"
  PREV=RBMTrSymmLICH-L128NF4A2.5T0.7V14
  for T in 0.875 0.9; do
    time_left || { echo "cutoff reached before theta=$T (below)"; break; }
    train_warm $T 14 $PREV 101
    bash $CONV 128 $T 14 4 0.005
    TRAINED_THETAS="$TRAINED_THETAS $T"
    PREV=RBMTrSymmLICH-L128NF4A2.5T${T}V14
  done
else
  echo "cutoff already passed - skipping N=128 ladders entirely"
fi

echo "#### [r3i-2] N=128 from-above mini-ladder (V15), time-gated ####"
if time_left; then
  train_cold 1.2 15 102
  bash $CONV 128 1.2 15 2 0.005
  TRAINED_THETAS="$TRAINED_THETAS 1.2"
  PREV=RBMTrSymmLICH-L128NF4A2.5T1.2V15
  for T in 0.9 0.875; do
    time_left || { echo "cutoff reached before theta=$T (above)"; break; }
    train_warm $T 15 $PREV 102
    bash $CONV 128 $T 15 4 0.005
    TRAINED_THETAS="$TRAINED_THETAS $T"
    PREV=RBMTrSymmLICH-L128NF4A2.5T${T}V15
  done
fi

if [ -n "$TRAINED_THETAS" ]; then
  # dedup (0.875/0.9 appear in both ladders; final-measure picks the latest version)
  THETAS=$(echo $TRAINED_THETAS | tr ' ' '\n' | sort -un | tr '\n' ' ')
  echo "#### [r3i-3] N=128 measurement pass over trained points: $THETAS ####"
  bash scripts/binder_final_measure.sh 128 "$THETAS" logs/measure_stag_N128_final.log
fi
echo "#### N128 r3i DONE ####"
