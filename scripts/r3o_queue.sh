#!/bin/bash
# r3o chip queue (chains after r3n): final tightening of the remaining
# wide two-sided arms feeding the (32,64)/(64,96) Binder crossings.
# Per-arm state after r3m (scripts/binder_fss_final.py vmc_table):
#   L=96 theta=0.9   below V1  0.344 vs above 0.588  <- widest (halfspread 0.12)
#   L=64 theta=0.875 below V14 0.210 / above V15 0.332, both unconverged
#   L=96 theta=0.875 above V2  0.245 descending vs below 0.133
#   L=64 theta=0.9   below V16 0.450 climbing +0.0065/8k-block
#   L=64 theta=0.925 below V12 0.578 vs above 0.6305
#   L=96 theta=0.925 below V1  0.579 climbing +0.017/block vs above 0.635
# Quick-closing arms first (value lands even if the cutoff hits), then the
# stubborn theta=0.9 from-below arms with doubled blocks (16k iters) and a
# deeper PT ladder (nbeta=6), then the final stag + corr-ratio re-measure
# passes. Gated on /tmp/r3o_cutoff (epoch seconds, live-updatable).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

echo "#### r3o waiting for r3n ####"
while ! grep -q "R3N QUEUE DONE" logs/r3n_queue.log 2>/dev/null; do sleep 60; done

cutoff_epoch() {
  if [ -r /tmp/r3o_cutoff ]; then cat /tmp/r3o_cutoff; else
    date -u -d '2026-08-19 07:00' +%s
  fi
}
time_left() { [ "$(date -u +%s)" -lt "$(cutoff_epoch)" ]; }

echo "#### [r3o-1] quick-closing arms (standard 8k blocks) ####"
for SPEC in "96 0.925 1 6" "96 0.875 2 6" "64 0.925 12 6" \
            "64 0.875 14 5" "64 0.875 15 5"; do
  time_left || { echo "r3o cutoff before point $SPEC"; break; }
  set -- $SPEC
  echo "######## N=$1 theta=$2 V$3 tighten (r3o quick) ########"
  bash scripts/binder_converge_bm.sh $1 $2 $3 $4 0.005
done

echo "#### [r3o-2] stubborn theta=0.9 from-below arms (16k blocks, nbeta=6) ####"
for SPEC in "96 0.9 1 10" "64 0.9 16 7"; do
  time_left || { echo "r3o cutoff before point $SPEC"; break; }
  set -- $SPEC
  echo "######## N=$1 theta=$2 V$3 tighten (r3o heavy) ########"
  bash scripts/binder_converge_bm.sh $1 $2 $3 $4 0.005 16000 6
done

echo "#### [r3o-3] final re-measure passes ####"
if time_left; then
  bash scripts/binder_final_measure.sh 96 "0.85 0.875 0.9 0.925 0.95" logs/measure_stag_N96_final4.log
  bash scripts/binder_final_measure.sh 64 "0.85 0.875 0.9 0.925 0.95" logs/measure_stag_N64_final4.log
  bash scripts/corrratio_measure.sh 64 "0.85 0.875 0.9 0.925 0.95 1" logs/corrratio_N64.log
  bash scripts/corrratio_measure.sh 96 "0.85 0.875 0.9 0.925 0.95" logs/corrratio_N96.log
fi

echo "#### R3O QUEUE DONE ####"
