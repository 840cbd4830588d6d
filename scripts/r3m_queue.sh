#!/bin/bash
# r3m chip queue: continuation of r3l. Six tighten points ended r3l with
# "NOT converged after 3 extensions" (|dU| still > 0.005/extension):
#   N=64 theta=0.9  V16 (U drifting up, 0.388 last)
#   N=96 theta=0.9  V1  (0.271 vs 0.588 from above - widest bracket left)
#   N=96 theta=0.925 V1 (0.502 vs 0.635)
#   N=96 theta=0.875 V2 (0.351 vs 0.133 from below)
#   N=96 theta=0.85  V2 (0.126 - nearly closed vs V1)
#   N=96 theta=0.95  V1 (0.613 vs 0.642 - nearly closed)
# Give each 6 more block-move extensions, then redo the stag + corr-ratio
# measurement passes so binder_fss_final reads the tightened states.
# Gated on /tmp/r3m_cutoff (epoch seconds, live-updatable).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

cutoff_epoch() {
  if [ -r /tmp/r3m_cutoff ]; then cat /tmp/r3m_cutoff; else
    date -u -d '2026-08-19 04:30' +%s
  fi
}
time_left() { [ "$(date -u +%s)" -lt "$(cutoff_epoch)" ]; }

echo "#### [r3m-1] continue non-converged tighten points (6 more extensions) ####"
for SPEC in "96 0.9 1" "96 0.925 1" "64 0.9 16" "96 0.875 2" "96 0.85 2" "96 0.95 1"; do
  time_left || { echo "r3m cutoff before point $SPEC"; break; }
  set -- $SPEC
  echo "######## N=$1 theta=$2 V$3 tighten (round 2) ########"
  bash scripts/binder_converge_bm.sh $1 $2 $3 6 0.005
done

echo "#### [r3m-2] re-measure passes over the round-2 tightened states ####"
if time_left; then
  bash scripts/binder_final_measure.sh 96 "0.85 0.875 0.9 0.925 0.95" logs/measure_stag_N96_final3.log
  bash scripts/binder_final_measure.sh 64 "0.9" logs/measure_stag_N64_T09_redo3.log
  # corr-ratio re-passes overwrite: binder_fss_final.vmc_corrratio_points
  # reads the whole file, last entry per theta wins
  bash scripts/corrratio_measure.sh 64 "0.85 0.875 0.9 0.925 0.95 1" logs/corrratio_N64.log
  bash scripts/corrratio_measure.sh 96 "0.85 0.875 0.9 0.925 0.95" logs/corrratio_N96.log
fi

echo "#### R3M QUEUE DONE ####"
