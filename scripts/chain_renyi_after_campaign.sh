#!/bin/bash
# Watcher: run the heavy N=64 Renyi re-measure once the r3j campaign AND the
# r3k fallback watcher have both exited (i.e. the chip queue is fully
# drained), so it never contends with the FSS ladders for the single chip.
set -u
cd /root/repo
for PIDFILE in /tmp/campaign_r3j.pid /tmp/chain_r3k.pid; do
  [ -r "$PIDFILE" ] || continue
  PID=$(cat "$PIDFILE")
  while kill -0 "$PID" 2>/dev/null; do sleep 60; done
done
echo "chip queue drained at $(date -u +%H:%M:%S)"

# Correlation-ratio passes over the larger trained sizes: each adds VMC
# pair crossings to the corr-ratio drift fit (binder_fss_final.py
# vmc_corrratio_points). Missing checkpoints are skipped per theta, so
# running these unconditionally is safe even if N=128 never trained.
echo "#### corr-ratio passes N=96/128 ####"
bash scripts/corrratio_measure.sh 96 "0.85 0.875 0.9 0.925 0.95" logs/corrratio_N96.log
bash scripts/corrratio_measure.sh 128 "0.85 0.875 0.9 0.925 0.95" logs/corrratio_N128.log

echo "#### heavy Renyi pass ####"
bash scripts/renyi_n64_heavy.sh
touch /tmp/renyi_heavy_done
