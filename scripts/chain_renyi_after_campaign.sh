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
echo "chip queue drained at $(date -u +%H:%M:%S) - launching heavy Renyi pass"
bash scripts/renyi_n64_heavy.sh
touch /tmp/renyi_heavy_done
