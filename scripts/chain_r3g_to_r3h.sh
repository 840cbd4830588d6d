#!/bin/bash
# Watcher: when campaign r3g's process exits, launch the N=96 ladder (r3h).
# Runs as its own nohup'd process so it survives session restarts.
set -u
cd /root/repo
PID=$(cat /tmp/campaign_r3g.pid 2>/dev/null || echo "")
if [ -n "$PID" ]; then
  while kill -0 "$PID" 2>/dev/null; do sleep 60; done
fi
echo "r3g process gone at $(date); log tail:" >> logs/chain_r3h.log
tail -3 logs/binder_campaign_r3g.log >> logs/chain_r3h.log
nohup bash scripts/binder_n96_r3h.sh > logs/binder_n96_r3h.log 2>&1 &
echo $! > /tmp/campaign_r3h.pid
echo "launched r3h pid $(cat /tmp/campaign_r3h.pid)" >> logs/chain_r3h.log
