#!/bin/bash
# Watcher: when campaign r3h exits, launch the N=128 ladder (r3i) if
# enough wall clock remains in the round (round ends ~10:20 UTC; r3i
# needs ~3h, so only start before 06:30 UTC).
set -u
cd /root/repo
PID=$(cat /tmp/campaign_r3h.pid 2>/dev/null || echo "")
while [ -z "$PID" ]; do
  sleep 60
  PID=$(cat /tmp/campaign_r3h.pid 2>/dev/null || echo "")
done
while kill -0 "$PID" 2>/dev/null; do sleep 60; done
echo "r3h gone at $(date); tail:" >> logs/chain_r3i.log
tail -3 logs/binder_n96_r3h.log >> logs/chain_r3i.log 2>/dev/null
H=$(date -u +%H)
if [ "$H" -ge 7 ] && [ "$H" -lt 22 ]; then
  echo "past the 06:59 UTC cutoff (hour=$H) - not launching r3i" >> logs/chain_r3i.log
  exit 0
fi
nohup bash scripts/binder_n128_r3i.sh > logs/binder_n128_r3i.log 2>&1 &
echo $! > /tmp/campaign_r3i.pid
echo "launched r3i pid $(cat /tmp/campaign_r3i.pid)" >> logs/chain_r3i.log
