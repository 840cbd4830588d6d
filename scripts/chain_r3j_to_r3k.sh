#!/bin/bash
# Fallback watcher: if campaign r3j exits WITHOUT having run the r3k queue
# (normal path: r3k runs first inside the [r3j-6] slot, which touches
# /tmp/r3k_done), run it here so the chip work always completes.
set -u
cd /root/repo
PID=$(cat /tmp/campaign_r3j.pid)
while kill -0 "$PID" 2>/dev/null; do sleep 60; done
echo "campaign r3j (PID $PID) exited at $(date -u +%H:%M:%S)"
if [ -f /tmp/r3k_done ]; then
  echo "r3k already ran inside the campaign - nothing to do"
else
  echo "r3k not yet run - launching fallback"
  bash scripts/post_campaign_r3k.sh > logs/post_campaign_r3k.log 2>&1
  touch /tmp/r3k_done
  echo "r3k exited at $(date -u +%H:%M:%S)"
fi
