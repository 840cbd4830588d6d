#!/bin/bash
# Watcher: launch the r3l chip queue once the heavy Renyi pass (the last
# stage of chain_renyi_after_campaign.sh) touches /tmp/renyi_heavy_done,
# so it never contends with the earlier queue for the single chip.
set -u
cd /root/repo
while [ ! -f /tmp/renyi_heavy_done ]; do sleep 60; done
echo "renyi pass done at $(date -u +%H:%M:%S) - starting r3l"
bash scripts/r3l_queue.sh > logs/r3l_queue.log 2>&1
touch /tmp/r3l_done
echo "r3l exited at $(date -u +%H:%M:%S)"
