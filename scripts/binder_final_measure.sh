#!/bin/bash
# Final Binder measurement pass for one system size: for each theta, pick
# the LATEST checkpoint version (the convergence campaign always writes
# higher versions under the stricter two-sided protocol) and measure it
# with the standard tempered estimator settings, emitting the
# '=== theta=X ===' log format that examples/binder_crossing.py parses.
#
# Usage: binder_final_measure.sh L "THETA ..." OUTLOG
#   e.g. binder_final_measure.sh 64 "0.4 0.7 0.9 0.95 1 1.05 1.1" logs/measure_stag_N64_final.log
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
L=$1
THETAS=$2
OUT=$3
: > "$OUT"
for T in $THETAS; do
  # checkpoint files have no extension; drop .metrics.jsonl/.state.npz/.dat
  PREFIX=$(ls runs/RBMTrSymmLICH-L${L}NF4A2.5T${T}V* 2>/dev/null \
    | grep -Ev '\.(jsonl|npz|dat)$' | sort -t V -k 2 -n | tail -1)
  if [ -z "$PREFIX" ]; then
    echo "# skip theta=$T (no checkpoint)" >> "$OUT"
    continue
  fi
  echo "=== theta=$T ===" >> "$OUT"
  echo "# prefix: $PREFIX" >> "$OUT"
  timeout 900 python -m neural_network_quantum_state_tpu.drivers.measure \
    -what=stag -ansatz=rbmtrsymm -L=$L -nf=4 -ns=8192 -prefix=$PREFIX \
    -niter=300 -nms=3 -nwarm=500 -nbeta=8 -fused=1 -seed=21 >> "$OUT" 2>&1
  tail -1 "$OUT"
done
