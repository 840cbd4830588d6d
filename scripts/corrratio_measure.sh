#!/bin/bash
# Correlation-ratio measurement pass for one system size: for each theta,
# pick the LATEST checkpoint version (same selection as
# binder_final_measure.sh) and measure R_N = S(pi+2pi/N)/S(pi) with the
# tempered estimator - an independent crossing observable corroborating
# the Binder-cumulant theta_c.
#
# Usage: corrratio_measure.sh L "THETA ..." OUTLOG
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
L=$1
THETAS=$2
OUT=$3
: > "$OUT"
for T in $THETAS; do
  PREFIX=$(ls runs/RBMTrSymmLICH-L${L}NF4A2.5T${T}V* 2>/dev/null \
    | grep -Ev '\.(jsonl|npz|dat)$' | sort -t V -k 2 -n | tail -1)
  if [ -z "$PREFIX" ]; then
    echo "# skip theta=$T (no checkpoint)" >> "$OUT"
    continue
  fi
  echo "=== theta=$T ===" >> "$OUT"
  echo "# prefix: $PREFIX" >> "$OUT"
  timeout 900 python -m neural_network_quantum_state_tpu.drivers.measure \
    -what=corrratio -ansatz=rbmtrsymm -L=$L -nf=4 -ns=8192 -prefix=$PREFIX \
    -niter=300 -nms=3 -nwarm=500 -nbeta=8 -fused=1 -seed=23 >> "$OUT" 2>&1
  tail -1 "$OUT"
done
