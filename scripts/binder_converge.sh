#!/bin/bash
# Iterative convergence loop for one (L, theta, ver) Binder point:
# extend training in 8k-iteration PT blocks (structured -resume: the lambda
# schedule and walkers continue) until the measured U stops moving by more
# than TOL between blocks, or MAXEXT extensions. Usage:
#   binder_converge.sh L THETA VER [MAXEXT] [TOL]
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
L=$1; T=$2; VER=$3; MAXEXT=${4:-3}; TOL=${5:-0.005}
PREFIX=runs/RBMTrSymmLICH-L${L}NF4A2.5T${T}V${VER}
measure_u() {
  timeout 900 python -m neural_network_quantum_state_tpu.drivers.measure \
    -what=stag -ansatz=rbmtrsymm -L=$L -nf=4 -ns=8192 -prefix=$PREFIX \
    -niter=300 -nms=3 -nwarm=500 -nbeta=8 -fused=1 -seed=21 \
    | grep -o 'binder=[0-9.]*' | cut -d= -f2
}
U_PREV=$(measure_u)
echo "point L=$L T=$T V$VER: U0=$U_PREV"
for i in $(seq 1 $MAXEXT); do
  timeout 3000 python -m neural_network_quantum_state_tpu.drivers.train \
    -model=LICH -ansatz=rbmtrsymm -L=$L -nf=4 -theta=$T -alpha=2.5 -ver=$VER \
    -ns=8192 -niter=8000 -nwarm=0 -lr=1e-2 -nbeta=4 -fused=1 \
    -resume=RBMTrSymmLICH-L${L}NF4A2.5T${T}V${VER} -path=runs -nrec=2000 -seed=$((42+i)) \
    | tail -1
  U_NEW=$(measure_u)
  DELTA=$(python -c "print(abs($U_NEW - $U_PREV))")
  echo "ext $i: U=$U_NEW (prev $U_PREV, |dU|=$DELTA)"
  CONV=$(python -c "print(1 if abs($U_NEW - $U_PREV) < $TOL else 0)")
  U_PREV=$U_NEW
  if [ "$CONV" = "1" ]; then echo "converged: U=$U_NEW after $i extensions"; exit 0; fi
done
echo "NOT converged after $MAXEXT extensions: U=$U_PREV"
