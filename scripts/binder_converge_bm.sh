#!/bin/bash
# Block-move variant of binder_converge_retry.sh: extension training blocks
# add -blockmoves=1 (symmetric block-flip proposals) so from-below anneals
# do not false-plateau in trapped disordered configurations - the N=32
# theta=0.9 V10 from-below converge "converged" at U=0.289 vs 0.509 from
# above (campaign r3g), a sampling trap, not an equilibrium. The tempered
# MEASUREMENT protocol is unchanged, so U values stay comparable. Usage:
#   binder_converge_bm.sh L THETA VER [MAXEXT] [TOL] [NITER] [NBETA]
# NITER/NBETA beef up each extension block for stubborn arms (the theta=0.9
# from-below lineages climb at only ~0.007-0.012/8k-iter block).
set -u -o pipefail
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
L=$1; T=$2; VER=$3; MAXEXT=${4:-3}; TOL=${5:-0.005}
NITER=${6:-8000}; NBETA=${7:-4}; CGMAX=${8:-1000}
PREFIX=runs/RBMTrSymmLICH-L${L}NF4A2.5T${T}V${VER}

measure_u() {
  local u
  for attempt in 1 2 3; do
    u=$(timeout 900 python -m neural_network_quantum_state_tpu.drivers.measure \
      -what=stag -ansatz=rbmtrsymm -L=$L -nf=4 -ns=8192 -prefix=$PREFIX \
      -niter=300 -nms=3 -nwarm=500 -nbeta=8 -fused=1 -seed=21 2>/dev/null \
      | grep -o 'binder=[0-9.-]*' | cut -d= -f2)
    if [ -n "$u" ]; then echo "$u"; return 0; fi
    echo "measure attempt $attempt empty; sleeping 120s" >&2
    sleep 120
  done
  echo ""
}

train_block() {
  local seed=$1
  for attempt in 1 2 3; do
    if timeout 3000 python -m neural_network_quantum_state_tpu.drivers.train \
      -model=LICH -ansatz=rbmtrsymm -L=$L -nf=4 -theta=$T -alpha=2.5 -ver=$VER \
      -ns=8192 -niter=$NITER -nwarm=0 -lr=1e-2 -nbeta=$NBETA -fused=1 -blockmoves=1 \
      -rsd=0 -cgmax=$CGMAX -resume=RBMTrSymmLICH-L${L}NF4A2.5T${T}V${VER} -path=runs -nrec=2000 \
      -seed=$seed | tail -1; then return 0; fi
    echo "train attempt $attempt failed; sleeping 120s" >&2
    sleep 120
  done
  return 1
}

U_PREV=$(measure_u)
if [ -z "$U_PREV" ]; then echo "ABORT $PREFIX: initial measure failed"; exit 1; fi
echo "point L=$L T=$T V$VER: U0=$U_PREV"
for i in $(seq 1 $MAXEXT); do
  train_block $((42 + i)) || { echo "ABORT $PREFIX: train block $i failed"; exit 1; }
  U_NEW=$(measure_u)
  if [ -z "$U_NEW" ]; then echo "ABORT $PREFIX: measure after block $i failed"; exit 1; fi
  DELTA=$(python -c "print(abs($U_NEW - $U_PREV))")
  echo "ext $i: U=$U_NEW (prev $U_PREV, |dU|=$DELTA)"
  CONV=$(python -c "print(1 if abs($U_NEW - $U_PREV) < $TOL else 0)")
  U_PREV=$U_NEW
  if [ "$CONV" = "1" ]; then echo "converged: U=$U_NEW after $i extensions"; exit 0; fi
done
echo "NOT converged after $MAXEXT extensions: U=$U_PREV"
