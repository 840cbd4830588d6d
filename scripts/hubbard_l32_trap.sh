#!/bin/bash
# Hubbard-at-scale physics deliverable (verdict item 4c), standalone rerun:
# the chip_phase2_r3.sh version omitted -ansatz=rbm and crashed at the CLI.
# L=32 harmonic-trap chain (64 JW spins), fused Kawasaki exchange training,
# then energy / density profile / OPDM on the trained state.
set -u -o pipefail
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

echo "#### Hubbard L=32 trap: train ####"
# retry: the first r3j attempt died on a transient TPU worker crash at iter 50
for attempt in 1 2 3; do
  timeout 5400 python -m neural_network_quantum_state_tpu.drivers.train \
    -model=hubbard -ansatz=rbm -L=32 -nf=64 -U=4 -t=1 -npar=5,5 -trap=0.05 \
    -ns=4096 -niter=4000 -nwarm=500 -lr=1e-2 -fused=1 \
    -path=runs -nrec=1000 -seed=11 | tail -2 && break
  echo "train attempt $attempt failed; sleeping 120s" >&2
  sleep 120
done

PREFIX=runs/RBMHB-L32U4V1
if [ ! -f "${PREFIX}Dw.dat" ] && [ ! -f "${PREFIX}.state.npz" ]; then
  echo "ABORT: no trained checkpoint at $PREFIX"; ls runs/ | grep -i "HB-L32"; exit 1
fi
echo "trained checkpoint: $PREFIX"

echo "#### Hubbard L=32 trap: extend 4k ####"
for attempt in 1 2 3; do
  timeout 5400 python -m neural_network_quantum_state_tpu.drivers.train \
    -model=hubbard -ansatz=rbm -L=32 -nf=64 -U=4 -t=1 -npar=5,5 -trap=0.05 \
    -ns=4096 -niter=4000 -nwarm=0 -lr=1e-2 -fused=1 \
    -resume=$(basename $PREFIX) -path=runs -nrec=1000 -seed=12 | tail -2 && break
  echo "extend attempt $attempt failed; sleeping 120s" >&2
  sleep 120
done

echo "#### Hubbard L=32 trap: measure energy / density / opdm ####"
timeout 1800 python -m neural_network_quantum_state_tpu.drivers.measure \
  -what=energy -model=hubbard -U=4 -t=1 -trap=0.05 -ansatz=rbm -L=64 -nf=64 \
  -ns=4096 -prefix=$PREFIX -npar=5,5 -niter=300 -nms=3 -nwarm=500 -fused=1 -seed=3
timeout 1800 python -m neural_network_quantum_state_tpu.drivers.measure \
  -what=density -ansatz=rbm -L=64 -nf=64 \
  -ns=4096 -prefix=$PREFIX -npar=5,5 -niter=300 -nms=3 -nwarm=500 -fused=1 -seed=4
timeout 1800 python -m neural_network_quantum_state_tpu.drivers.measure \
  -what=opdm -ansatz=rbm -L=64 -nf=64 \
  -ns=4096 -prefix=$PREFIX -npar=5,5 -site=16 -niter=300 -nms=3 -nwarm=500 -fused=1 -seed=5
echo "#### HUBBARD L32 TRAP DONE ####"
