#!/bin/bash
# Phase-2 chip jobs (run serially AFTER the Binder campaign):
#   1. round-3 kernel A/Bs on chip (fused exchange, FFNN fused energy)
#   2. Hubbard-at-scale physics deliverable: L=32 harmonic-trap ground
#      state (fused Kawasaki exchange training) + density/OPDM profile
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

echo "#### kernel A/Bs ####"
timeout 1800 python scripts/bench_kernels_ab.py

echo "#### minSR vs CG at large V (N=128 plain-RBM shapes) ####"
timeout 1800 python scripts/bench_minsr_ab.py

echo "#### Hubbard L=32 trap: train ####"
timeout 5400 python -m neural_network_quantum_state_tpu.drivers.train \
  -model=hubbard -L=32 -nf=64 -U=4 -t=1 -npar=5,5 -trap=0.05 \
  -ns=4096 -niter=4000 -nwarm=500 -lr=1e-2 -fused=1 \
  -path=runs -nrec=1000 -seed=11 | tail -2

PREFIX=$(ls -t runs/RBMHB-L32* 2>/dev/null | grep -v '\.' | head -1)
echo "trained checkpoint: $PREFIX"

echo "#### Hubbard L=32 trap: extend 4k ####"
timeout 5400 python -m neural_network_quantum_state_tpu.drivers.train \
  -model=hubbard -L=32 -nf=64 -U=4 -t=1 -npar=5,5 -trap=0.05 \
  -ns=4096 -niter=4000 -nwarm=0 -lr=1e-2 -fused=1 \
  -resume=$(basename $PREFIX) -path=runs -nrec=1000 -seed=12 | tail -2

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
echo "#### PHASE 2 DONE ####"
