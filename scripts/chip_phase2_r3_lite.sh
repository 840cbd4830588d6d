#!/bin/bash
# Lite variant of chip_phase2_r3.sh for a short end-of-round window:
# kernel A/Bs + ONE 4k-iter Hubbard L=32 trap training + energy/density
# measures (no 4k extension, no OPDM row).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

echo "#### kernel A/Bs ####"
timeout 1800 python scripts/bench_kernels_ab.py

echo "#### Hubbard L=32 trap: train 4k ####"
timeout 4500 python -m neural_network_quantum_state_tpu.drivers.train \
  -model=hubbard -L=32 -nf=64 -U=4 -t=1 -npar=5,5 -trap=0.05 \
  -ns=4096 -niter=4000 -nwarm=500 -lr=1e-2 -fused=1 \
  -path=runs -nrec=500 -seed=11 | tail -2

PREFIX=$(ls -t runs/RBMHB-L32* 2>/dev/null | grep -Ev '\.(jsonl|npz|dat)$' | head -1)
echo "trained checkpoint: $PREFIX"

echo "#### Hubbard L=32 trap: measure energy / density ####"
timeout 1500 python -m neural_network_quantum_state_tpu.drivers.measure \
  -what=energy -model=hubbard -U=4 -t=1 -trap=0.05 -ansatz=rbm -L=64 -nf=64 \
  -ns=4096 -prefix=$PREFIX -npar=5,5 -niter=200 -nms=3 -nwarm=500 -fused=1 -seed=3
timeout 1500 python -m neural_network_quantum_state_tpu.drivers.measure \
  -what=density -ansatz=rbm -L=64 -nf=64 \
  -ns=4096 -prefix=$PREFIX -npar=5,5 -niter=200 -nms=3 -nwarm=500 -fused=1 -seed=4
echo "#### PHASE 2 LITE DONE ####"
