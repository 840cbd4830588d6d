#!/bin/bash
# Final compressed tail of the round-3 Binder campaign (after r3c's N=64
# block and N=32 theta=1/0.95; see logs/binder_campaign_r3{b,c}.log):
# converge the last two N=32 points, run the final measurement passes,
# then the phase-2 kernel A/Bs + Hubbard L=32 trap deliverable.
# The N=16 third FSS size is covered by the exact N=12/16/20/24 ED grids
# (logs/binder_exact_*.json) - exact values beat VMC for anchor purposes.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
CONV=scripts/binder_converge.sh

echo "#### N=32 theta=0.9 V11 converge ####"
bash $CONV 32 0.9 11 4 0.005

echo "#### N=32 theta=0.925 V11 (anneal from T0.95V11) ####"
timeout 3600 python -m neural_network_quantum_state_tpu.drivers.train \
  -model=LICH -ansatz=rbmtrsymm -L=32 -nf=4 -theta=0.925 -alpha=2.5 -ver=11 \
  -ns=8192 -niter=8000 -nwarm=500 -lr=1e-2 -nbeta=4 -fused=1 \
  -ifprefix=RBMTrSymmLICH-L32NF4A2.5T0.95V11 -path=runs -nrec=2000 -seed=77 | tail -1
bash $CONV 32 0.925 11 3 0.005

echo "#### FINAL MEASUREMENT PASSES ####"
bash scripts/binder_final_measure.sh 64 "0.9 0.925 0.95 1 1.05" logs/measure_stag_N64_final.log
bash scripts/binder_final_measure.sh 32 "0.9 0.925 0.95 1" logs/measure_stag_N32_final.log

echo "#### PHASE 2 (lite) ####"
bash scripts/chip_phase2_r3_lite.sh
echo "#### CAMPAIGN r3d DONE ####"
