#!/bin/bash
# Post-campaign chip work (r3k), serial on the one chip, cheap-first so an
# interruption loses the least. Run AFTER binder_campaign_r3j.sh prints
# "CAMPAIGN r3j DONE".
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

echo "#### [r3k-1] TPU verify drive ####"
timeout 900 python scripts/drive_vmc.py tpu || echo "verify drive FAILED"

echo "#### [r3k-2] energy-kernel A/B: phase-product + unroll ####"
timeout 2400 python scripts/bench_kernels_ab.py \
  > logs/bench_kernels_ab_r3k.log 2>&1 \
  && tail -25 logs/bench_kernels_ab_r3k.log || echo "A/B FAILED (see log)"

echo "#### [r3k-3] correlation-ratio VMC passes ####"
bash scripts/corrratio_measure.sh 64 "0.85 0.875 0.9 0.925 0.95 1" logs/corrratio_N64.log
bash scripts/corrratio_measure.sh 32 "0.85 0.875 0.9 0.925 0.95 1" logs/corrratio_N32.log

echo "#### [r3k-4] N=64 theta=1.1 from-below extension + re-measure ####"
# the final-pass outlier (U=0.628 vs ~0.66 neighbors): extend V10 8k more
timeout 3600 python -m neural_network_quantum_state_tpu.drivers.train \
  -model=LICH -ansatz=rbmtrsymm -L=64 -nf=4 -theta=1.1 -alpha=2.5 \
  -ns=4096 -niter=8000 -nwarm=0 -lr=1e-2 -fused=1 -nbeta=4 -blockmoves=1 \
  -resume=RBMTrSymmLICH-L64NF4A2.5T1.1V10 -path=runs -nrec=1000 -seed=31 | tail -2
bash scripts/binder_final_measure.sh 64 "1.1" logs/measure_stag_N64_T11_redo.log

echo "#### [r3k-5] Hubbard L=32 trap deliverable (re-run after TPU worker crash) ####"
bash scripts/hubbard_l32_trap.sh > logs/hubbard_l32_trap.log 2>&1 \
  && echo "hubbard L32 trap OK" || echo "hubbard L32 trap FAILED (see logs/hubbard_l32_trap.log)"

echo "#### [r3k-6] bench sanity ####"
timeout 2400 python bench.py || echo "bench FAILED"

echo "#### POST-CAMPAIGN r3k DONE ####"
