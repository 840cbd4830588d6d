#!/bin/bash
# r3r chip queue (chains after r3q): end-of-round closure work, serial on
# the one chip, cheap-first so an interruption loses the least.
#  1. TPU verify drive (end-to-end physics check on the real chip).
#  2. bench.py sanity (the driver re-runs it at round end; catch surprises
#     now while there is time to react).
#  3. On-chip validation of the new in-chain Z2 orbit quadrature
#     (-z2q=1): pure increment chain (l0=0) at N=64 theta=1.57 l=32 must
#     reproduce the hybrid-config 6e value 0.639(2) WITHOUT the -l0 swap
#     base - the production A/B for the frozen-sector rescue that the
#     CPU regression test demonstrates at N=6.
# Gated on /tmp/r3r_cutoff (epoch seconds, live-updatable).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

echo "#### r3r waiting for r3q ####"
while ! grep -q "R3Q QUEUE DONE" logs/r3q_queue.log 2>/dev/null; do sleep 60; done

cutoff_epoch() {
  if [ -r /tmp/r3r_cutoff ]; then cat /tmp/r3r_cutoff; else
    date -u -d '2026-08-19 13:30' +%s
  fi
}
time_left() { [ "$(date -u +%s)" -lt "$(cutoff_epoch)" ]; }

echo "#### [r3r-1] TPU verify drive ####"
timeout 900 python scripts/drive_vmc.py tpu || echo "verify drive FAILED"

echo "#### [r3r-2] SR solver A/B at the flagship shape (cg vs dense) ####"
if time_left; then
  timeout 2400 python scripts/bench_sr_solver_ab.py \
    > logs/bench_sr_solver_ab.log 2>&1 \
    && cat logs/bench_sr_solver_ab.log || echo "solver A/B FAILED (see log)"
fi

echo "#### [r3r-3] bench sanity ####"
if time_left; then
  timeout 2400 python bench.py || echo "bench FAILED"
fi

echo "#### [r3r-4] z2q on-chip validation: pure chain vs hybrid (N=64 theta=1.57) ####"
if time_left; then
  timeout 4500 python -m neural_network_quantum_state_tpu.drivers.measure \
    -what=renyi_inc -ansatz=rbmtrsymm -L=64 -nf=4 -ns=256 \
    -prefix=runs/RBMTrSymmLICH-L64NF4A2.5T1.57V9 -l=32 -l0=0 -z2q=1 \
    -init=neel -niter=800 -nms=2 -nwarm=400 -seed=41 -mchunk=25 \
    > logs/renyi_z2q_N64_T157.log 2>&1 \
    && tail -3 logs/renyi_z2q_N64_T157.log || echo "z2q validation FAILED (see log)"
fi

echo "#### R3R QUEUE DONE ####"
