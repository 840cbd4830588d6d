#!/bin/bash
# r3s chip queue: the final-session condensation of the unexecuted
# r3o/r3p/r3q/r3r queues into the ~50 min of chip time that actually
# remains. Strictly serial on the one chip, cheap-first, every item
# time-gated so the round never ends with the chip mid-flight.
#  1. TPU verify drive      - end-to-end physics sanity on the real chip.
#  2. bench.py sanity       - the driver re-runs it at round end; catch
#                             breakage now while there is time to react.
#  3. Central-charge profile (r3p-0, reduced): S2(l') increment profile at
#     theta=0.9 ~ theta_c on the CONVERGED from-above V11 state - replaces
#     the gapped-looking c-fit measured on the stale round-2 V9 state.
#  4. Hubbard L=32 trap re-measures with nwarm=5000 (r3p-1, reduced):
#     the r3l pass at nwarm=500 was shown unequilibrated
#     (logs/hb_warmup_check.log: +0.232 vs -0.119 on the same state).
#  5. z2q on-chip validation (r3r-4, reduced): pure increment chain
#     (l0=0 -z2q=1) must reproduce the hybrid 6e value 0.639(2) at
#     N=64 theta=1.57 l=32.
# Gated on /tmp/r3s_cutoff (epoch seconds, live-updatable).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

cutoff_epoch() {
  if [ -r /tmp/r3s_cutoff ]; then cat /tmp/r3s_cutoff; else
    date -u -d '2026-08-19 10:40' +%s
  fi
}
time_left() { [ "$(date -u +%s)" -lt "$(cutoff_epoch)" ]; }

echo "#### [r3s-1] TPU verify drive ####  $(date -u +%H:%M:%S)"
timeout 420 python scripts/drive_vmc.py tpu || echo "verify drive FAILED"

echo "#### [r3s-2] bench sanity ####  $(date -u +%H:%M:%S)"
if time_left; then
  timeout 800 python bench.py > logs/bench_r3_sanity.log 2>&1 \
    && tail -1 logs/bench_r3_sanity.log || echo "bench FAILED (see logs/bench_r3_sanity.log)"
fi

echo "#### [r3s-3] central-charge profile on converged V11 (theta=0.9) ####  $(date -u +%H:%M:%S)"
if time_left; then
  timeout 1000 python -m neural_network_quantum_state_tpu.drivers.measure \
    -what=renyi_inc -ansatz=rbmtrsymm -L=64 -nf=4 -ns=512 \
    -prefix=runs/RBMTrSymmLICH-L64NF4A2.5T0.9V11 -l=32 -l0=1 \
    -nbeta=4 -init=neel -niter=800 -nms=2 -nwarm=600 -seed=33 -mchunk=50 \
    > logs/renyi_profile_N64_T09.log 2>&1 \
    && tail -2 logs/renyi_profile_N64_T09.log || echo "CC profile FAILED (see log)"
  python scripts/central_charge_fit.py logs/renyi_profile_N64_T09.log -N=64 \
    -lmin=4 -json=logs/central_charge_N64_T09.json || true
fi

PREFIX=RBMHB-L32U4V2
echo "#### [r3s-4] Hubbard L=32 trap equilibrated energy (nwarm=5000) ####  $(date -u +%H:%M:%S)"
if time_left; then
  timeout 700 python -m neural_network_quantum_state_tpu.drivers.measure \
    -what=energy -model=hubbard -U=4 -t=1 -trap=0.05 -ansatz=rbm -L=64 -nf=64 -mchunk=25 \
    -ns=4096 -prefix=runs/$PREFIX -npar=5,5 -niter=300 -nms=3 -nwarm=5000 -fused=1 -seed=3 \
    > logs/hubbard_trap_energy_eq.log 2>&1 \
    && tail -2 logs/hubbard_trap_energy_eq.log || echo "hubbard energy FAILED (see log)"
fi

echo "#### [r3s-5] z2q on-chip validation (N=64 theta=1.57, pure chain) ####  $(date -u +%H:%M:%S)"
if time_left; then
  timeout 700 python -m neural_network_quantum_state_tpu.drivers.measure \
    -what=renyi_inc -ansatz=rbmtrsymm -L=64 -nf=4 -ns=256 \
    -prefix=runs/RBMTrSymmLICH-L64NF4A2.5T1.57V9 -l=32 -l0=0 -z2q=1 \
    -init=neel -niter=500 -nms=2 -nwarm=400 -seed=41 -mchunk=25 \
    > logs/renyi_z2q_N64_T157.log 2>&1 \
    && tail -3 logs/renyi_z2q_N64_T157.log || echo "z2q validation FAILED (see log)"
fi

echo "#### [r3s-6] Hubbard L=32 trap equilibrated density profile ####  $(date -u +%H:%M:%S)"
if time_left; then
  timeout 600 python -m neural_network_quantum_state_tpu.drivers.measure \
    -what=density -ansatz=rbm -L=64 -nf=64 -mchunk=25 \
    -ns=4096 -prefix=runs/$PREFIX -npar=5,5 -niter=300 -nms=3 -nwarm=5000 -fused=1 -seed=4 \
    > logs/hubbard_trap_density_eq.log 2>&1 \
    && tail -2 logs/hubbard_trap_density_eq.log || echo "hubbard density FAILED (see log)"
fi

echo "#### [r3s-7] Hubbard L=32 trap equilibrated OPDM row ####  $(date -u +%H:%M:%S)"
if time_left; then
  timeout 600 python -m neural_network_quantum_state_tpu.drivers.measure \
    -what=opdm -ansatz=rbm -L=64 -nf=64 -mchunk=25 \
    -ns=4096 -prefix=runs/$PREFIX -npar=5,5 -site=16 -niter=300 -nms=3 -nwarm=5000 -fused=1 -seed=5 \
    > logs/hubbard_trap_opdm_eq.log 2>&1 \
    && tail -2 logs/hubbard_trap_opdm_eq.log || echo "hubbard opdm FAILED (see log)"
fi

echo "#### R3S QUEUE DONE ####  $(date -u +%H:%M:%S)"
