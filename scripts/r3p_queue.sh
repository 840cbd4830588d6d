#!/bin/bash
# r3p chip queue (chains after r3o): redo the Hubbard L=32 harmonic-trap
# measurements with proper equilibration. logs/hb_warmup_check.log showed
# the r3l pass (nwarm=500) was unequilibrated: measured energy +0.232 at
# nwarm=500 vs -0.119 at nwarm=5000 on the same trained state (Kawasaki
# exchange dynamics in the trap mixes slowly; the spin campaigns' 500
# sweeps are not enough here). Re-measure energy / density / opdm with
# nwarm=5000 so the RESULTS trap-profile row reads equilibrated numbers.
# Gated on /tmp/r3p_cutoff (epoch seconds, live-updatable).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

echo "#### r3p waiting for r3o ####"
while ! grep -q "R3O QUEUE DONE" logs/r3o_queue.log 2>/dev/null; do sleep 60; done

cutoff_epoch() {
  if [ -r /tmp/r3p_cutoff ]; then cat /tmp/r3p_cutoff; else
    date -u -d '2026-08-19 08:15' +%s
  fi
}
time_left() { [ "$(date -u +%s)" -lt "$(cutoff_epoch)" ]; }

echo "#### [r3p-0] central-charge profile: near-critical S2(l') curve ####"
# carried over from r3n (the running r3n process predated the 1b block and
# skipped it): one heavy renyi_inc run at theta=0.9 ~ theta_c gives the
# whole S2(l') profile; fit S2(l) = (c/4) ln[(N/pi) sin(pi l/N)] + const
# (scripts/central_charge_fit.py). Measured on V11 - the two-sided
# campaign's converged from-above state (U=0.5236) - not the
# under-converged round-2 V9 state (whose profile saturates like a
# gapped state: c = 0.094 +/- 0.013 from the light r3n run).
if time_left; then
  timeout 4500 python -m neural_network_quantum_state_tpu.drivers.measure \
    -what=renyi_inc -ansatz=rbmtrsymm -L=64 -nf=4 -ns=1024 \
    -prefix=runs/RBMTrSymmLICH-L64NF4A2.5T0.9V11 -l=32 -l0=1 \
    -nbeta=4 -init=neel -niter=1600 -nms=2 -nwarm=800 -seed=33 -mchunk=50 \
    > logs/renyi_profile_N64_T09.log 2>&1
  python scripts/central_charge_fit.py logs/renyi_profile_N64_T09.log -N=64 \
    -lmin=4 -json=logs/central_charge_N64_T09.json || true
fi

PREFIX=RBMHB-L32U4V2

echo "#### [r3p-1] Hubbard L=32 trap re-measures (nwarm=5000) ####"
if time_left; then
  timeout 3000 python -m neural_network_quantum_state_tpu.drivers.measure \
    -what=energy -model=hubbard -U=4 -t=1 -trap=0.05 -ansatz=rbm -L=64 -nf=64 -mchunk=25 \
    -ns=4096 -prefix=runs/$PREFIX -npar=5,5 -niter=600 -nms=3 -nwarm=5000 -fused=1 -seed=3
fi
if time_left; then
  timeout 3000 python -m neural_network_quantum_state_tpu.drivers.measure \
    -what=density -ansatz=rbm -L=64 -nf=64 -mchunk=25 \
    -ns=4096 -prefix=runs/$PREFIX -npar=5,5 -niter=600 -nms=3 -nwarm=5000 -fused=1 -seed=4
fi
if time_left; then
  timeout 3000 python -m neural_network_quantum_state_tpu.drivers.measure \
    -what=opdm -ansatz=rbm -L=64 -nf=64 -mchunk=25 \
    -ns=4096 -prefix=runs/$PREFIX -npar=5,5 -site=16 -niter=600 -nms=3 -nwarm=5000 -fused=1 -seed=5
fi

echo "#### [r3p-2] fine-grid fidelity ladder across theta_c (N=64) ####"
# Overlap fidelity between neighboring trained states on the tightened
# 0.85..0.95 grid - the dip localizes the QPT independently of the
# Binder/corr-ratio crossings (RESULTS 3d used the coarse V9 grid).
latest() { # L THETA -> newest checkpoint prefix
  ls runs/RBMTrSymmLICH-L${1}NF4A2.5T${2}V* 2>/dev/null \
    | grep -Ev '\.(jsonl|npz|dat)$' | sort -t V -k 2 -n | tail -1
}
: > logs/fidelity_ladder_N64.log
for PAIR in "0.85 0.875" "0.875 0.9" "0.9 0.925" "0.925 0.95"; do
  time_left || { echo "r3p cutoff before fidelity $PAIR"; break; }
  set -- $PAIR
  A=$(latest 64 $1); B=$(latest 64 $2)
  [ -z "$A" ] || [ -z "$B" ] && { echo "skip fidelity $PAIR (missing ckpt)"; continue; }
  echo "=== F($1, $2): $A vs $B ===" >> logs/fidelity_ladder_N64.log
  timeout 900 python -m neural_network_quantum_state_tpu.drivers.measure \
    -what=fidelity -ansatz=rbmtrsymm -L=64 -nf=4 -ns=4096 \
    -prefix=$A -prefix2=$B -niter=300 -nms=3 -nwarm=500 -nbeta=8 -fused=1 \
    -seed=29 >> logs/fidelity_ladder_N64.log 2>&1
  tail -1 logs/fidelity_ladder_N64.log
done

echo "#### R3P QUEUE DONE ####"
