#!/bin/bash
# r3n chip queue (chains after r3m): bias-free Renyi-2 re-measurement of
# the trained N=64 states with the increment-trick estimator
# (measurements/renyi_increment.py; RESULTS 6b/6c/6d established that the
# direct swap estimator is biased LOW by O(0.1) at l=32), plus extra
# from-above evidence for the stuck N=64 theta=0.9 tighten point.
# Gated on /tmp/r3n_cutoff (epoch seconds, live-updatable).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

echo "#### r3n waiting for r3m ####"
while ! grep -q "R3M QUEUE DONE" logs/r3m_queue.log 2>/dev/null; do sleep 60; done

cutoff_epoch() {
  if [ -r /tmp/r3n_cutoff ]; then cat /tmp/r3n_cutoff; else
    date -u -d '2026-08-19 06:30' +%s
  fi
}
time_left() { [ "$(date -u +%s)" -lt "$(cutoff_epoch)" ]; }

renyi_inc() { # THETA L0 NBETA INIT SEED
  timeout 3000 python -m neural_network_quantum_state_tpu.drivers.measure \
    -what=renyi_inc -ansatz=rbmtrsymm -L=64 -nf=4 -ns=512 \
    -prefix=runs/RBMTrSymmLICH-L64NF4A2.5T${1}V9 -l=32 -l0=$2 \
    -nbeta=$3 -init=$4 -niter=800 -nms=2 -nwarm=600 -seed=$5 -mchunk=50
}

echo "#### [r3n-1] increment-trick Renyi l=32 on N=64 V9 states ####"
# deep-ordered/cat-like: hybrid l0=1 base via PT swap + Neel-init glue;
# disordered/critical: pure increment chain from the empty region
for SPEC in "1.57 1 4 neel 21" "1.3 1 4 neel 21" "1.2 1 4 neel 21" \
            "1.1 1 4 neel 21" "0.9 1 4 neel 21" "0.4 0 1 random 21" \
            "1.57 1 4 neel 22" "1.3 1 4 neel 22"; do
  time_left || { echo "r3n cutoff before renyi_inc $SPEC"; break; }
  set -- $SPEC
  echo "######## renyi_inc N=64 theta=$1 l=32 (l0=$2 nbeta=$3 init=$4 seed=$5) ########"
  renyi_inc $1 $2 $3 $4 $5
done

echo "#### [r3n-1b] central-charge profile: near-critical S2(l) curves ####"
# one renyi_inc run gives the whole S2(l') profile; fit
# S2(l) = (c/4) ln[(N/pi) sin(pi l/N)] + const in increment space
# (scripts/central_charge_fit.py). theta=0.9 ~ theta_c; heavier sampling
# than the 6b-redo passes since increments enter a 27-point fit.
if time_left; then
  timeout 4500 python -m neural_network_quantum_state_tpu.drivers.measure \
    -what=renyi_inc -ansatz=rbmtrsymm -L=64 -nf=4 -ns=1024 \
    -prefix=runs/RBMTrSymmLICH-L64NF4A2.5T0.9V9 -l=32 -l0=1 \
    -nbeta=4 -init=neel -niter=1600 -nms=2 -nwarm=800 -seed=33 -mchunk=50 \
    > logs/renyi_profile_N64_T09.log 2>&1
  python scripts/central_charge_fit.py logs/renyi_profile_N64_T09.log -N=64 \
    -lmin=4 -json=logs/central_charge_N64_T09.json || true
fi

echo "#### [r3n-2] N=64 theta=0.9 from-above extension (V11, 4 more) ####"
# the from-below V16 arm is still climbing (+0.0065/ext after r3m);
# tighten the bracket from the other side with the same methodology
if time_left; then
  bash scripts/binder_converge_bm.sh 64 0.9 11 4 0.005
  bash scripts/binder_final_measure.sh 64 "0.9" logs/measure_stag_N64_T09_V11_r3n.log
fi

echo "#### R3N QUEUE DONE ####"
