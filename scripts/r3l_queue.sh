#!/bin/bash
# r3l chip queue: runs after the heavy Renyi pass drains the chip.
#
#  [r3l-1] Hubbard L=32 trap deliverable, third attempt. The two earlier
#          attempts died deterministically at step 50 = the third 25-step
#          host chunk: per-device-call time grows with the CG iteration
#          count (27 s -> ~40 s -> ~55 s), tripping the remote-tunnel
#          worker watchdog ("TPU worker crashed", logs/hubbard_l32_trap.log)
#          on both the fused and XLA sampler paths. Fix: -solver=minsr
#          (constant ~O(K^2) solve time per step, no CG growth),
#          -mloop=5 (short device calls), -nrec=250 + resume-chaining so
#          any further crash resumes instead of restarting.
#  [r3l-2] N=96 crossing-region tightening: the two-sided table at
#          theta=0.9/0.925 carries +/-0.10-0.19 halfspreads (the (64,96)
#          Binder crossing inherits +/-0.087). Extend both lineages with
#          the block-move converge protocol, and grow a from-below V1
#          point at theta=0.95 (currently above-only).
#  [r3l-3] N=64 theta=1.1 outlier: extend V10 with the checkpoint's own
#          walker count (8192; the r3k-4 attempt died on -ns=4096) and
#          re-measure.
# All stages are gated on /tmp/r3l_cutoff (epoch seconds, live-updatable).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

cutoff_epoch() {
  if [ -r /tmp/r3l_cutoff ]; then cat /tmp/r3l_cutoff; else
    date -u -d '2026-08-19 00:30' +%s
  fi
}
time_left() { [ "$(date -u +%s)" -lt "$(cutoff_epoch)" ]; }

echo "#### [r3l-1] Hubbard L=32 trap (minsr + short chunks + resume chain) ####"
mkdir -p /tmp/hbdisc
echo "## discriminator: cg solver, mloop=5, 80 iters (watchdog-vs-data test)"
timeout 900 python -m neural_network_quantum_state_tpu.drivers.train \
  -model=hubbard -ansatz=rbm -L=32 -nf=64 -U=4 -t=1 -npar=5,5 -trap=0.05 \
  -ns=4096 -niter=80 -nwarm=500 -lr=1e-2 -fused=1 -mloop=5 \
  -path=/tmp/hbdisc -nrec=10000 -seed=11 | tail -2 \
  && echo "## discriminator PASSED step 50 with mloop=5 (watchdog-duration confirmed)" \
  || echo "## discriminator still crashed (data-dependent fault in the cg path)"

PREFIX=RBMHB-L32U4V2  # checkpoint_prefix(model=hubbard, ver=2)
TARGET=4000
train_chain() { # resume-chaining to TARGET total steps
  local args_common="-model=hubbard -ansatz=rbm -L=32 -nf=64 -U=4 -t=1 -npar=5,5 -trap=0.05 \
    -ns=4096 -lr=1e-2 -fused=1 -mloop=5 -solver=minsr -ver=2 \
    -path=runs -nrec=250"
  local step=0
  for attempt in $(seq 1 24); do
    time_left || { echo "r3l cutoff during hubbard train at step $step"; return 1; }
    if [ "$attempt" = 1 ] && [ ! -f runs/$PREFIX.state.npz ]; then
      timeout 3600 python -m neural_network_quantum_state_tpu.drivers.train \
        $args_common -niter=$TARGET -nwarm=500 -seed=11 | tail -2 && return 0
    else
      step=$(python -c "
import numpy as np
print(int(np.load('runs/$PREFIX.state.npz')['__step__']))" 2>/dev/null || echo 0)
      [ "$step" -ge "$TARGET" ] && return 0
      echo "## resume chain attempt $attempt from step $step"
      timeout 3600 python -m neural_network_quantum_state_tpu.drivers.train \
        $args_common -niter=$((TARGET - step)) -nwarm=0 -seed=$((11 + attempt)) \
        -resume=$PREFIX | tail -2 && return 0
    fi
    echo "## attempt $attempt crashed; sleeping 90s" >&2
    sleep 90
  done
  return 1
}
if train_chain; then
  echo "## trained runs/$PREFIX"
  echo "#### [r3l-1b] Hubbard trap measures: energy / density / opdm ####"
  timeout 1800 python -m neural_network_quantum_state_tpu.drivers.measure \
    -what=energy -model=hubbard -U=4 -t=1 -trap=0.05 -ansatz=rbm -L=64 -nf=64 -mchunk=25 \
    -ns=4096 -prefix=runs/$PREFIX -npar=5,5 -niter=300 -nms=3 -nwarm=500 -fused=1 -seed=3
  timeout 1800 python -m neural_network_quantum_state_tpu.drivers.measure \
    -what=density -ansatz=rbm -L=64 -nf=64 -mchunk=25 \
    -ns=4096 -prefix=runs/$PREFIX -npar=5,5 -niter=300 -nms=3 -nwarm=500 -fused=1 -seed=4
  timeout 1800 python -m neural_network_quantum_state_tpu.drivers.measure \
    -what=opdm -ansatz=rbm -L=64 -nf=64 -mchunk=25 \
    -ns=4096 -prefix=runs/$PREFIX -npar=5,5 -site=16 -niter=300 -nms=3 -nwarm=500 -fused=1 -seed=5
else
  echo "hubbard L32 trap FAILED again (see above)"
fi

echo "#### [r3l-2] N=96 + N=64 crossing-region tightening ####"
# The N=64 theta=0.9 point is the weakest link in BOTH dimensionless
# observables: Binder two-sided halfspread +/-0.107, and the corr-ratio
# N=64 curve is non-monotonic there (R=0.438 at 0.9 vs 0.372 at 0.875,
# logs/corrratio_N64.log) - an under-ordered latest-version state. Extend
# both lineages (V16 from-below block-move redo, V11 from-above).
CONVBM=scripts/binder_converge_bm.sh
for SPEC in "64 0.9 16" "64 0.9 11" "96 0.925 1" "96 0.925 2" "96 0.9 1" "96 0.9 2" "96 0.95 2" "96 1.2 2" \
            "96 0.875 1" "96 0.875 2" "96 0.85 2"; do
  time_left || { echo "r3l cutoff before point $SPEC"; break; }
  set -- $SPEC
  echo "######## N=$1 theta=$2 V$3 tighten ########"
  bash $CONVBM $1 $2 $3 3 0.005
done
if time_left && [ ! -f runs/RBMTrSymmLICH-L96NF4A2.5T0.95V1.state.npz ]; then
  echo "######## N=96 theta=0.95 V1 from-below (anneal from T0.925V1) ########"
  timeout 3600 python -m neural_network_quantum_state_tpu.drivers.train \
    -model=LICH -ansatz=rbmtrsymm -L=96 -nf=4 -theta=0.95 -alpha=2.5 -ver=1 \
    -ns=8192 -niter=8000 -nwarm=500 -lr=1e-2 -nbeta=4 -fused=1 -blockmoves=1 \
    -ifprefix=RBMTrSymmLICH-L96NF4A2.5T0.925V1 -path=runs -nrec=2000 -seed=91 | tail -1
  bash $CONVBM 96 0.95 1 3 0.005
fi

echo "#### [r3l-3] N=64 theta=1.1 V10 extension (8192 walkers) + re-measure ####"
if time_left; then
  timeout 3600 python -m neural_network_quantum_state_tpu.drivers.train \
    -model=LICH -ansatz=rbmtrsymm -L=64 -nf=4 -theta=1.1 -alpha=2.5 \
    -ns=8192 -niter=8000 -nwarm=0 -lr=1e-2 -fused=1 -nbeta=4 -blockmoves=1 \
    -resume=RBMTrSymmLICH-L64NF4A2.5T1.1V10 -path=runs -nrec=1000 -seed=31 | tail -2
  bash scripts/binder_final_measure.sh 64 "1.1" logs/measure_stag_N64_T11_redo2.log
fi

echo "#### [r3l-4] final measurement passes over tightened points ####"
if time_left; then
  bash scripts/binder_final_measure.sh 96 "0.7 0.85 0.875 0.9 0.925 0.95 1.2" logs/measure_stag_N96_final2.log
  bash scripts/binder_final_measure.sh 64 "0.9" logs/measure_stag_N64_T09_redo.log
  # corr-ratio re-passes on the tightened states (overwrite the old logs:
  # binder_fss_final.vmc_corrratio_points reads the whole file)
  bash scripts/corrratio_measure.sh 64 "0.85 0.875 0.9 0.925 0.95 1" logs/corrratio_N64.log
  bash scripts/corrratio_measure.sh 96 "0.85 0.875 0.9 0.925 0.95" logs/corrratio_N96.log
fi

echo "#### R3L QUEUE DONE ####"
