"""A/B: sweep+energy megakernel vs the two-kernel pipeline (round-3 verdict
item 4). Flagship shape N=64 / H=256 / K=8192, RBM family, f32, one chip.

Arms, each timed over `reps` chained calls with a forced value fetch (the
remote-dispatch tunnel returns from block_until_ready at dispatch):

  two-kernel: metropolis.sweeps_fused (pallas sweep, incl. XLA lnpsi
              recompute) -> pallas_offdiag_sum on the new state
  megakernel: pallas_sweeps_offdiag - one pallas_call, y/spins/sa stay in
              VMEM across sampling AND the N-forward estimate

Both arms produce (state', offdiag); the off-diagonal sums are also
cross-checked (same seeds -> identical walker trajectories).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_megakernel_ab.py
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from neural_network_quantum_state_tpu.hamiltonians import LITFIChain
from neural_network_quantum_state_tpu.models import RBMTrSymm
from neural_network_quantum_state_tpu.ops.pallas_energy import pallas_offdiag_sum
from neural_network_quantum_state_tpu.ops.pallas_sweep_energy import pallas_sweeps_offdiag
from neural_network_quantum_state_tpu.sampler import metropolis

N, ALPHA, K = 64, 4, 8192
N_SWEEPS = 1  # per SR iteration (nms=1, the production default)
REPS = 50


def main():
    machine = RBMTrSymm(n_inputs=N, alpha=ALPHA, dtype=jnp.float32)
    ham = LITFIChain(n_sites=N, h=-0.5, j=0.866, alpha=2.5, pbc=True)
    params = machine.init_params(jax.random.PRNGKey(0))
    work = machine.make_work(params)
    spins = ham.init_spins(jax.random.PRNGKey(1), K, jnp.float32)
    state0 = metropolis.init_state(work, spins, jax.random.PRNGKey(2))
    schedule = jnp.asarray(ham.schedule())
    sites = np.arange(N, dtype=np.int32)

    # --- arm A: two kernels (the production pipeline)
    def two_kernel(state):
        state = metropolis.sweeps_fused(work, state, schedule, N_SWEEPS)
        off = pallas_offdiag_sum(work, state.cache, state.lnpsi, sites)
        return state, off

    # --- arm B: megakernel. metropolis.sweeps_fused folds a fresh
    # per-call seed from state.key; replicate that contract so both arms
    # see identical PRNG streams (same per-block threefry seeds).
    def mega(state):
        key, sub = jax.random.split(state.key)
        seed = jax.random.randint(sub, (), 0, 2**31 - 1, jnp.int32)
        cache, lnpsi, _acc, off = pallas_sweeps_offdiag(
            work, state.cache, state.lnpsi, schedule, seed, N_SWEEPS
        )
        return state._replace(cache=cache, lnpsi=lnpsi, key=key), off

    # block_k=1024 variant: the auto-sizer halves the megakernel's walker
    # block (energy-phase temporaries); if the full sweep-kernel block fits
    # after all, measure it too
    def mega_bk1024(state):
        key, sub = jax.random.split(state.key)
        seed = jax.random.randint(sub, (), 0, 2**31 - 1, jnp.int32)
        cache, lnpsi, _acc, off = pallas_sweeps_offdiag(
            work, state.cache, state.lnpsi, schedule, seed, N_SWEEPS, block_k=1024
        )
        return state._replace(cache=cache, lnpsi=lnpsi, key=key), off

    arms = [("two_kernel", two_kernel), ("megakernel", mega)]
    try:
        s, off = mega_bk1024(state0)
        float(off.re[0])
        arms.append(("megakernel_bk1024", mega_bk1024))
    except Exception as e:  # VMEM OOM expected at H=256
        print(f"megakernel_bk1024 skipped: {type(e).__name__}")

    out = {}
    for name, fn in arms:
        state, off = fn(state0)  # compile + warm
        float(off.re[0])
        t0 = time.perf_counter()
        state = state0
        for _ in range(REPS):
            state, off = fn(state)
        float(off.re[0])
        dt = time.perf_counter() - t0
        out[name] = 1e3 * dt / REPS
        print(f"{name}: {out[name]:.3f} ms per (sweep + offdiag) at "
              f"N={N} H={ALPHA * N} K={K}")

    best = min(v for k, v in out.items() if k != "two_kernel")
    print(json.dumps({**{k + "_ms": round(v, 3) for k, v in out.items()},
                      "speedup_best": round(out["two_kernel"] / best, 4)}))


if __name__ == "__main__":
    main()
