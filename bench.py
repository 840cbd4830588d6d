"""Benchmark: Metropolis sweep throughput on the flagship N=64 RBM.

Headline metric (BASELINE.json): walker-sweeps/sec/chip at N=64 RBM -
one "sweep" = one full pass of single-spin-flip Metropolis proposals over
all 64 sites of one walker's chain. Baseline target: 20,000 sweeps/sec/chip
on TPU v5e. Prints ONE JSON line.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

from neural_network_quantum_state_tpu.hamiltonians import LITFIChain
from neural_network_quantum_state_tpu.models import RBMTrSymm
from neural_network_quantum_state_tpu.sampler import metropolis

BASELINE_SWEEPS_PER_SEC = 20_000.0


def main():
    n, alpha, k = 64, 4, 8192
    n_sweeps_per_call = 20

    machine = RBMTrSymm(n_inputs=n, alpha=alpha, dtype=jnp.float32)
    ham = LITFIChain(n_sites=n, h=-0.5, j=0.866, alpha=2.5, pbc=True)
    params = machine.init_params(jax.random.PRNGKey(0))
    work = machine.make_work(params)
    spins = ham.init_spins(jax.random.PRNGKey(1), k, jnp.float32)
    state = metropolis.init_state(work, spins, jax.random.PRNGKey(2))
    schedule = jnp.asarray(ham.schedule())

    # fused Pallas sweep (VMEM-resident y across the whole proposal loop);
    # compile + warm up (fetch a value: on remote-dispatch backends
    # block_until_ready can return before execution finishes)
    sweep = metropolis.sweeps_fused
    state = sweep(work, state, schedule, n_sweeps_per_call)
    float(state.lnpsi.re[0])

    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        state = sweep(work, state, schedule, n_sweeps_per_call)
    float(state.lnpsi.re[0])
    dt = time.perf_counter() - t0

    sweeps_per_sec = k * n_sweeps_per_call * reps / dt
    print(
        json.dumps(
            {
                "metric": "metropolis_walker_sweeps_per_sec_chip_N64_RBMTrSymm_a4",
                "value": round(sweeps_per_sec, 1),
                "unit": "sweeps/s",
                "vs_baseline": round(sweeps_per_sec / BASELINE_SWEEPS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
