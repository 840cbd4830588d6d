"""On-chip A/B: SR solver choice at the N=64 flagship shape.

The bench metric-2 configuration (RBMTrSymm N=64 alpha=4, V=261 params,
K=8192 walkers) uses matrix-free CG - ~52 sequential matvec iterations
per solve, each a latency-bound (K,V) GEMM pair. At V=261 the DENSE path
is one (V,K)x(K,V) herk (3 real MXU GEMMs, 8192*261^2 MACs) + a trivial
VxV factorization, so it may beat the CG chain outright on TPU.

Times the FULL SR iteration (sweep + local energy + O_k + solve + update)
through vmc.run for each solver from identically warmed state, plus final
energies as a quality check - dense f32 breakdown is a V~2000+ phenomenon
(RESULTS.md config 2); V=261 should be clean.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_sr_solver_ab.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

import neural_network_quantum_state_tpu as nqs
from neural_network_quantum_state_tpu.hamiltonians import LITFIChain
from neural_network_quantum_state_tpu.models import RBMTrSymm

N, ALPHA, K = 64, 4, 8192
M = 50  # steps per host loop (bench metric-2 contract)


def run_one(solver: str) -> None:
    machine = RBMTrSymm(n_inputs=N, alpha=ALPHA, dtype=jnp.float32)
    ham = LITFIChain(n_sites=N, h=-0.5, j=0.866, alpha=2.5, pbc=True)
    cfg = nqs.VMCConfig(
        n_walkers=K,
        learning_rate=1e-2,
        solver=solver,
        steps_per_host_loop=M,
        use_fused_sweeps=jax.devices()[0].platform != "cpu",
        seed=3,
    )
    vmc = nqs.VMC(machine, ham, cfg)
    params, state = vmc.init()
    state = vmc.warm_up(params, state, 100)
    params, state, _, _ = vmc.run(params, state, 2 * M)  # compile + settle
    n_iter = 4 * M
    t0 = time.perf_counter()
    params, state, history, _ = vmc.run(params, state, n_iter)
    dt = time.perf_counter() - t0
    e = sum(h["energy"] for h in history[-20:]) / 20
    print(
        f"solver={solver:10s}  {1e3 * dt / n_iter:7.2f} ms/iter  "
        f"{n_iter / dt:7.1f} iters/s   E/site(tail)={e:+.6f}",
        flush=True,
    )


def main() -> None:
    print(f"# SR solver A/B at N={N} alpha={ALPHA} K={K} "
          f"({jax.devices()[0].platform})", flush=True)
    for solver in ("cg", "lu", "cholesky"):
        run_one(solver)


if __name__ == "__main__":
    main()
