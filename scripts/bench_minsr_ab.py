"""On-chip A/B: minSR (KxK kernel-trick solve) vs matrix-free CG at large V.

The regime minSR targets: plain RBM at N=128, alpha=4 -> V = 66,688
parameters with K = 4096 walkers. The dense VxV path is unbuildable
(V^2 = 4.4e9 entries) and f32 CG is both latency-bound (sequential
matvecs) and precision-limited there (RESULTS.md 5b); minSR does one
(K,V)x(V,K) GEMM pair + a 2Kx2K LU and is exact for its ridge.

Measures one jitted SR solve (steady state, forced readback) per solver
on synthetic O/htilda of the real shapes - the solve is the only phase
that differs between the two paths.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_minsr_ab.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from neural_network_quantum_state_tpu.ops.cplx import C
from neural_network_quantum_state_tpu.optim.sr import sr_cg_solve, sr_minsr_solve

K, V = 4096, 66_688
LAM = 0.01


def make_system(key):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    sc = 1.0 / jnp.sqrt(jnp.float32(V))
    o = C(
        sc * jax.random.normal(k1, (K, V), jnp.float32),
        sc * jax.random.normal(k2, (K, V), jnp.float32),
    )
    h = C(
        jax.random.normal(k3, (K,), jnp.float32),
        0.1 * jax.random.normal(k4, (K,), jnp.float32),
    )
    return o, h


@jax.jit
def solve_minsr(o, h):
    dx, _ = sr_minsr_solve(o, h, jnp.asarray(LAM, jnp.float32))
    return dx


@jax.jit
def solve_cg(o, h):
    dx, res = sr_cg_solve(o, h, jnp.asarray(LAM, jnp.float32), max_iters=500)
    return dx, res.iterations


def timeit(fn, *args, reps=5):
    out = fn(*args)  # compile + warm
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, out


def main():
    print(f"# device: {jax.devices()[0]}, K={K}, V={V}")
    o, h = make_system(jax.random.PRNGKey(0))
    t_minsr, dx_m = timeit(solve_minsr, o, h)
    t_cg, (dx_c, iters) = timeit(solve_cg, o, h)
    from neural_network_quantum_state_tpu.ops import cplx

    num = jnp.sqrt(cplx.norm2(dx_m - dx_c))
    den = jnp.sqrt(cplx.norm2(dx_m))
    print(f"minSR solve: {t_minsr * 1e3:.1f} ms")
    print(f"CG solve:    {t_cg * 1e3:.1f} ms ({int(iters)} iters)")
    print(f"relative solution difference ||dx_cg - dx_minsr||/||dx_minsr|| = {float(num / den):.3e}")
    print(f"# note: CG regularizes with lam*diag(S), minSR with lam*mean(diag S)*I,")
    print(f"# so a small systematic difference is expected on anisotropic systems.")


if __name__ == "__main__":
    main()
