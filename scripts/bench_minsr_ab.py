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
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    sc = 1.0 / jnp.sqrt(jnp.float32(V))
    # lognormal per-parameter scales: isotropic random O gives a
    # near-identity S that CG solves in ~9 iterations - real SR systems
    # (measured: 50-500 iterations) have orders-of-magnitude diag(S) spread
    col = jnp.exp(2.0 * jax.random.normal(k5, (V,), jnp.float32))
    o = C(
        sc * col * jax.random.normal(k1, (K, V), jnp.float32),
        sc * col * jax.random.normal(k2, (K, V), jnp.float32),
    )
    h = C(
        jax.random.normal(k3, (K,), jnp.float32),
        0.1 * jax.random.normal(k4, (K,), jnp.float32),
    )
    return o, h


REPS = 10  # solves chained INSIDE one jit: short per-call timings through
# the remote tunnel are async-skewed (RESULTS.md measured the same for the
# sweep kernels), so each timed call runs REPS data-dependent solves.


@jax.jit
def solve_minsr(o, h):
    def body(i, acc):
        # data dependence: perturb htilda by the previous step's norm so
        # XLA cannot hoist/CSE the chain into one solve
        hh = C(h.re + 1e-6 * acc, h.im)
        dx, _ = sr_minsr_solve(o, hh, jnp.asarray(LAM, jnp.float32))
        return jnp.sqrt(jnp.sum(dx.re * dx.re))

    acc = jax.lax.fori_loop(0, REPS, body, jnp.float32(0))
    dx, _ = sr_minsr_solve(o, C(h.re + 1e-6 * acc, h.im), jnp.asarray(LAM, jnp.float32))
    return dx


@jax.jit
def solve_cg(o, h):
    def body(i, acc):
        hh = C(h.re + 1e-6 * acc, h.im)
        dx, _ = sr_cg_solve(o, hh, jnp.asarray(LAM, jnp.float32), max_iters=500)
        return jnp.sqrt(jnp.sum(dx.re * dx.re))

    acc = jax.lax.fori_loop(0, REPS, body, jnp.float32(0))
    dx, res = sr_cg_solve(o, C(h.re + 1e-6 * acc, h.im), jnp.asarray(LAM, jnp.float32), max_iters=500)
    return dx, res.iterations


def _readback(out):
    # forced host readback: through the remote-execution tunnel
    # block_until_ready returns at dispatch, so device->host copies are the
    # only reliable completion barrier (RESULTS.md sweep-kernel note)
    import numpy as np

    return jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[0], out)


def timeit(fn, *args):
    out = fn(*args)  # compile + warm
    _readback(out)
    t0 = time.perf_counter()
    out = fn(*args)
    _readback(out)
    return (time.perf_counter() - t0) / (REPS + 1), out


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
    print(f"solution difference ||dx_cg - dx_minsr||/||dx_minsr|| = {float(num / den):.3e}")
    print("# note: this is NOT an accuracy metric - the two solve differently")
    print("# regularized systems (CG: lam*diag(S) scaled ridge; minSR: isotropic")
    print("# lam*mean(diag S)*I), which diverge on this deliberately anisotropic")
    print("# synthetic O. minSR's exactness for its own ridge is proven against")
    print("# the dense V-space oracle in tests/test_minsr.py.")


if __name__ == "__main__":
    main()
