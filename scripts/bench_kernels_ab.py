"""On-chip A/B of the round-3 fused kernels (long-call pattern, memory:
tpu-tunnel-benchmarking - one big jitted call, forced scalar readback).

1. Kawasaki pair-exchange sweeps: fused Pallas kernel vs XLA scan
   (L=8 Hubbard flagship shape: 16 JW spins, RBM nf=32, 4096 walkers).
2. FFNN-family fused local energy vs XLA chunked path
   (N=64, M=256 hidden, 8192 walkers - VERDICT r2 item 5 shape).

Usage: python scripts/bench_kernels_ab.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from neural_network_quantum_state_tpu.hamiltonians import HubbardChain, LITFIChain
from neural_network_quantum_state_tpu.models import FFNN, RBM
from neural_network_quantum_state_tpu.ops import engine
from neural_network_quantum_state_tpu.sampler import kawasaki
from neural_network_quantum_state_tpu.sampler.metropolis import MCState


def _timed(fn, *args, reps=3, **kw):
    out = fn(*args, **kw)  # compile
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def bench_exchange(l=8, k=4096, nf=32, n_sweeps=100):
    n = 2 * l
    machine = RBM(n_inputs=n, n_hiddens=nf, dtype=jnp.float32)
    params = machine.init_params(jax.random.PRNGKey(1))
    work = machine.make_work(params)
    ham = HubbardChain(n_sites=n, u=4.0, t=1.0, n_up=3, n_down=3, pbc=True)
    spins = ham.init_spins(jax.random.PRNGKey(2), k, jnp.float32)
    cache, lnpsi = engine.full_forward(work, spins)
    state = MCState(cache=cache, lnpsi=lnpsi, key=jax.random.PRNGKey(3),
                    n_accepted=jnp.float32(0), n_proposed=jnp.float32(0))
    bonds = jnp.asarray(ham.bonds)
    bonds_tuple = tuple(map(tuple, np.asarray(ham.bonds).tolist()))

    def run_xla(st):
        return kawasaki.exchange_sweeps(work, st, bonds, n_sweeps, ham.n_unit_steps)

    def run_fused(st):
        return kawasaki.exchange_sweeps_fused(
            work, st, bonds_tuple, n_sweeps, ham.n_unit_steps)

    t_xla, s_xla = _timed(run_xla, state)
    t_fused, s_fused = _timed(run_fused, state)
    tot = n_sweeps * ham.n_unit_steps * k
    print(f"[exchange L={l} K={k} nf={nf} {n_sweeps} sweeps x {ham.n_unit_steps} steps]")
    print(f"  XLA scan : {t_xla*1e3:9.1f} ms  ({tot/t_xla/1e6:.2f}M props/s)  acc={float(s_xla.n_accepted)/tot:.3f}")
    print(f"  fused    : {t_fused*1e3:9.1f} ms  ({tot/t_fused/1e6:.2f}M props/s)  acc={float(s_fused.n_accepted)/tot:.3f}")
    print(f"  speedup  : {t_xla/t_fused:.2f}x")


def bench_ffnn_energy(n=64, m=256, k=8192):
    machine = FFNN(n_inputs=n, n_hiddens=m, dtype=jnp.float32)
    params = machine.init_params(jax.random.PRNGKey(5))
    work = machine.make_work(params)
    import math
    theta = 1.0
    ham = LITFIChain(n_sites=n, j=math.sin(theta), h=-math.cos(theta), alpha=2.5, pbc=True)
    spins = jnp.where(jax.random.uniform(jax.random.PRNGKey(6), (k, n)) < 0.5, 1.0, -1.0).astype(jnp.float32)
    cache, lnpsi = engine.full_forward(work, spins)

    @jax.jit
    def e_fused(cache, lnpsi):
        return ham.local_energy(work, cache, lnpsi, fused=True)

    @jax.jit
    def e_xla(cache, lnpsi):
        return ham.local_energy(work, cache, lnpsi, fused=False)

    t_x, ex = _timed(e_xla, cache, lnpsi)
    t_f, ef = _timed(e_fused, cache, lnpsi)
    dre = float(jnp.max(jnp.abs(ex.re - ef.re)))
    print(f"[FFNN local energy N={n} M={m} K={k}]")
    print(f"  XLA chunked : {t_x*1e3:7.2f} ms")
    print(f"  fused       : {t_f*1e3:7.2f} ms   max|dE.re|={dre:.2e}")
    print(f"  speedup     : {t_x/t_f:.2f}x")


def bench_energy_unroll(n=64, m=256, k=8192):
    """Multi-site unroll A/B on the fused energy kernel (independent flips
    per loop iteration -> ILP; ops/pallas_energy.py `unroll`)."""
    from neural_network_quantum_state_tpu.models import RBMTrSymm
    from neural_network_quantum_state_tpu.ops.pallas_energy import pallas_offdiag_sum

    machine = RBMTrSymm(n_inputs=n, alpha=m // n, dtype=jnp.float32)
    params = machine.init_params(jax.random.PRNGKey(7))
    work = machine.make_work(params)
    spins = jnp.where(
        jax.random.uniform(jax.random.PRNGKey(8), (k, n)) < 0.5, 1.0, -1.0
    ).astype(jnp.float32)
    cache, lnpsi = engine.full_forward(work, spins)
    sites = jnp.arange(n, dtype=jnp.int32)

    print(f"[energy-kernel unroll/phase A/B N={n} H={m} K={k}]")
    base = None
    for u in (1, 2, 4, 8):
        for pp in (False, True):
            t, out = _timed(
                pallas_offdiag_sum, work, cache, lnpsi, sites, unroll=u,
                phase_product=pp,
            )
            d = 0.0 if base is None else float(jnp.max(jnp.abs(out.re - base.re)))
            base = base or out
            tag = "product" if pp else "atan2  "
            print(f"  unroll={u} phase={tag}: {t*1e3:7.2f} ms   max|d.re|={d:.2e}")


if __name__ == "__main__":
    print(f"devices: {jax.devices()}")
    bench_exchange()
    bench_ffnn_energy()
    bench_energy_unroll()
