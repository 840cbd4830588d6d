"""A/B: compensated-f32 local energy vs plain f32 vs full f64 on the chip.

Round-4 verdict item 6 (docs/BACKLOG.md "compensated-f32 (two-float)"
sketch): the f64 anchor-mode energy pays ~70x f32 because TPU f64
transcendentals are emulated. energy_dtype='compensated' evaluates the
O(N K H) flip tensor's transcendentals in f32 while keeping every
O(|lnpsi|)-sized piece in exact f64 linear algebra
(engine.all_flip_delta_log_psi: difference-first per-hidden accumulation,
angle folding, widened-forward cache). Accuracy on the trained N=64
deep-ordered state: comp ~7e-13 vs plain-f32 ~2e-7 absolute on E_local
(tests/test_mixed_precision.py::test_compensated_local_energy_matches_f64).

This script measures the COST side on real hardware at the flagship shape:
    python scripts/bench_compensated_ab.py   (TPU; ~2 min)
prints ms/call for (a) plain f32 XLA offdiag, (b) compensated, (c) full
f64, plus max |dE| of (a) and (b) vs (c). Target: comp <= 3x f32.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from neural_network_quantum_state_tpu.hamiltonians import LITFIChain  # noqa: E402
from neural_network_quantum_state_tpu.models import RBMTrSymm  # noqa: E402
from neural_network_quantum_state_tpu.ops import engine  # noqa: E402
from neural_network_quantum_state_tpu.sampler import metropolis  # noqa: E402
from neural_network_quantum_state_tpu.utils.checkpoint import load_reference_text  # noqa: E402


def main() -> None:
    n, k = 64, 8192
    th = 1.57
    machine = RBMTrSymm(n_inputs=n, alpha=4, dtype=jnp.float32)
    prefix = os.path.join(REPO, "runs", "RBMTrSymmLICH-L64NF4A2.5T1.57V9")
    params = load_reference_text(machine, prefix)
    ham = LITFIChain(n_sites=n, h=-math.cos(th), j=math.sin(th), alpha=2.5, pbc=True)
    work32 = machine.make_work(params)
    spins = ham.init_spins(jax.random.PRNGKey(1), k, jnp.float32)
    state = metropolis.init_state(work32, spins, jax.random.PRNGKey(2))
    state = metropolis.sweeps_fused(work32, state, jnp.asarray(ham.schedule()), 50)
    cache32, ln32 = state.cache, state.lnpsi

    params64 = jax.tree_util.tree_map(lambda x: x.astype(jnp.float64), params)

    @jax.jit
    def f32_energy(params, cache, lnpsi):
        work = machine.make_work(params)
        return ham.local_energy(work, cache, lnpsi, fused=False)  # XLA path

    @jax.jit
    def comp_energy(params, cache):
        # as vmc wires it: widened forward + compensated offdiag
        p64 = jax.tree_util.tree_map(lambda x: x.astype(jnp.float64), params)
        work = machine.make_work(p64)
        c64, l64 = engine.full_forward(work, cache.spins.astype(jnp.float64))
        return ham.local_energy(work, c64, l64, compensated=True)

    @jax.jit
    def f64_energy(params64, cache):
        work = machine.make_work(params64)
        c64, l64 = engine.full_forward(work, cache.spins.astype(jnp.float64))
        return ham.local_energy(work, c64, l64)

    def timeit(fn, *args, reps=10):
        out = fn(*args)
        float(out.re[0])  # force through the remote-dispatch tunnel
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        float(out.re[0])
        return (time.perf_counter() - t0) / reps * 1e3, out

    ms32, e32 = timeit(f32_energy, params, cache32, ln32)
    msc, ec = timeit(comp_energy, params, cache32)
    ms64, e64 = timeit(f64_energy, params64, cache32, reps=2)

    d32 = float(np.max(np.abs(np.asarray(e32.re, np.float64) - np.asarray(e64.re))))
    dc = float(np.max(np.abs(np.asarray(ec.re) - np.asarray(e64.re))))
    print(json.dumps({
        "shape": f"N={n} H=256 K={k} (trained T1.57 V9 state)",
        "f32_ms": round(ms32, 3),
        "compensated_ms": round(msc, 3),
        "f64_ms": round(ms64, 3),
        "comp_over_f32": round(msc / ms32, 2),
        "f64_over_f32": round(ms64 / ms32, 2),
        "max_abs_err_f32_vs_f64": d32,
        "max_abs_err_comp_vs_f64": dc,
    }))


if __name__ == "__main__":
    main()
