"""A/B: standard fused sweep kernel vs the recurrent-rotation variant.

Round-4 verdict item 2 (second half): one measured optimization attempt
against the VPU-transcendental roofline. The variant (pallas_sweep
recur_cos=True) tracks running cos/sin(2 y_im) in VMEM scratch and rotates
them by per-site cos/sin(4 w_im) constants - 4 FMAs replace the 12-op
fast_cos polynomial per (walker, hidden) candidate element, cutting the
analytic hot-body op count from ~41H to ~29H per proposal at the cost of
two extra (BK, H) scratch planes (the megakernel study showed larger VMEM
live sets can cost more than the op saving - hence a measurement, not an
assumption). Equivalence is pinned by
tests/test_pallas.py::test_recur_cos_variant_matches_standard_kernel.

Run on an UNCONTENDED chip:  python scripts/bench_sweep_recurcos_ab.py
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

from neural_network_quantum_state_tpu.hamiltonians import LITFIChain
from neural_network_quantum_state_tpu.models import RBMTrSymm
from neural_network_quantum_state_tpu.ops.pallas_sweep import pallas_sweeps
from neural_network_quantum_state_tpu.sampler import metropolis


def measure(n, alpha, k, n_sweeps_per_call=20, reps=5):
    machine = RBMTrSymm(n_inputs=n, alpha=alpha, dtype=jnp.float32)
    ham = LITFIChain(n_sites=n, h=-0.5, j=0.866, alpha=2.5, pbc=True)
    params = machine.init_params(jax.random.PRNGKey(0))
    work = machine.make_work(params)
    spins = ham.init_spins(jax.random.PRNGKey(1), k, jnp.float32)
    state = metropolis.init_state(work, spins, jax.random.PRNGKey(2))
    sched = jnp.asarray(ham.schedule())

    out = {}
    for label, recur in (("standard", False), ("recur_cos", True)):
        cache, lnpsi = state.cache, state.lnpsi
        c, l, _ = pallas_sweeps(work, cache, lnpsi, sched, jnp.int32(3), n_sweeps_per_call,
                                recur_cos=recur)
        float(l.re[0])  # force (remote-dispatch skew)
        t0 = time.perf_counter()
        for r in range(reps):
            c, l, _ = pallas_sweeps(work, c, l, sched, jnp.int32(4 + r), n_sweeps_per_call,
                                    recur_cos=recur)
        float(l.re[0])
        dt = time.perf_counter() - t0
        out[label] = k * n_sweeps_per_call * reps / dt
        print(f"  N={n} H={alpha*n} K={k} {label:9s}: "
              f"{out[label]/1e6:.3f} M walker-sweeps/s "
              f"({1e3*dt/reps:.2f} ms/call)")
    out["speedup"] = out["recur_cos"] / out["standard"]
    print(f"  -> recur_cos speedup: {out['speedup']:.3f}x")
    return out


if __name__ == "__main__":
    print(f"devices: {jax.devices()}")
    results = {}
    for n, alpha, k in ((64, 4, 8192), (128, 4, 8192)):
        results[f"N{n}"] = measure(n, alpha, k)
    with open(f"{REPO}/logs/bench_sweep_recurcos_ab.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({k: round(v["speedup"], 3) for k, v in results.items()}))
