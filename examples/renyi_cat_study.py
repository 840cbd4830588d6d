"""Renyi-2 cat-state study: why trained deep-ordered states show S2 < ln 2.

Round-2/3 measurements (RESULTS.md 6b) found the half-chain Renyi-2 entropy
of trained N=64 states at theta=1.57 to be ~0.59 < ln 2 = 0.693 - below the
floor set by the symmetric two-Neel cat state. The backlog hypothesis: the
trained RBMTrSymm carries UNEQUAL weight on the two Neel sectors (nothing
in the energy distinguishes them at h ~ 0, so training freezes whatever
asymmetry the init/sampling noise produced), while a spin-flip-symmetric
ansatz restores psi(s) = psi(-s) - and hence the full ln 2 - by
construction (RBMSfSymm has no biases, impl_neural_quantum_state.hpp:565).

This study settles it at an ED-checkable size (default N=12, l=6, CPU
f64, exact enumeration of the ansatz wavefunction - no estimator noise):

  1. ED ground state of LITFIChain(theta, alpha_J)  ->  exact S2, exact
     Neel-sector weights (w+ = P(m_s > 0) etc.).
  2. Train RBMTrSymm (the flagship campaign ansatz, PT + block moves,
     matching the chip methodology)  ->  exact-enum S2, sector weights,
     energy rel err.
  3. Train RBMSfSymm (Z2-symmetric)  ->  same.
  4. Cross-check the two-replica swap estimator against the exact-enum S2
     on the trained TrSymm state.

Reference spec: python/meas_renyi.py (swap estimator driver) and the
S2 >= ln 2 cat-state floor argument; see RESULTS.md 6/6b.

Usage (CPU, ~5-10 min):
    JAX_PLATFORMS=cpu python examples/renyi_cat_study.py [-L=12] [-theta=1.57]
"""

from __future__ import annotations

import math
import os
import sys

# CPU-pinned: an f64 ED-oracle study (TPU has no C128; and the chip is
# usually busy with the training campaign). The env var alone is NOT
# enough: the axon sitecustomize latches JAX_PLATFORMS into jax.config at
# interpreter start, so the platform must be re-pinned in-process.
os.environ["JAX_PLATFORMS"] = "cpu"

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import neural_network_quantum_state_tpu as nqs  # noqa: E402
from neural_network_quantum_state_tpu.hamiltonians import LITFIChain  # noqa: E402
from neural_network_quantum_state_tpu.measurements import (  # noqa: E402
    AmplitudeSampler,
    renyi2_entropy,
)
from neural_network_quantum_state_tpu.models import RBMSfSymm, RBMTrSymm  # noqa: E402
from neural_network_quantum_state_tpu.ops import cplx, engine  # noqa: E402
from neural_network_quantum_state_tpu.utils.cli import DriverArgs  # noqa: E402
from neural_network_quantum_state_tpu.utils.exact import (  # noqa: E402
    ground_state,
    litfi_chain_dense,
)


def all_spins(n: int) -> np.ndarray:
    idx = np.arange(2**n)
    bits = (idx[:, None] >> np.arange(n)[None, :]) & 1
    return 1.0 - 2.0 * bits  # basis-index bit i = site i, +1 for bit 0


def psi_of(machine, params) -> np.ndarray:
    """Normalized wavefunction over the full 2^N basis (exact enumeration)."""
    s = jnp.asarray(all_spins(machine.n_inputs), jnp.float64)
    ln = engine.log_psi(machine.make_work(params), s)
    ln = np.asarray(cplx.to_complex(ln))
    psi = np.exp(ln - ln.real.max())  # stabilize before normalizing
    return psi / np.linalg.norm(psi)


def s2_exact(psi: np.ndarray, n: int, l: int) -> float:
    """Exact half-block Renyi-2: A = sites [0, l) = low l index bits."""
    m = psi.reshape(2 ** (n - l), 2**l)  # [b, a], B-major
    rho_a = m.T @ m.conj()
    return float(-np.log(np.real(np.trace(rho_a @ rho_a))))


def sector_weights(psi: np.ndarray, n: int) -> tuple[float, float, float]:
    """Probability weight on m_s > 0 / < 0 / = 0 (staggered sectors)."""
    s = all_spins(n)
    stag = (s * np.where(np.arange(n) % 2 == 0, 1.0, -1.0)).sum(axis=1)
    p = np.abs(psi) ** 2
    return float(p[stag > 0].sum()), float(p[stag < 0].sum()), float(p[stag == 0].sum())


def train(machine, ham, seed: int, n_iter: int, n_walkers: int,
          tempered: bool = True):
    cfg = nqs.VMCConfig(
        n_walkers=n_walkers,
        learning_rate=1e-2,
        solver="cg",
        seed=seed,
        # campaign methodology: tempered sampling + block flips
        # (theta=1.57 single flips freeze); tempered=False reproduces the
        # round-2 protocol under which the N=64 S2 < ln 2 was measured
        n_beta=4 if tempered else 1,
        block_moves_per_sweep=1 if tempered else 0,
        steps_per_host_loop=25,
    )
    vmc = nqs.VMC(machine, ham, cfg)
    params, state = vmc.init()
    state = vmc.warm_up(params, state, 300)
    params, state, history, _ = vmc.run(params, state, n_iter)
    e = float(np.mean([h["energy"] for h in history[-25:]]))
    return params, e


def main() -> None:
    args = DriverArgs(
        sys.argv[1:],
        options=[
            ("L", "chain length (ED-reachable; default 12)"),
            ("theta", "J = sin(theta), h = -cos(theta)"),
            ("alpha", "long-range decay exponent alpha_J"),
            ("nf", "RBM filters (alpha) per ansatz"),
            ("niter", "SR iterations per arm"),
            ("ns", "walkers"),
            ("seed", "RNG seed"),
        ],
        defaults={
            "L": "12", "theta": "1.57", "alpha": "2.5", "nf": "4",
            "niter": "1500", "ns": "1024", "seed": "1",
        },
        prog="renyi_cat_study",
    )
    n = args.find("L", int)
    l = n // 2
    theta, alpha_j, nf = args.find("theta", float), args.find("alpha", float), args.find("nf", int)
    n_iter, n_walkers, seed = args.find("niter", int), args.find("ns", int), args.find("seed", int)
    j, h = math.sin(theta), -math.cos(theta)

    # 1. ED oracle
    e0, psi0 = ground_state(litfi_chain_dense(n, h=h, j=j, alpha=alpha_j, pbc=True))
    psi0 = psi0 / np.linalg.norm(psi0)
    rows = [("exact (ED)", s2_exact(psi0, n, l), sector_weights(psi0, n), 0.0)]
    print(f"# LITFI N={n} theta={theta} alpha_J={alpha_j}: E0/site = {e0:.6f}, "
          f"exact S2(l={l}) = {rows[0][1]:.4f}  (ln 2 = {math.log(2):.4f})")

    ham = LITFIChain(n_sites=n, h=h, j=j, alpha=alpha_j, pbc=True)
    arms = [
        ("RBMTrSymm", RBMTrSymm(n_inputs=n, alpha=nf, dtype=jnp.float64), True),
        # round-2 protocol (single-flip, untempered): the arm that should
        # reproduce the sector-weight asymmetry behind S2 < ln 2 at N=64
        ("TrSymm-noPT", RBMTrSymm(n_inputs=n, alpha=nf, dtype=jnp.float64), False),
        ("RBMSfSymm", RBMSfSymm(n_inputs=n, alpha=nf, dtype=jnp.float64), True),
    ]
    trained = {}
    for name, machine, tempered in arms:
        params, e = train(machine, ham, seed, n_iter, n_walkers, tempered)
        psi = psi_of(machine, params)
        rel = abs(e - e0) / abs(e0)
        rows.append((name, s2_exact(psi, n, l), sector_weights(psi, n), rel))
        trained[name] = (machine, params)
        print(f"# trained {name}: E/site = {e:.6f} (rel err {rel:.1e})")

    print(f"\n{'state':<14} {'S2':>8} {'w(+)':>8} {'w(-)':>8} {'w(0)':>8} "
          f"{'asym':>8} {'E relerr':>9}")
    for name, s2, (wp, wm, w0), rel in rows:
        asym = abs(wp - wm) / max(wp + wm, 1e-300)
        print(f"{name:<14} {s2:8.4f} {wp:8.4f} {wm:8.4f} {w0:8.4f} "
              f"{asym:8.4f} {rel:9.1e}")

    # 4. swap-estimator cross-check on the symmetry-broken arm
    machine, params = trained["RBMTrSymm"]
    s1 = AmplitudeSampler(machine, params, n_walkers=2048, key=seed + 100)
    s2_ = AmplitudeSampler(machine, params, n_walkers=2048, key=seed + 200)
    est = renyi2_entropy(s1, s2_, l, n_iterations=60, n_sweeps=2, n_warmup=200)
    exact = next(r[1] for r in rows if r[0] == "RBMTrSymm")
    print(f"\n# swap-estimator cross-check (RBMTrSymm): {est:.4f} "
          f"vs exact-enum {exact:.4f}  (|diff| = {abs(est - exact):.4f})")

    # 5. increment-trick estimator at a comparable sample budget: the
    # glued-ensemble ratio observable is O(1) per level, so the heavy-tail
    # low bias of the direct swap ratio (6c/6d) should vanish
    from neural_network_quantum_state_tpu.measurements import renyi2_increment

    inc, inc_err, _ = renyi2_increment(
        machine, params, l, n_iterations=60, n_sweeps=2, n_warmup=200,
        walkers_per_level=512, key=seed + 300,
    )
    print(f"# increment-estimator cross-check (RBMTrSymm): {inc:.4f} +/- {inc_err:.4f} "
          f"vs exact-enum {exact:.4f}  (|diff| = {abs(inc - exact):.4f})")

    # 6. hybrid: Z2-orbit-quadrature swap base at l0=1 (sector ergodicity
    # restored analytically) + Neel-init glued increment chain for levels
    # 1..l-1 - the deep-ordered production configuration
    # (drivers.measure -what=renyi_inc -l0=1 -init=neel)
    from neural_network_quantum_state_tpu.measurements.renyi_increment import swap_base_z2

    sa = AmplitudeSampler(machine, params, n_walkers=2048, key=seed + 400)
    sb = AmplitudeSampler(machine, params, n_walkers=2048, key=seed + 500)
    base, base_err = swap_base_z2(sa, sb, 1, n_iterations=60, n_sweeps=2, n_warmup=200)
    neel = np.where(np.arange(n) % 2 == 0, 1.0, -1.0)
    inc2, inc2_err, _ = renyi2_increment(
        machine, params, l, n_iterations=60, n_sweeps=2, n_warmup=200,
        walkers_per_level=512, key=seed + 600, level_offset=1,
        init_spins=(neel, neel),
    )
    tot = base + inc2
    tot_err = float(np.sqrt(base_err**2 + inc2_err**2))
    print(f"# hybrid (z2 base {base:.4f} + glue {inc2:+.4f}) cross-check: {tot:.4f} +/- {tot_err:.4f} "
          f"vs exact-enum {exact:.4f}  (|diff| = {abs(tot - exact):.4f})")


if __name__ == "__main__":
    main()
