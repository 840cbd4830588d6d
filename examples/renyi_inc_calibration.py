"""Production-budget calibration of the hybrid increment-Renyi estimator.

The N=12 cross-check inside examples/renyi_cat_study.py runs the hybrid
estimator (Z2-orbit-quadrature swap base at l0=1 + glued increment chain)
at a LIGHT budget (60 iterations, 200 warm-up) and read 0.7315 +/- 0.0050
vs exact-enum 0.7168 - a ~3 sigma residual whose origin (glue-chain
equilibration vs a real freeze bias) the light budget cannot separate.

This calibration repeats the same measurement at the PRODUCTION budget
used for the N=64 campaign numbers (RESULTS 6e: 800 iterations, 600
warm-up, 512 walkers/level, nbeta=4 tempered base) over several
independent seeds, against the exact-enumeration oracle:

  - per-seed estimate, pull (est - exact)/err;
  - mean bias over seeds with its standard error.

Usage (CPU f64, ~15 min single-core):
    JAX_PLATFORMS=cpu python examples/renyi_inc_calibration.py
        [-L=12] [-theta=1.57] [-nseed=4] [-niter=800]
"""

from __future__ import annotations

import math
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from examples.renyi_cat_study import psi_of, s2_exact, train  # noqa: E402
from neural_network_quantum_state_tpu.hamiltonians import LITFIChain  # noqa: E402
from neural_network_quantum_state_tpu.measurements import (  # noqa: E402
    AmplitudeSampler,
    renyi2_increment,
)
from neural_network_quantum_state_tpu.measurements.renyi_increment import (  # noqa: E402
    swap_base_z2,
)
from neural_network_quantum_state_tpu.models import RBMTrSymm  # noqa: E402
from neural_network_quantum_state_tpu.utils.cli import DriverArgs  # noqa: E402


def main() -> None:
    args = DriverArgs(
        sys.argv[1:],
        options=[
            ("L", "chain length (ED-reachable)"),
            ("theta", "J = sin(theta), h = -cos(theta)"),
            ("alpha", "long-range decay exponent alpha_J"),
            ("nf", "RBM filters per ansatz"),
            ("niter", "measurement iterations (production: 800)"),
            ("nwarm", "measurement warm-up sweeps (production: 600)"),
            ("ns", "glue walkers per level (production: 512)"),
            ("nseed", "number of independent measurement seeds"),
            ("seed", "training seed"),
        ],
        defaults={
            "L": "12", "theta": "1.57", "alpha": "2.5", "nf": "4",
            "niter": "800", "nwarm": "600", "ns": "512", "nseed": "4",
            "seed": "1",
        },
        prog="renyi_inc_calibration",
    )
    n = args.find("L", int)
    l = n // 2
    theta = args.find("theta", float)
    niter, nwarm = args.find("niter", int), args.find("nwarm", int)
    ns, nseed = args.find("ns", int), args.find("nseed", int)
    j, h = math.sin(theta), -math.cos(theta)

    machine = RBMTrSymm(n_inputs=n, alpha=args.find("nf", int),
                        dtype=jnp.float64)
    ham = LITFIChain(n_sites=n, h=h, j=j, alpha=args.find("alpha", float),
                     pbc=True)
    params, e = train(machine, ham, args.find("seed", int), 1500, 1024, True)
    exact = s2_exact(psi_of(machine, params), n, l)
    print(f"# trained RBMTrSymm N={n} theta={theta}: E/site = {e:.6f}; "
          f"exact-enum S2(l={l}) = {exact:.4f}")

    neel = np.where(np.arange(n) % 2 == 0, 1.0, -1.0)
    ests = []
    for k in range(nseed):
        seed = 1000 + 77 * k
        sa = AmplitudeSampler(machine, params, n_walkers=2048, key=seed + 17,
                              n_beta=4)
        sb = AmplitudeSampler(machine, params, n_walkers=2048,
                              key=seed + 987654341, n_beta=4)
        base, base_err = swap_base_z2(sa, sb, 1, niter, 2, nwarm)
        glue, glue_err, _ = renyi2_increment(
            machine, params, l, niter, 2, nwarm, walkers_per_level=ns,
            key=seed, level_offset=1, init_spins=(neel, neel),
        )
        tot = base + glue
        err = float(np.sqrt(base_err**2 + glue_err**2))
        pull = (tot - exact) / err
        ests.append((tot, err))
        print(f"# seed {k}: base {base:.4f}(±{base_err:.4f}) "
              f"glue {glue:+.4f}(±{glue_err:.4f}) -> S2 = {tot:.4f} ± {err:.4f}"
              f"  [pull {pull:+.2f}]")

    vals = np.array([t for t, _ in ests])
    errs = np.array([e_ for _, e_ in ests])
    mean = vals.mean()
    sem = vals.std(ddof=1) / math.sqrt(len(vals)) if len(vals) > 1 else errs[0]
    print(f"# mean over {nseed} seeds: S2 = {mean:.4f} ± {sem:.4f} "
          f"(exact {exact:.4f}; bias {mean - exact:+.4f} ± {sem:.4f}; "
          f"mean formal err {errs.mean():.4f})")


if __name__ == "__main__":
    main()
