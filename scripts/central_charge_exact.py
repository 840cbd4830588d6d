"""Exact-diagonalization anchor for the central-charge measurement.

Computes the EXACT ground-state Renyi-2 entanglement profile S2(l) of the
long-range AFM TFI chain (LITFIChain conventions: J = sin theta,
h = -cos theta, J_ij = J/d(i,j)^alpha, PBC) at ED-reachable sizes via the
matrix-free Lanczos solver (utils/exact.litfi_ground_state_lanczos), and
fits the same increment-space Calabrese-Cardy form the VMC fit uses
(scripts/central_charge_fit.fit_c):

    -ln(q_{j+1}/q_j) = (c/4) [x(j+1) - x(j)],
    x(l) = ln[(N/pi) sin(pi l / N)]

This anchors the N=64 VMC profile run (logs/renyi_profile_N64_T09.log):
the exact small-N c(N) drift says how much of any deviation from the
short-range Ising c = 1/2 is finite-size transient vs long-range physics
(alpha = 2.5 sits in the regime where the transition's universality class
deviates from short-range 2D Ising).

Usage:
    python scripts/central_charge_exact.py -theta=0.9 [-alpha=2.5]
        [-N=10,12,14,16,18,20] [-lmin=2] [-json=PATH]
"""

from __future__ import annotations

import json
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from neural_network_quantum_state_tpu.utils.exact import litfi_ground_state_lanczos  # noqa: E402
from scripts.central_charge_fit import fit_c  # noqa: E402


def exact_s2_profile(psi: np.ndarray, n: int) -> np.ndarray:
    """S2(l) for l = 1..n-1; subsystem A = sites [0, l) = the low l bits
    of the basis index (same convention as tests/test_measurements.py)."""
    out = np.zeros(n - 1)
    for l in range(1, n):
        mat = psi.reshape(2 ** (n - l), 2**l)
        sv = np.linalg.svd(mat, compute_uv=False)
        out[l - 1] = -np.log(np.sum(sv**4))
    return out


def main() -> None:
    kw = dict(a[1:].split("=", 1) for a in sys.argv[1:] if a.startswith("-"))
    theta = float(kw.get("theta", "0.9"))
    alpha = float(kw.get("alpha", "2.5"))
    sizes = [int(s) for s in kw.get("N", "10,12,14,16,18,20").split(",")]
    lmin = int(kw.get("lmin", "2"))
    res = {"theta": theta, "alpha": alpha, "lmin": lmin, "sizes": {}}
    for n in sizes:
        e0, psi = litfi_ground_state_lanczos(n, theta, alpha, pbc=True)
        s2 = exact_s2_profile(psi, n)
        # increment dict in the fit_c contract: ln(q_{j+1}/q_j) = -dS2;
        # exact values -> uniform nominal errors (c_err is then formal
        # only; chi2/dof measures genuine Calabrese-Cardy-form deviation)
        inc = {j: (-(s2[j] - s2[j - 1]), 1e-3) for j in range(1, n // 2)}
        lmin_eff = max(1, min(lmin, n // 2 - 3))  # keep >= 3 increments at small N
        fit = fit_c(inc, n, lmin_eff)
        res["sizes"][n] = {
            "e0_per_site": e0,
            "s2_halfchain": float(s2[n // 2 - 1]),
            "c": fit["c"],
            "chi2_dof": fit["chi2_dof"],
            "profile": [float(v) for v in s2],
        }
        print(f"# N={n:3d}  E0/site={e0:+.6f}  S2(N/2)={s2[n // 2 - 1]:.4f}  "
              f"c={fit['c']:.4f}  (CC-form chi2/dof {fit['chi2_dof']:.3g}, "
              f"j in {fit['j_window']})")
    if "json" in kw:
        with open(kw["json"], "w") as f:
            json.dump(res, f, indent=1)
        print(f"# wrote {kw['json']}")


if __name__ == "__main__":
    main()
