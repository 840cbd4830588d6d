"""Extend the exact Binder anchor to N=24 (16.7M states, matrix-free
Lanczos) and recompute N=12 on the same fine theta grid, so the
fixed-ratio (12,24) crossing bridges the ED anchors ((8,16)=0.9243,
(10,20)=0.9110) and the VMC pair crossings at (16,32)/(32,64).

The N=24 diagonal and staggered moments are computed in chunks (the full
spins table would be 3.2 GB and the einsum intermediate another); the
sigma^x term stays N pure bit-flip permutation gathers per matvec
(utils.exact.litfi_ground_state_lanczos pattern).

Writes logs/binder_exact_n1224.json in the binder_crossing.py ED-grid
format. Run on CPU: ~10-20 min per N=24 theta point, single core.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

import numpy as np
from scipy.sparse.linalg import LinearOperator, eigsh

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from neural_network_quantum_state_tpu.utils.exact import litfi_binder_exact  # noqa: E402

# most-valuable first: the (12,24) crossing sits near 0.9; the script
# writes incrementally so later points are optional if the round ends
THETAS = [0.9, 0.925, 0.875, 0.95, 0.85]
ALPHA = 2.5
CHUNK = 1 << 20


def _j_matrix(n: int, theta: float, alpha: float) -> np.ndarray:
    j = math.sin(theta)
    i, k = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    d = np.abs(i - k).astype(np.float64)
    d = np.minimum(d, n - d)  # PBC circular distance
    with np.errstate(divide="ignore"):
        jm = j * d**-alpha
    np.fill_diagonal(jm, 0.0)
    return jm


def _spins_chunk(lo: int, hi: int, n: int) -> np.ndarray:
    """(hi-lo, n) +/-1 spin table for basis indices [lo, hi)."""
    idx = np.arange(lo, hi, dtype=np.uint64)[:, None]
    bits = (idx >> np.arange(n, dtype=np.uint64)[None, :]) & 1
    return 2.0 * bits.astype(np.float64) - 1.0


def binder_exact_large(n: int, theta: float, alpha: float) -> dict:
    dim = 1 << n
    jm = _j_matrix(n, theta, alpha)
    hn = -math.cos(theta) / n

    diag = np.empty(dim, np.float64)
    stag_sign = np.where(np.arange(n) % 2 == 0, 1.0, -1.0)
    stag = np.empty(dim, np.float64)
    # neighbor wave number k = pi + 2pi/N for the correlation ratio
    # R = S(k)/S(pi); both are diagonal in sigma_z so they ride the same
    # chunk pass (S(pi) = N * stag^2)
    k_nb = math.pi + 2.0 * math.pi / n
    nb_cos = np.cos(k_nb * np.arange(n))
    nb_sin = np.sin(k_nb * np.arange(n))
    amp_nb2 = np.empty(dim, np.float64)
    for lo in range(0, dim, CHUNK):
        hi = min(lo + CHUNK, dim)
        s = _spins_chunk(lo, hi, n)
        diag[lo:hi] = (0.5 / n) * np.einsum("ki,ki->k", s @ jm, s)
        stag[lo:hi] = (s @ stag_sign) / n
        amp_nb2[lo:hi] = (s @ nb_cos) ** 2 + (s @ nb_sin) ** 2

    # precomputed int32 flip tables: 24 x 67 MB at N=24, vs recomputing the
    # XOR per matvec (the gather dominates; indices fit int32 for N<=31)
    idx = np.arange(dim, dtype=np.int32)
    flips = [(idx ^ np.int32(1 << b)) for b in range(n)]

    def matvec(v):
        out = diag * v
        for f in flips:
            out += hn * v[f]
        return out

    op = LinearOperator((dim, dim), matvec=matvec, dtype=np.float64)
    t0 = time.time()
    # tol 1e-6 is ample: near theta_c the ground doublet is quasi-degenerate
    # and |stag| moments are invariant under mixing within it, so tight
    # convergence onto one doublet member is wasted matvecs
    w, vecs = eigsh(op, k=1, which="SA", tol=1e-6, maxiter=400)
    psi = vecs[:, 0]
    p = psi * psi
    p /= p.sum()
    m1 = float(np.abs(stag) @ p)
    m2 = float((stag**2) @ p)
    m4 = float((stag**4) @ p)
    u = 1.0 - m4 / (3.0 * m2**2)
    s_peak = n * m2  # S(pi) = N <m_s^2>
    s_nb = float(amp_nb2 @ p) / n
    r = s_nb / s_peak
    print(
        f"N={n} theta={theta}: E0={w[0]:.6f} U={u:.6f} "
        f"(m1={m1:.4f}, R={r:.4f}) [{time.time() - t0:.0f}s]",
        flush=True,
    )
    return {"m1": m1, "m2": m2, "m4": m4, "U": u,
            "S_peak": s_peak, "S_nb": s_nb, "R": r}


def main():
    out = {"thetas": THETAS, "U": {"12": [], "24": []}}
    for t in THETAS:
        r12 = litfi_binder_exact(12, t, ALPHA)
        print(f"N=12 theta={t}: U={r12['U']:.6f}", flush=True)
        out["U"]["12"].append(r12["U"])
    for t in THETAS:
        r24 = binder_exact_large(24, t, ALPHA)
        out["U"]["24"].append(r24["U"])
        # write incrementally so partial progress is usable
        with open(os.path.join(REPO, "logs", "binder_exact_n1224.json"), "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
