"""Dense exact diagonalization for small spin systems (test oracle).

The reference has no tests; correctness there is physics-based convergence
monitoring (SURVEY.md 4). Here small-system ED provides hard anchors:
ground-state energies for the TFI family in the reference's conventions

    H = sum_{i<j} J_ij sigma^z_i sigma^z_j + h sum_i sigma^x_i

(s = +-1 eigenbasis of sigma^z; local energy htilda = diag + h * sum_i
psi(flip_i s)/psi(s), optionally scaled 1/L for LITFIChain).
"""

from __future__ import annotations

import numpy as np


def _spins_table(n: int) -> np.ndarray:
    """(2^n, n) array of s_i = +-1; bit 0 of the index is site 0, with
    s = +1 for bit value 0."""
    idx = np.arange(2**n)[:, None]
    bits = (idx >> np.arange(n)[None, :]) & 1
    return 1.0 - 2.0 * bits


def tfi_hamiltonian_dense(j_matrix: np.ndarray, h: float, scale: float = 1.0) -> np.ndarray:
    """Dense H for H = 0.5*sum_{i,j} J_ij sz_i sz_j + h*sum_i sx_i, scaled.

    j_matrix is the full symmetric coupling matrix with zero diagonal (the
    0.5 matches diag = 0.5 * s.J.s used throughout the reference kernels).
    """
    n = j_matrix.shape[0]
    dim = 2**n
    s = _spins_table(n)
    diag = 0.5 * np.einsum("ki,ij,kj->k", s, j_matrix, s)
    ham = np.diag(diag).astype(np.float64)
    # sigma^x_i flips bit i
    for i in range(n):
        flipped = np.arange(dim) ^ (1 << i)
        ham[np.arange(dim), flipped] += h
    return ham * scale


def tfi_chain_dense(n: int, h: float, j: float) -> np.ndarray:
    jm = np.zeros((n, n))
    for i in range(n):
        jm[i, (i + 1) % n] += j
        jm[(i + 1) % n, i] += j
    return tfi_hamiltonian_dense(jm, h)


def litfi_chain_dense(n: int, h: float, j: float, alpha: float, pbc: bool = True) -> np.ndarray:
    i, k = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    d = np.abs(i - k).astype(np.float64)
    if pbc:
        d = np.minimum(d, n - d)
    with np.errstate(divide="ignore"):
        jm = j * d**-alpha
    np.fill_diagonal(jm, 0.0)
    # per-site energy scale 1/L (gpu impl_hamiltonians.cuh:240)
    return tfi_hamiltonian_dense(jm, h, scale=1.0 / n)


def hubbard_chain_dense(
    l: int,
    u: float,
    t: float,
    pbc: bool = True,
    v: np.ndarray | None = None,
    scale_per_site: bool = True,
) -> np.ndarray:
    """Dense JW-spin-basis Hubbard chain H matching hamiltonians.hubbard's
    local-energy conventions (occupied = +1; inputs [0,L) up, [L,2L) down).

    H[s,s'] built so that Etilde(s) = sum_s' H[s,s'] psi(s')/psi(s)."""
    n = 2 * l
    dim = 2**n
    s = _spins_table(n)  # (dim, n)
    ham = np.zeros((dim, dim))
    idx = np.arange(dim)

    def flip2(a, b):
        return idx ^ (1 << a) ^ (1 << b)

    # interior hopping, both directions, both flavors
    for off in (0, l):
        for i in range(l - 1):
            for a, b in ((off + i, off + i + 1), (off + i + 1, off + i)):
                coeff = -0.25 * t * (1.0 + s[:, a]) * (1.0 - s[:, b])
                ham[idx, flip2(a, b)] += coeff
        if pbc:
            a, b = off, off + l - 1
            string = np.prod(-s[:, off + 1 : off + l - 1], axis=1)
            coeff = -0.25 * t * 2.0 * string * (1.0 - s[:, a] * s[:, b])
            ham[idx, flip2(a, b)] += coeff
    # onsite + potential (diagonal)
    diag = 0.25 * u * np.sum((1.0 + s[:, :l]) * (1.0 + s[:, l:]), axis=1)
    if v is not None:
        diag = diag + 0.5 * np.sum(np.asarray(v)[None, :] * (1.0 + s), axis=1)
    ham[idx, idx] += diag
    if scale_per_site:
        ham /= l
    return ham


def sector_restrict(ham: np.ndarray, l: int, n_up: int, n_down: int) -> tuple[np.ndarray, np.ndarray]:
    """Restrict a 2L-spin Hubbard H to the (n_up, n_down) particle sector.
    Returns (H_sector, basis indices)."""
    n = 2 * l
    s = _spins_table(n)
    occ = (1 + s) / 2
    mask = (occ[:, :l].sum(1) == n_up) & (occ[:, l:].sum(1) == n_down)
    sel = np.where(mask)[0]
    return ham[np.ix_(sel, sel)], sel


def ground_energy(ham: np.ndarray) -> float:
    return float(np.linalg.eigvalsh(ham)[0])


def ground_state(ham: np.ndarray) -> tuple[float, np.ndarray]:
    w, v = np.linalg.eigh(ham)
    return float(w[0]), v[:, 0]


def spins_to_index(spins: np.ndarray) -> np.ndarray:
    """Map (-1/+1)^n spin rows to basis indices of _spins_table ordering."""
    n = spins.shape[-1]
    bits = ((1.0 - spins) / 2).astype(np.int64)
    return (bits << np.arange(n)).sum(axis=-1)


def tfi_chain_exact_energy(n: int, h: float, j: float) -> float:
    """Exact ground-state energy of the PBC transverse-field Ising chain at
    any N via Jordan-Wigner free fermions (Pfeuty, Ann. Phys. 57, 79 (1970)):

        E0 = -sum_m sqrt(J^2 + h^2 - 2|Jh| cos k_m),  k_m = (2m+1) pi / N,
        m = 0..N-1

    (the even-fermion-parity / antiperiodic momentum sector, which holds the
    finite-N ground state). Sign conventions match hamiltonians.TFIChain:
    H = J sum_i s_i s_{i+1} + h-term; for even N both sign choices of J and
    h are gauge-equivalent (sublattice / global rotations), so only |J|,|h|
    enter. Dense ED (tfi_chain_dense) covers N <= ~14; this covers N = 16+
    exactly (validated against ED in tests/test_utils.py)."""
    if n % 2 == 1:
        raise ValueError("even N required (sublattice gauge for the J sign)")
    m = np.arange(n)
    k = (2.0 * m + 1.0) * np.pi / n
    eps = np.sqrt(j * j + h * h - 2.0 * abs(j * h) * np.cos(k))
    return float(-np.sum(eps))


def litfi_ground_state_lanczos(
    n: int, theta: float, alpha: float, pbc: bool = True
) -> tuple[float, np.ndarray]:
    """(E0, psi0) of the long-range AFM TFI chain (J = sin theta,
    h = -cos theta, 1/L scale - LITFIChain conventions) by sparse Lanczos.

    The dense builder (litfi_chain_dense) caps out around N=14 (2^N x 2^N);
    this matrix-free LinearOperator reaches N~22 on CPU: the diagonal is
    precomputed over all 2^N states and the sigma^x term is N pure bit-flip
    permutation gathers per matvec."""
    import math

    from scipy.sparse.linalg import LinearOperator, eigsh

    j, h = math.sin(theta), -math.cos(theta)
    i, k = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    d = np.abs(i - k).astype(np.float64)
    if pbc:
        d = np.minimum(d, n - d)
    with np.errstate(divide="ignore"):
        jm = j * d**-alpha
    np.fill_diagonal(jm, 0.0)

    dim = 2**n
    s = _spins_table(n)
    diag = (0.5 / n) * np.einsum("ki,ij,kj->k", s, jm, s)
    hn = h / n
    flips = [np.arange(dim) ^ (1 << b) for b in range(n)]

    def matvec(v):
        out = diag * v
        for f in flips:
            out = out + hn * v[f]
        return out

    op = LinearOperator((dim, dim), matvec=matvec, dtype=np.float64)
    w, v = eigsh(op, k=1, which="SA")
    return float(w[0]), v[:, 0]


def litfi_binder_exact(n: int, theta: float, alpha: float, pbc: bool = True) -> dict:
    """Exact ground-state staggered-magnetization moments and Binder
    cumulant of the LITFI chain: m_s = (1/N) sum_i (-1)^i s_i evaluated
    over |psi0(s)|^2 (exactly the distribution the stag estimator samples,
    drivers.measure -what=stag). Anchors the VMC Binder pipeline and the
    finite-size-crossing drift at ED-reachable sizes."""
    _, psi = litfi_ground_state_lanczos(n, theta, alpha, pbc)
    p = psi**2
    p /= p.sum()
    s = _spins_table(n)
    stag = (s * np.where(np.arange(n) % 2 == 0, 1.0, -1.0)).sum(axis=1) / n
    m1 = float(np.abs(stag) @ p)
    m2 = float((stag**2) @ p)
    m4 = float((stag**4) @ p)
    return {"m1": m1, "m2": m2, "m4": m4, "U": 1.0 - m4 / (3.0 * m2**2)}
