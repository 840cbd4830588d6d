"""Dense linear solvers for the SR system (reference L6b).

TPU-native replacements for the reference's LAPACK/MAGMA/cuSOLVER backends
(cpu/include/linear_solver.hpp:23-203, gpu linear_solver.cuh:15-105): the
Hermitian solves map onto XLA's batched Cholesky/LU/SVD, which tile onto the
MXU - no external library.

| reference            | here              |
|----------------------|-------------------|
| BKF (zhesv)          | lu_solve (general stable solve of the Hermitian S) |
| cudaCF (posv)        | cholesky_solve    |
| SVD (zgelsd, 1e-10)  | svd_lstsq         |
| MINRESQLP            | optim.minresqlp   |
| cuLUF (getrf/getrs)  | lu_solve          |
"""

from __future__ import annotations

import jax.numpy as jnp
import jax.scipy.linalg as jsl


def lu_solve(s: jnp.ndarray, f: jnp.ndarray) -> jnp.ndarray:
    """General LU solve (cuLUF / BKF stand-in)."""
    return jsl.solve(s, f)


def cholesky_solve(s: jnp.ndarray, f: jnp.ndarray) -> jnp.ndarray:
    """Hermitian positive-definite solve (MAGMA cudaCF posv stand-in)."""
    c, lower = jsl.cho_factor(s, lower=True)
    return jsl.cho_solve((c, lower), f)


def svd_lstsq(s: jnp.ndarray, f: jnp.ndarray, rcond: float = 1e-10) -> jnp.ndarray:
    """Pseudo-inverse least squares (zgelsd with rcond=1e-10,
    linear_solver.hpp:35-137)."""
    u, sv, vh = jnp.linalg.svd(s, full_matrices=False)
    cutoff = rcond * jnp.max(sv)
    inv = jnp.where(sv > cutoff, 1.0 / sv, 0.0).astype(s.dtype)
    return jnp.conj(vh.T) @ (inv * (jnp.conj(u.T) @ f))


SOLVERS = {
    "lu": lu_solve,
    "cholesky": cholesky_solve,
    "svd": svd_lstsq,
}
