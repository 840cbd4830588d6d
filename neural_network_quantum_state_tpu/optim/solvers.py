"""Dense linear solvers for the SR system (reference L6b).

TPU-native replacements for the reference's LAPACK/MAGMA/cuSOLVER backends
(cpu/include/linear_solver.hpp:23-203, gpu linear_solver.cuh:15-105).

TPU has no complex linear algebra, so the Hermitian complex system
S x = f (S = A + iB, A symmetric, B antisymmetric) is solved through its
standard real embedding

    [ A  -B ] [x_re]   [f_re]
    [ B   A ] [x_im] = [f_im]

which is symmetric (and PD iff S is HPD), so Cholesky/LU/SVD all apply and
tile onto the MXU.

| reference            | here              |
|----------------------|-------------------|
| BKF (zhesv)          | lu_solve          |
| cudaCF (posv)        | cholesky_solve    |
| SVD (zgelsd, 1e-10)  | svd_lstsq         |
| MINRESQLP            | optim.minresqlp   |
| cuLUF (getrf/getrs)  | lu_solve          |
"""

from __future__ import annotations

import jax.numpy as jnp
import jax.scipy.linalg as jsl

from neural_network_quantum_state_tpu.ops.cplx import C


def _embed(s: C, f: C) -> tuple[jnp.ndarray, jnp.ndarray, int]:
    v = s.re.shape[0]
    m = jnp.block([[s.re, -s.im], [s.im, s.re]])
    rhs = jnp.concatenate([f.re, f.im])
    return m, rhs, v


def lu_solve(s: C, f: C) -> C:
    """General LU solve (cuLUF / BKF stand-in)."""
    m, rhs, v = _embed(s, f)
    x = jsl.solve(m, rhs)
    return C(x[:v], x[v:])


def cholesky_solve(s: C, f: C) -> C:
    """Hermitian positive-definite solve (MAGMA cudaCF posv stand-in)."""
    m, rhs, v = _embed(s, f)
    c, lower = jsl.cho_factor(m, lower=True)
    x = jsl.cho_solve((c, lower), rhs)
    return C(x[:v], x[v:])


def svd_lstsq(s: C, f: C, rcond: float = 1e-10) -> C:
    """Pseudo-inverse least squares (zgelsd with rcond=1e-10,
    linear_solver.hpp:35-137)."""
    m, rhs, v = _embed(s, f)
    u, sv, vh = jnp.linalg.svd(m, full_matrices=False)
    cutoff = rcond * jnp.max(sv)
    inv = jnp.where(sv > cutoff, 1.0 / sv, 0.0)
    x = vh.T @ (inv * (u.T @ rhs))
    return C(x[:v], x[v:])


SOLVERS = {
    "lu": lu_solve,
    "cholesky": cholesky_solve,
    "svd": svd_lstsq,
}
