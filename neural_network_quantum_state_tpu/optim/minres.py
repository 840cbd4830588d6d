"""MINRES for Hermitian (possibly indefinite) systems, split-complex.

Covers the reference's MINRES-QLP backend (linearsolver::MINRESQLP wrapping
a full C++ port of the Stanford SOL f90 code, cpu/include/minresqlp.hpp:
74-135 + impl_minresqlp.hpp). Rather than porting those 1110 lines, this is
a from-scratch Lanczos + Givens MINRES (Paige & Saunders 1975) written as a
jit-friendly ``lax.while_loop`` over split-complex vectors. For the
regularized SR systems this framework solves, S + lambda*diag is
nonsingular and MINRES minimizes the same residual the QLP variant does;
truly singular systems are served by the SVD pseudo-inverse solver
(optim.solvers.svd_lstsq).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from neural_network_quantum_state_tpu.ops import cplx
from neural_network_quantum_state_tpu.ops.cplx import C


class MinresResult(NamedTuple):
    x: C
    iterations: jnp.ndarray
    rel_residual: jnp.ndarray


def minres_solve(
    matvec: Callable[[C], C],
    rhs: C,
    tol: float = 1e-9,
    max_iters: int = 1000,
) -> MinresResult:
    """Solve A x = rhs for Hermitian A (matrix-free)."""
    rdt = rhs.re.dtype
    beta1 = jnp.sqrt(cplx.norm2(rhs))
    safe_beta1 = jnp.where(beta1 == 0, 1.0, beta1)
    v = rhs * (1.0 / safe_beta1)
    v_old = cplx.zeros_like(rhs)
    w = cplx.zeros_like(rhs)
    w_old = cplx.zeros_like(rhs)
    x = cplx.zeros_like(rhs)

    # carry: x, v, v_old, w_old(=w_{k-2}), w(=w_{k-1}), beta, eta,
    #        gamma0, gamma1, sigma0, sigma1, it
    def cond(s):
        *_, eta, _, _, _, _, it = s
        return (it < max_iters) & (jnp.abs(eta) > tol * beta1)

    def body(s):
        x, v, v_old, w_old, w, beta, eta, gamma0, gamma1, sigma0, sigma1, it = s
        p = matvec(v)
        alpha = cplx.vdot_re(p, v)  # real for Hermitian A
        p = p - v * alpha - v_old * beta
        beta_new = jnp.sqrt(cplx.norm2(p))
        safe_bn = jnp.where(beta_new == 0, 1.0, beta_new)
        v_new = p * (1.0 / safe_bn)

        # apply previous Givens rotations to the new tridiagonal column
        delta = gamma1 * alpha - gamma0 * sigma1 * beta
        rho1 = jnp.sqrt(delta * delta + beta_new * beta_new)
        rho2 = sigma1 * alpha + gamma0 * gamma1 * beta
        rho3 = sigma0 * beta
        safe_rho1 = jnp.where(rho1 == 0, 1.0, rho1)
        gamma_new = delta / safe_rho1
        sigma_new = beta_new / safe_rho1

        w_new = (v - w_old * rho3 - w * rho2) * (1.0 / safe_rho1)
        x = x + w_new * (gamma_new * eta)
        eta = -sigma_new * eta
        return (x, v_new, v, w, w_new, beta_new, eta, gamma1, gamma_new, sigma1, sigma_new, it + 1)

    one = jnp.ones((), rdt)
    zero = jnp.zeros((), rdt)
    state = (x, v, v_old, w_old, w, zero, beta1, one, one, zero, zero, jnp.zeros((), jnp.int32))
    state = jax.lax.while_loop(cond, body, state)
    x, eta, it = state[0], state[6], state[-1]
    x = cplx.where(beta1 == 0, cplx.zeros_like(x), x)
    return MinresResult(x=x, iterations=it, rel_residual=jnp.abs(eta) / safe_beta1)


def sr_minres_solve(o_mat: C, htilda: C, lam: jnp.ndarray, tol: float = 1e-9, max_iters: int = 1000):
    """Matrix-free SR solve via MINRES (the reference's MINRESQLP backend
    slot, linear_solver.hpp:48-165)."""
    from neural_network_quantum_state_tpu.optim.sr import force_vector, sr_diag

    k = o_mat.re.shape[0]
    f, a_o = force_vector(o_mat, htilda)
    diag = sr_diag(o_mat, a_o)
    lam = lam.astype(diag.dtype)
    a_o_c = cplx.conj(a_o)

    def matvec(a: C) -> C:
        z = cplx.matmul_cc(o_mat, a)
        b = cplx.matmul_conj_t_c(o_mat, z) * (1.0 / k)
        b = b - a_o_c * cplx.cdot(a_o, a)
        return b + cplx.rscale(lam * diag, a)

    res = minres_solve(matvec, f, tol=tol, max_iters=max_iters)
    return res.x, res
