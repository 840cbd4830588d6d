"""MINRES for Hermitian (possibly indefinite) systems, split-complex.

Covers the reference's MINRES-QLP backend (linearsolver::MINRESQLP wrapping
a full C++ port of the Stanford SOL f90 code, cpu/include/minresqlp.hpp:
74-135 + impl_minresqlp.hpp). Rather than porting those 1110 lines, this is
a from-scratch Lanczos + Givens MINRES (Paige & Saunders 1975) written as a
jit-friendly ``lax.while_loop`` over split-complex vectors. For the
regularized SR systems this framework solves, S + lambda*diag is
nonsingular and MINRES minimizes the same residual the QLP variant does;
truly singular systems are served by ``minres_qlp_solve`` below or the SVD
pseudo-inverse solver (optim.solvers.svd_lstsq).

``minres_qlp_solve`` is MINRES-QLP (Choi, Paige & Saunders, SIAM J. Sci.
Comput. 33(4), 2011): right-side rotations turn the MINRES triangular
factor into a lower-tridiagonal L, yielding the MINIMUM-LENGTH
least-squares solution on singular or rank-deficient systems
(x -> pinv(A) b) — the reference solver's min-norm contract. It runs in
always-QLP mode (the paper's TranCond = 1), dropping the MINRES->QLP
transfer bookkeeping at the cost of ~4 extra axpys per iteration. Since A
is Hermitian the Lanczos tridiagonal is real, so all rotations are real
scalar pairs; only the Lanczos/solution vectors are complex.
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


def _sym_givens(a: jnp.ndarray, b: jnp.ndarray):
    """Stable real Givens (SymOrtho): c*a + s*b = r >= sign conventions of
    the QLP paper; (a,0) -> (sign(a), 0, |a|), (0,0) -> (1, 0, 0)."""
    r = jnp.hypot(a, b)
    safe_r = jnp.where(r == 0, 1.0, r)
    c = jnp.where(r == 0, 1.0, a / safe_r)
    s = jnp.where(r == 0, 0.0, b / safe_r)
    return c, s, r


def minres_qlp_solve(
    matvec: Callable[[C], C],
    rhs: C,
    tol: float = 1e-9,
    max_iters: int = 1000,
    max_xnorm: float = 1e7,
) -> MinresResult:
    """Minimum-length solution of the Hermitian least-squares problem
    min ||x|| s.t. x minimizes ||A x - rhs|| (matrix-free MINRES-QLP).

    On nonsingular A this agrees with ``minres_solve``; on singular A it
    converges to ``pinv(A) @ rhs`` where plain MINRES diverges or returns a
    non-minimal solution."""
    rdt = rhs.re.dtype
    eps = jnp.finfo(rdt).eps
    beta1 = jnp.sqrt(cplx.norm2(rhs))
    safe_beta1 = jnp.where(beta1 == 0, 1.0, beta1)
    v1 = rhs * (1.0 / safe_beta1)
    zv = cplx.zeros_like(rhs)
    z = jnp.zeros((), rdt)

    # carry layout:
    #  vectors: v_prev, v (Lanczos), xl2, wl, w, x
    #  Lanczos scalars: beta, betan
    #  left rotation: cs, sn, dltan, eplnn, gama, gamal, gamal2
    #  right rotations: cr1, sr1, cr2, sr2, vepln, veplnl, veplnl2,
    #                   eta, etal, etal2
    #  rhs recurrences: phi, tau, taul, taul2, u, ul, ul2, ul3
    #  control: it, gama_scale (running max |gama| for the rank test)
    class S(NamedTuple):
        v_prev: C
        v: C
        xl2: C
        wl: C
        w: C
        x: C
        beta: jnp.ndarray
        betan: jnp.ndarray
        cs: jnp.ndarray
        sn: jnp.ndarray
        dltan: jnp.ndarray
        eplnn: jnp.ndarray
        gama: jnp.ndarray
        gamal: jnp.ndarray
        gamal2: jnp.ndarray
        cr1: jnp.ndarray
        sr1: jnp.ndarray
        cr2: jnp.ndarray
        sr2: jnp.ndarray
        vepln: jnp.ndarray
        veplnl: jnp.ndarray
        veplnl2: jnp.ndarray
        eta: jnp.ndarray
        etal: jnp.ndarray
        etal2: jnp.ndarray
        phi: jnp.ndarray
        tau: jnp.ndarray
        taul: jnp.ndarray
        taul2: jnp.ndarray
        u: jnp.ndarray
        ul: jnp.ndarray
        ul2: jnp.ndarray
        ul3: jnp.ndarray
        it: jnp.ndarray
        gmax: jnp.ndarray
        xl2norm: jnp.ndarray
        anorm: jnp.ndarray
        arnorm_rel: jnp.ndarray

    def cond(s: S):
        # continue while: iterations remain, the residual has not converged,
        # Lanczos has not broken down, and ||A r|| / (||A|| ||r||) has not
        # converged (the least-squares test for singular inconsistent
        # systems, minresQLP's flag-4/5 pair).
        return (
            (s.it < max_iters)
            & (s.phi > tol * beta1)
            & (s.betan > eps * safe_beta1)
            & (s.arnorm_rel > tol)
        )

    def body(s: S) -> S:
        it = s.it
        # --- Lanczos step: beta_{k+1} v_{k+1} = A v_k - alfa v_k - beta v_{k-1}
        beta = s.betan  # beta_k: computed as betan by the previous iteration
        p = matvec(s.v)
        alfa = cplx.vdot_re(p, s.v)
        p = p - s.v * alfa - s.v_prev * beta
        betan = jnp.sqrt(cplx.norm2(p))
        safe_bn = jnp.where(betan == 0, 1.0, betan)
        v_new = p * (1.0 / safe_bn)

        # --- previous left rotation Q_{k-1} applied to the new column
        dbar = s.dltan
        dlta = s.cs * dbar + s.sn * alfa
        gbar = s.sn * dbar - s.cs * alfa
        eplnn = s.sn * betan
        dltan = -s.cs * betan
        # --- current left rotation Q_k
        gamal2 = s.gamal
        gamal = s.gama
        cs, sn, gama = _sym_givens(gbar, betan)
        taul2, taul = s.taul, s.tau
        tau = cs * s.phi
        phi = sn * s.phi

        # --- previous right rotation P_{k-2,k}
        use2 = it >= 2
        veplnl2 = jnp.where(use2, s.veplnl, s.veplnl2)
        etal2 = jnp.where(use2, s.etal, s.etal2)
        etal = jnp.where(use2, s.eta, s.etal)
        dlta_r = jnp.where(use2, s.sr2 * s.vepln - s.cr2 * dlta, dlta)
        veplnl = jnp.where(use2, s.cr2 * s.vepln + s.sr2 * dlta, s.veplnl)
        eta = jnp.where(use2, s.sr2 * gama, s.eta)
        gama_r = jnp.where(use2, -s.cr2 * gama, gama)
        # --- current right rotation P_{k-1,k}
        use1 = it >= 1
        cr1_n, sr1_n, gamal_n = _sym_givens(gamal, dlta_r)
        cr1 = jnp.where(use1, cr1_n, s.cr1)
        sr1 = jnp.where(use1, sr1_n, s.sr1)
        gamal_rr = jnp.where(use1, gamal_n, gamal)
        vepln = jnp.where(use1, sr1_n * gama_r, s.vepln)
        gama_rr = jnp.where(use1, -cr1_n * gama_r, gama_r)

        # --- solution coefficient recurrences (t = L^{-1} rhs components)
        ul3 = s.ul2
        ul2 = jnp.where(
            it >= 2, (taul2 - etal2 * s.ul3 - veplnl2 * ul3) / jnp.where(gamal2 == 0, 1.0, gamal2), s.ul2
        )
        ul = jnp.where(
            use1, (taul - etal * ul3 - veplnl * ul2) / jnp.where(gamal_rr == 0, 1.0, gamal_rr), s.ul
        )
        gmax = jnp.maximum(s.gmax, jnp.maximum(jnp.abs(gamal_rr), jnp.abs(gama_rr)))
        xnorm_tmp = jnp.sqrt(s.xl2norm**2 + ul2**2 + ul**2)
        singular = (jnp.abs(gama_rr) <= gmax * (eps * 10.0)) | (xnorm_tmp >= max_xnorm)
        safe_g = jnp.where(singular, 1.0, gama_rr)
        u = jnp.where(singular, 0.0, (tau - eta * ul2 - vepln * ul) / safe_g)
        # minresQLP's maxxnorm guard: a step that would blow past the norm
        # ceiling is a null-space direction amplified by roundoff — drop it.
        u = jnp.where(jnp.sqrt(xnorm_tmp**2 + u**2) > max_xnorm, 0.0, u)
        xl2norm = jnp.sqrt(s.xl2norm**2 + ul2**2)

        # --- right-reflected basis update (always-QLP mode)
        def upd_first(_):
            # k=1: P rotations still at their init values (cr1=-1, sr1=0)
            return s.wl, s.v * s.sr1, s.v * (-s.cr1)

        def upd_second(_):
            wl2 = s.wl
            wl_n = s.w * cr1 + s.v * sr1
            w_n = s.w * sr1 - s.v * cr1
            return wl2, wl_n, w_n

        def upd_general(_):
            wl2 = s.wl
            wl_mid = s.w
            w_n = wl2 * s.sr2 - s.v * s.cr2
            wl2_n = wl2 * s.cr2 + s.v * s.sr2
            tmp = wl_mid * cr1 + w_n * sr1
            w_fin = wl_mid * sr1 - w_n * cr1
            return wl2_n, tmp, w_fin

        wl2, wl, w = jax.lax.switch(jnp.minimum(it, 2), [upd_first, upd_second, upd_general], None)
        xl2 = s.xl2 + wl2 * ul2
        x = xl2 + wl * ul + w * u

        # --- next right rotation P_{k-1,k+1} (also finalizes gamal)
        cr2, sr2, gamal_fin = _sym_givens(gamal_rr, eplnn)

        # --- norm estimates for the least-squares stop:
        # ||A r_{k-1}|| = ||r_{k-1}|| * hypot(gbar_k, dltan_{k+1})
        anorm = jnp.maximum(s.anorm, jnp.sqrt(beta**2 + alfa**2 + betan**2))
        arnorm_rel = jnp.hypot(gbar, dltan) / anorm

        return S(
            s.v, v_new, xl2, wl, w, x, beta, betan, cs, sn, dltan, eplnn,
            gama_rr, gamal_fin, gamal2, cr1, sr1, cr2, sr2, vepln, veplnl,
            veplnl2, eta, etal, etal2, phi, tau, taul, taul2, u, ul, ul2,
            ul3, it + 1, gmax, xl2norm, anorm, arnorm_rel,
        )

    init = S(
        zv, v1, zv, zv, zv, zv, z, beta1,
        -jnp.ones((), rdt), z, z, z, z, z, z,
        -jnp.ones((), rdt), z, -jnp.ones((), rdt), z,
        z, z, z, z, z, z,
        beta1, z, z, z, z, z, z, z,
        jnp.zeros((), jnp.int32), z, z, z, jnp.ones((), rdt),
    )
    out = jax.lax.while_loop(cond, body, init)
    x = cplx.where(beta1 == 0, cplx.zeros_like(out.x), out.x)
    return MinresResult(x=x, iterations=out.it, rel_residual=out.phi / safe_beta1)


def sr_minres_solve(o_mat: C, htilda: C, lam: jnp.ndarray, tol: float = 1e-9, max_iters: int = 1000):
    """Matrix-free SR solve via MINRES-QLP (the reference's MINRESQLP
    backend, linear_solver.hpp:48-165): min-length solution even when the
    sampled S-matrix is numerically rank-deficient."""
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

    res = minres_qlp_solve(matvec, f, tol=tol, max_iters=max_iters)
    return res.x, res
