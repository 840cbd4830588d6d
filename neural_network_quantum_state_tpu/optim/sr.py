"""Stochastic Reconfiguration (imaginary-time natural gradient).

Math (Sorella et al., J. Chem. Phys. 127, 014105; reference
cpu/include/optimizer.hpp:16-206, functor_for_CG.hpp:7-103, gpu
optimizer.cuh:113-181): with per-walker log-derivatives O (K,V) and local
energies Etilde (K,):

    aO_i   = <O_i>
    S_ij   = <O_i* O_j> - aO_i* aO_j                 (Hermitian PSD)
    F_i    = <Etilde O_i*> - <Etilde> aO_i*
    theta <- theta - dt * S^{-1} F

Regularization schedule lambda(n) = max(100 * 0.9^(n+1), 1e-2)
(impl_optimizer.hpp:22-28); matrix-free path adds lambda*diag(S) to the
matvec and preconditions with 1/((1+lambda) diag(S)) (functor_for_CG.hpp:
82-97); dense path scales diagonals S_ii *= (1+lambda)
(optimizer.hpp:58-66).

Everything is split-complex (ops.cplx): the S.v matvec is 6 real MXU
matmuls over the walker axis; under a sharded mesh those contractions lower
to psum-style collectives of O(V) - the only cross-device traffic VMC
needs.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax.numpy as jnp

from neural_network_quantum_state_tpu.ops import cplx
from neural_network_quantum_state_tpu.ops.cplx import C
from neural_network_quantum_state_tpu.optim.cg import CGResult, cg_solve

LAMBDA0, LAMBDA_DECAY, LAMBDA_MIN = 100.0, 0.9, 1e-2


def lambda_schedule(step: jnp.ndarray | int, dtype=jnp.float32) -> jnp.ndarray:
    """lambda(n) = max(100 * 0.9^(n+1), 1e-2) - schedular_() is called once
    per iteration before the solve (impl_optimizer.hpp:22-28)."""
    n = jnp.asarray(step, dtype)
    return jnp.maximum(LAMBDA0 * LAMBDA_DECAY ** (n + 1.0), LAMBDA_MIN)


class SRStats(NamedTuple):
    energy: C  # () scalar: <Etilde>
    rsd: jnp.ndarray  # () real: sqrt(var/|mean|^2)  (gpu optimizer.cuh:156-158)
    cg_iters: jnp.ndarray  # () int32 (0 for dense solves)
    lam: jnp.ndarray  # () real


def energy_and_rsd(htilda: C) -> tuple[C, jnp.ndarray]:
    havg = cplx.cmean(htilda)
    h2 = cplx.abs2(havg)
    var = jnp.mean(cplx.abs2(htilda)) - h2
    rsd = jnp.sqrt(jnp.maximum(var, 0.0) / h2)
    return havg, rsd


def force_vector(o_mat: C, htilda: C) -> tuple[C, C]:
    """F_i = <Etilde O_i*> - <Etilde><O_i>*; returns (F, aO).

    Etilde * conj(O): re = Er*Or + Ei*Oi, im = Ei*Or - Er*Oi - two real
    GEMV pairs over the walker axis."""
    k = o_mat.re.shape[0]
    havg = cplx.cmean(htilda)
    a_o = cplx.cmean(o_mat, axis=0)
    t_re = (htilda.re @ o_mat.re + htilda.im @ o_mat.im) / k
    t_im = (htilda.im @ o_mat.re - htilda.re @ o_mat.im) / k
    f = C(t_re, t_im) - havg * cplx.conj(a_o)
    return f, a_o


def sr_diag(o_mat: C, a_o: C) -> jnp.ndarray:
    """diag(S)_i = <|O_i|^2> - |aO_i|^2 (real)."""
    return jnp.mean(cplx.abs2(o_mat), axis=0) - cplx.abs2(a_o)


def sr_cg_solve(
    o_mat: C,
    htilda: C,
    lam: jnp.ndarray,
    tol: float = 1e-5,
    max_iters: int = 1000,
    precond_diag: jnp.ndarray | None = None,
) -> tuple[C, CGResult]:
    """Matrix-free SR solve: never materializes S (O(KV), not O(V^2)).

    The S.a operator is two walker-axis GEMV pairs plus a rank-1 correction
    and the scaled-diagonal regularization (SMatrixForCG::dot,
    functor_for_CG.hpp:66-97).

    precond_diag: optional replacement diagonal for the preconditioner only
    (e.g. a moving average of diag(S) across iterations - a smoother
    estimate than one round's K samples give at large V). Regularization
    always uses the CURRENT diag(S) (reference semantics).
    """
    k = o_mat.re.shape[0]
    f, a_o = force_vector(o_mat, htilda)
    diag = sr_diag(o_mat, a_o)
    lam = lam.astype(diag.dtype)
    a_o_c = cplx.conj(a_o)

    def matvec(a: C) -> C:
        z = cplx.matmul_cc(o_mat, a)  # (K,)
        b = cplx.matmul_conj_t_c(o_mat, z) * (1.0 / k)  # O^H z / K
        b = b - a_o_c * cplx.cdot(a_o, a)
        return b + cplx.rscale(lam * diag, a)

    # Relative floor on the preconditioner diagonal: zero-variance parameter
    # directions (frozen spins / symmetric cancellations) make diag(S)_i = 0
    # exactly, and 1/((1+lam)*diag) then explodes the CG search directions
    # into f32 overflow. The reference divides unguarded
    # (functor_for_CG.hpp:94-97).
    pdiag = diag if precond_diag is None else precond_diag.astype(diag.dtype)
    floor = 1e-10 * jnp.max(pdiag) + jnp.finfo(diag.dtype).tiny
    diag_safe = jnp.maximum(pdiag, floor)

    def precond(r: C) -> C:
        return cplx.rscale(1.0 / ((1.0 + lam) * diag_safe), r)

    res = cg_solve(matvec, f, precond=precond, tol=tol, max_iters=max_iters)
    return res.x, res


def build_s_matrix(o_mat: C, a_o: C) -> C:
    """Dense S = (1/K) O^H O - aO^* aO^T  (V,V) split-complex."""
    k = o_mat.re.shape[0]
    s = cplx.matmul_conj_t_c(o_mat, o_mat) * (1.0 / k)
    # rank-1: conj(aO)_i * aO_j
    r1_re = a_o.re[:, None] * a_o.re[None, :] + a_o.im[:, None] * a_o.im[None, :]
    r1_im = a_o.re[:, None] * a_o.im[None, :] - a_o.im[:, None] * a_o.re[None, :]
    return s - C(r1_re, r1_im)


def sr_dense_solve(
    o_mat: C,
    htilda: C,
    lam: jnp.ndarray,
    solver: Callable[[C, C], C],
) -> C:
    """Dense SR: build S (V,V), scale diagonal by (1+lambda), solve.

    Replaces the LAPACK/MAGMA dense path (StochasticReconfiguration,
    optimizer.hpp:16-88; linear_solver.hpp BKF/SVD/cuLUF). Solvers use the
    real 2Vx2V embedding of the Hermitian system (optim.solvers)."""
    f, a_o = force_vector(o_mat, htilda)
    s = build_s_matrix(o_mat, a_o)
    s = _regularize_dense(s, lam)
    return solver(s, f)


def _regularize_dense(s: C, lam) -> C:
    """S_ii *= (1+lambda) (optimizer.hpp:58-62) plus a tiny absolute ridge:
    exact-zero diagonal rows (zero-variance parameter directions, e.g. a
    frozen visible bias) make the scaled matrix exactly singular and
    Cholesky/LU produce NaN - the reference's BKF would also fail there."""
    v = s.re.shape[0]
    eye = jnp.eye(v, dtype=s.re.dtype)
    diag = jnp.diagonal(s.re)
    ridge = 1e-7 * jnp.max(diag) + jnp.finfo(s.re.dtype).tiny
    return C(s.re + eye * (lam.astype(s.re.dtype) * diag + ridge), s.im)


def sr_dense_solve_accumulated(samples: list[tuple[C, C]], lam: jnp.ndarray, solver: Callable[[C, C], C]) -> C:
    """Dense SR with accumulation over multiple sampling rounds
    (StochasticReconfiguration::propagate naccumulation loop,
    optimizer.hpp:37-57): S, F, aO averaged over rounds before the solve."""
    n_acc = len(samples)
    k = samples[0][0].re.shape[0]
    v = samples[0][0].re.shape[1]
    s_sum = cplx.zeros((v, v), samples[0][0].dtype)
    f_sum = cplx.zeros((v,), samples[0][0].dtype)
    a_sum = cplx.zeros((v,), samples[0][0].dtype)
    h_sum = cplx.zeros((), samples[0][0].dtype)
    for o_mat, htilda in samples:
        s_sum = s_sum + cplx.matmul_conj_t_c(o_mat, o_mat) * (1.0 / (k * n_acc))
        a_sum = a_sum + cplx.cmean(o_mat, axis=0) * (1.0 / n_acc)
        havg = cplx.cmean(htilda)
        h_sum = h_sum + havg * (1.0 / n_acc)
        t_re = (htilda.re @ o_mat.re + htilda.im @ o_mat.im) / (k * n_acc)
        t_im = (htilda.im @ o_mat.re - htilda.re @ o_mat.im) / (k * n_acc)
        f_sum = f_sum + C(t_re, t_im)
    # rank-1 and cross terms with the ROUND-AVERAGED aO / <E>
    r1_re = a_sum.re[:, None] * a_sum.re[None, :] + a_sum.im[:, None] * a_sum.im[None, :]
    r1_im = a_sum.re[:, None] * a_sum.im[None, :] - a_sum.im[:, None] * a_sum.re[None, :]
    s = s_sum - C(r1_re, r1_im)
    f = f_sum - h_sum * cplx.conj(a_sum)
    s = _regularize_dense(s, lam)
    return solver(s, f)


def sr_minsr_solve(
    o_mat: C,
    htilda: C,
    lam: jnp.ndarray,
    solver: Callable[[C, C], C] | None = None,
) -> tuple[C, jnp.ndarray]:
    """minSR / kernel-trick SR: solve the SR system in WALKER space.

    With centered Oc = O - <O> (K,V) and eps = Etilde - <Etilde> (K,):
    S = Oc^H Oc / K and F = Oc^H eps / K, so by the push-through identity
    (A^H A + l)^{-1} A^H = A^H (A A^H + l)^{-1} the ridge-regularized SR
    update is EXACTLY

        dx = Oc^H (Oc Oc^H / K + l I_K)^{-1} eps / K

    i.e. one dense KxK Hermitian solve instead of a VxV one (Chen & Heyl,
    arXiv:2302.01941; Rende et al. 2023). No counterpart in the reference
    (its dense path is VxV BKF/MAGMA, optimizer.hpp:16-88) - this is the
    TPU-first option for V >> K: building the Gram matrix is one
    (K,V)x(V,K) GEMM pair that tiles onto the MXU, replacing a
    latency-bound CG iteration chain, and the answer is the exact
    regularized solve rather than a truncated Krylov approximation.

    Regularization: the kernel trick requires an ISOTROPIC ridge l*I (the
    reference's lambda*diag(S) scaling has no walker-space equivalent), so
    the schedule value is rescaled by mean(diag S) to stay unit-consistent:
    l = lam * mean(diag S) + floor. Equivalence against the dense V-space
    solve with the identical absolute ridge is tested to fp precision.

    Returns (dx, l) so callers can log the effective ridge.
    """
    if solver is None:
        from neural_network_quantum_state_tpu.optim.solvers import lu_solve

        solver = lu_solve
    k = o_mat.re.shape[0]
    a_o = cplx.cmean(o_mat, axis=0)
    havg = cplx.cmean(htilda)
    oc = o_mat - cplx.broadcast_to(a_o, o_mat.shape)
    eps = htilda - cplx.broadcast_to(havg, htilda.shape)
    diag_s = jnp.mean(cplx.abs2(oc), axis=0)  # == sr_diag(o_mat, a_o)
    lam_abs = (
        lam.astype(diag_s.dtype) * jnp.mean(diag_s)
        + 1e-7 * jnp.max(diag_s)
        + jnp.finfo(diag_s.dtype).tiny
    )
    # T = Oc Oc^H / K: Oc^H as a (V,K) split-complex matrix is
    # (re^T, -im^T); under a walker mesh the row-sharded Oc contracts over
    # the replicated V axis (TP mesh: psum over V column blocks).
    oc_h = C(oc.re.T, -oc.im.T)
    t = cplx.matmul_cc(oc, oc_h) * (1.0 / k)
    eye = jnp.eye(k, dtype=t.re.dtype)
    t = C(t.re + eye * lam_abs, t.im)
    y = solver(t, eps * (1.0 / k))
    return cplx.matmul_conj_t_c(oc, y), lam_abs


def sgd_diag_solve(o_mat: C, htilda: C, lam: jnp.ndarray) -> C:
    """Diagonal-S-only variant (StochasticGradientDescent,
    optimizer.hpp:92-156): dx_i = F_i / ((1+lambda) * S_ii)."""
    f, a_o = force_vector(o_mat, htilda)
    diag = sr_diag(o_mat, a_o)
    return cplx.rscale(1.0 / ((1.0 + lam) * diag), f)
