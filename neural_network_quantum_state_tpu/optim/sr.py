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

All contractions are walker-axis reductions: under a sharded mesh they
lower to psum-style collectives of O(V) - the only cross-device traffic
VMC needs.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from neural_network_quantum_state_tpu.optim.cg import CGResult, cg_solve

LAMBDA0, LAMBDA_DECAY, LAMBDA_MIN = 100.0, 0.9, 1e-2


def lambda_schedule(step: jnp.ndarray | int, dtype=jnp.float32) -> jnp.ndarray:
    """lambda(n) = max(100 * 0.9^(n+1), 1e-2) - schedular_() is called once
    per iteration before the solve (impl_optimizer.hpp:22-28)."""
    n = jnp.asarray(step, dtype)
    return jnp.maximum(LAMBDA0 * LAMBDA_DECAY ** (n + 1.0), LAMBDA_MIN)


class SRStats(NamedTuple):
    energy: jnp.ndarray  # () complex: <Etilde>
    rsd: jnp.ndarray  # () real: sqrt(var/|mean|^2)  (gpu optimizer.cuh:156-158)
    cg_iters: jnp.ndarray  # () int32 (0 for dense solves)
    lam: jnp.ndarray  # () real


def energy_and_rsd(htilda: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    havg = jnp.mean(htilda)
    var = jnp.mean(jnp.abs(htilda) ** 2) - jnp.abs(havg) ** 2
    rsd = jnp.sqrt(jnp.maximum(var, 0.0) / jnp.abs(havg) ** 2)
    return havg, rsd


def force_vector(o_mat: jnp.ndarray, htilda: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """F_i = <Etilde O_i*> - <Etilde><O_i>*; returns (F, aO)."""
    k = o_mat.shape[0]
    havg = jnp.mean(htilda)
    a_o = jnp.mean(o_mat, axis=0)
    f = (htilda @ jnp.conj(o_mat)) / k - havg * jnp.conj(a_o)
    return f, a_o


def sr_cg_solve(
    o_mat: jnp.ndarray,
    htilda: jnp.ndarray,
    lam: jnp.ndarray,
    tol: float = 1e-5,
    max_iters: int = 1000,
) -> tuple[jnp.ndarray, CGResult]:
    """Matrix-free SR solve: never materializes S (O(KV), not O(V^2)).

    The S.a operator is two walker-axis GEMVs plus a rank-1 correction and
    the scaled-diagonal regularization (SMatrixForCG::dot,
    functor_for_CG.hpp:66-97).
    """
    k = o_mat.shape[0]
    f, a_o = force_vector(o_mat, htilda)
    diag = (jnp.mean(jnp.abs(o_mat) ** 2, axis=0) - jnp.abs(a_o) ** 2).astype(o_mat.real.dtype)
    lam = lam.astype(diag.dtype)

    def matvec(a):
        z = o_mat @ a  # (K,)
        b = (z @ jnp.conj(o_mat)) / k - jnp.conj(a_o) * (a_o @ a)
        return b + (lam * diag) * a

    def precond(r):
        return r / ((1.0 + lam) * diag)

    res = cg_solve(matvec, f, precond=precond, tol=tol, max_iters=max_iters)
    return res.x, res


def sr_dense_solve(
    o_mat: jnp.ndarray,
    htilda: jnp.ndarray,
    lam: jnp.ndarray,
    solver: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
) -> jnp.ndarray:
    """Dense SR: build S (V,V), scale diagonal by (1+lambda), solve.

    Replaces the LAPACK/MAGMA dense path (StochasticReconfiguration,
    optimizer.hpp:16-88; linear_solver.hpp BKF/SVD/cuLUF)."""
    k = o_mat.shape[0]
    f, a_o = force_vector(o_mat, htilda)
    s = jnp.conj(o_mat.T) @ o_mat / k - jnp.outer(jnp.conj(a_o), a_o)
    v = s.shape[0]
    s = s + jnp.diag(lam.astype(s.real.dtype) * jnp.real(jnp.diagonal(s))).astype(s.dtype)
    return solver(s, f)


def sgd_diag_solve(o_mat: jnp.ndarray, htilda: jnp.ndarray, lam: jnp.ndarray) -> jnp.ndarray:
    """Diagonal-S-only variant (StochasticGradientDescent,
    optimizer.hpp:92-156): dx_i = F_i / ((1+lambda) * S_ii)."""
    f, a_o = force_vector(o_mat, htilda)
    diag = jnp.mean(jnp.abs(o_mat) ** 2, axis=0) - jnp.abs(a_o) ** 2
    return f / ((1.0 + lam) * diag).astype(f.dtype)
