"""Preconditioned conjugate gradient over complex Hermitian operators.

Port of the reference's Eigen3-style PCG (cpu/include/conjugate_gradient.hpp:
14-101; gpu conjugate_gradient.cuh) to a jit-friendly ``lax.while_loop``:
matrix-free ``matvec``/``precond`` closures over complex (V,) vectors, exit
when ||r||^2 < max(tol^2 * ||rhs||^2, tiny) or after max_iters.

Under a sharded walker axis the matvec's contractions reduce over the mesh
with XLA collectives automatically; the CG state itself is a replicated
O(V) vector.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class CGResult(NamedTuple):
    x: jnp.ndarray
    iterations: jnp.ndarray  # () int32
    residual_norm2: jnp.ndarray  # () real: final ||r||^2


def _re_inner(z1: jnp.ndarray, z2: jnp.ndarray) -> jnp.ndarray:
    """Re <z1, z2> = Re sum z1 * conj(z2) (hermition_inner_product_, :92-99)."""
    return jnp.real(jnp.vdot(z2, z1))


def cg_solve(
    matvec: Callable[[jnp.ndarray], jnp.ndarray],
    rhs: jnp.ndarray,
    precond: Callable[[jnp.ndarray], jnp.ndarray] | None = None,
    x0: jnp.ndarray | None = None,
    tol: float = 1e-5,
    max_iters: int = 1000,
) -> CGResult:
    if precond is None:
        precond = lambda r: r
    x = jnp.zeros_like(rhs) if x0 is None else x0

    rdtype = rhs.real.dtype
    rhs_norm2 = jnp.real(jnp.vdot(rhs, rhs))
    tiny = jnp.asarray(jnp.finfo(rdtype).tiny, rdtype)
    threshold = jnp.maximum(tol * tol * rhs_norm2, tiny)

    r = rhs - matvec(x)
    p = precond(r)
    abs_new = _re_inner(p, r)
    res_norm2 = jnp.real(jnp.vdot(r, r))

    def cond(state):
        _, r, _, _, res_norm2, it = state
        return (it < max_iters) & (res_norm2 >= threshold)

    def body(state):
        x, r, p, abs_new, _, it = state
        ap = matvec(p)
        alpha = abs_new / _re_inner(ap, p)
        x = x + alpha.astype(x.dtype) * p
        r = r - alpha.astype(r.dtype) * ap
        res_norm2 = jnp.real(jnp.vdot(r, r))
        z = precond(r)
        abs_old = abs_new
        abs_new = _re_inner(z, r)
        beta = abs_new / abs_old
        p = z + beta.astype(p.dtype) * p
        return (x, r, p, abs_new, res_norm2, it + 1)

    state = (x, r, p, abs_new, res_norm2, jnp.zeros((), jnp.int32))
    x, r, p, abs_new, res_norm2, it = jax.lax.while_loop(cond, body, state)
    # rhs == 0 -> x = 0 exactly (reference :41-46)
    x = jnp.where(rhs_norm2 == 0, jnp.zeros_like(x), x)
    return CGResult(x=x, iterations=it, residual_norm2=res_norm2)
