"""Preconditioned conjugate gradient over split-complex Hermitian operators.

Port of the reference's Eigen3-style PCG (cpu/include/conjugate_gradient.hpp:
14-101; gpu conjugate_gradient.cuh) to a jit-friendly ``lax.while_loop``:
matrix-free ``matvec``/``precond`` closures over split-complex ``C`` (V,)
vectors, exit when ||r||^2 < max(tol^2 * ||rhs||^2, tiny) or after
max_iters.

Under a sharded walker axis the matvec's contractions reduce over the mesh
with XLA collectives automatically; the CG state itself is a replicated
O(V) vector.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from neural_network_quantum_state_tpu.ops import cplx
from neural_network_quantum_state_tpu.ops.cplx import C


class CGResult(NamedTuple):
    x: C
    iterations: jnp.ndarray  # () int32
    residual_norm2: jnp.ndarray  # () real: final ||r||^2


def cg_solve(
    matvec: Callable[[C], C],
    rhs: C,
    precond: Callable[[C], C] | None = None,
    x0: C | None = None,
    tol: float = 1e-5,
    max_iters: int = 1000,
) -> CGResult:
    if precond is None:
        precond = lambda r: r
    x = cplx.zeros_like(rhs) if x0 is None else x0

    rdtype = rhs.re.dtype
    rhs_norm2 = cplx.norm2(rhs)
    tiny = jnp.asarray(jnp.finfo(rdtype).tiny, rdtype)
    threshold = jnp.maximum(tol * tol * rhs_norm2, tiny)

    r = rhs - matvec(x)
    p = precond(r)
    # Re <p, r> (hermition_inner_product_, conjugate_gradient.hpp:92-99)
    abs_new = cplx.vdot_re(p, r)
    res_norm2 = cplx.norm2(r)

    def cond(state):
        _, r, _, _, res_norm2, it = state
        return (it < max_iters) & (res_norm2 >= threshold)

    def body(state):
        x, r, p, abs_new, _, it = state
        ap = matvec(p)
        alpha = abs_new / cplx.vdot_re(ap, p)
        x = x + p * alpha
        r = r - ap * alpha
        res_norm2 = cplx.norm2(r)
        z = precond(r)
        abs_old = abs_new
        abs_new = cplx.vdot_re(z, r)
        beta = abs_new / abs_old
        p = z + p * beta
        return (x, r, p, abs_new, res_norm2, it + 1)

    state = (x, r, p, abs_new, res_norm2, jnp.zeros((), jnp.int32))
    x, r, p, abs_new, res_norm2, it = jax.lax.while_loop(cond, body, state)
    # rhs == 0 -> x = 0 exactly (reference :41-46)
    x = cplx.where(rhs_norm2 == 0, cplx.zeros_like(x), x)
    return CGResult(x=x, iterations=it, residual_norm2=res_norm2)
