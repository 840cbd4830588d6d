"""MINRES solver tests: Hermitian PD and indefinite systems, SR wiring."""

import jax.numpy as jnp
import numpy as np

from neural_network_quantum_state_tpu.ops import cplx
from neural_network_quantum_state_tpu.optim.minres import minres_solve, sr_minres_solve
from neural_network_quantum_state_tpu.optim.sr import sr_cg_solve


def _solve_dense(a_np, b_np, tol=1e-11):
    a = cplx.from_complex(jnp.asarray(a_np))
    b = cplx.from_complex(jnp.asarray(b_np))
    res = minres_solve(lambda x: cplx.matmul_cc(a, x), b, tol=tol, max_iters=400)
    return np.asarray(cplx.to_complex(res.x)), res


def test_minres_hermitian_pd(rng):
    v = 24
    m = rng.normal(size=(v, v)) + 1j * rng.normal(size=(v, v))
    a_np = m @ np.conj(m.T) + 3.0 * np.eye(v)
    b_np = rng.normal(size=v) + 1j * rng.normal(size=v)
    x, res = _solve_dense(a_np, b_np)
    np.testing.assert_allclose(x, np.linalg.solve(a_np, b_np), rtol=1e-7, atol=1e-9)


def test_minres_hermitian_indefinite(rng):
    """The case plain CG cannot handle - MINRES-QLP's home turf."""
    v = 20
    m = rng.normal(size=(v, v)) + 1j * rng.normal(size=(v, v))
    herm = (m + np.conj(m.T)) / 2
    w, q = np.linalg.eigh(herm)
    w = np.where(np.abs(w) < 0.5, np.sign(w) * 0.5 + (w == 0), w)  # bounded away from 0
    a_np = (q * w) @ np.conj(q.T)
    assert (w < 0).any() and (w > 0).any()
    b_np = rng.normal(size=v) + 1j * rng.normal(size=v)
    x, res = _solve_dense(a_np, b_np)
    np.testing.assert_allclose(x, np.linalg.solve(a_np, b_np), rtol=1e-6, atol=1e-8)


def test_sr_minres_matches_cg(rng):
    k, v = 64, 12
    o = rng.normal(size=(k, v)) + 1j * rng.normal(size=(k, v))
    e = rng.normal(size=k) + 1j * 0.1 * rng.normal(size=k)
    o_c, e_c = cplx.from_complex(jnp.asarray(o)), cplx.from_complex(jnp.asarray(e))
    lam = jnp.asarray(0.05)
    dx_m, _ = sr_minres_solve(o_c, e_c, lam, tol=1e-12, max_iters=500)
    dx_c, _ = sr_cg_solve(o_c, e_c, lam, tol=1e-12, max_iters=500)
    np.testing.assert_allclose(
        np.asarray(cplx.to_complex(dx_m)), np.asarray(cplx.to_complex(dx_c)), rtol=1e-6, atol=1e-9
    )


def test_minres_zero_rhs():
    b = cplx.zeros(8, jnp.float64)
    res = minres_solve(lambda x: x, b)
    assert float(cplx.norm2(res.x)) == 0.0
