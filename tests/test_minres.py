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


def _solve_qlp(a_np, b_np, tol=1e-12, max_iters=400):
    from neural_network_quantum_state_tpu.optim.minres import minres_qlp_solve

    a = cplx.from_complex(jnp.asarray(a_np))
    b = cplx.from_complex(jnp.asarray(b_np))
    res = minres_qlp_solve(lambda x: cplx.matmul_cc(a, x), b, tol=tol, max_iters=max_iters)
    return np.asarray(cplx.to_complex(res.x)), res


def test_minres_qlp_nonsingular_matches_minres(rng):
    v = 20
    m = rng.normal(size=(v, v)) + 1j * rng.normal(size=(v, v))
    herm = (m + np.conj(m.T)) / 2 + 0.0
    w, q = np.linalg.eigh(herm)
    w = np.where(np.abs(w) < 0.5, np.sign(w + (w == 0)) * 0.5, w)
    a_np = (q * w) @ np.conj(q.T)
    b_np = rng.normal(size=v) + 1j * rng.normal(size=v)
    x, res = _solve_qlp(a_np, b_np)
    np.testing.assert_allclose(x, np.linalg.solve(a_np, b_np), rtol=1e-6, atol=1e-8)


def test_minres_qlp_singular_consistent_min_norm(rng):
    """rank-deficient A, b in range(A): x -> pinv(A) b (plain MINRES gives a
    solution but not necessarily the min-length one)."""
    v, r = 18, 11
    m = rng.normal(size=(v, r)) + 1j * rng.normal(size=(v, r))
    a_np = m @ np.conj(m.T)  # Hermitian PSD, rank r
    b_np = a_np @ (rng.normal(size=v) + 1j * rng.normal(size=v))  # in range
    x, res = _solve_qlp(a_np, b_np)
    expect = np.linalg.pinv(a_np) @ b_np
    np.testing.assert_allclose(x, expect, rtol=1e-5, atol=1e-7)


def test_minres_qlp_singular_inconsistent_least_squares(rng):
    """b with a component outside range(A): minimum-length least-squares
    solution, the QLP paper's defining case."""
    v, r = 16, 9
    m = rng.normal(size=(v, r)) + 1j * rng.normal(size=(v, r))
    a_np = m @ np.conj(m.T)
    b_np = rng.normal(size=v) + 1j * rng.normal(size=v)  # generic: not in range
    x, res = _solve_qlp(a_np, b_np, max_iters=2 * v)
    expect = np.linalg.pinv(a_np) @ b_np
    np.testing.assert_allclose(x, expect, rtol=1e-4, atol=1e-6)
    # residual equals the projection of b onto the orthogonal complement
    resid = np.linalg.norm(a_np @ x - b_np)
    expect_resid = np.linalg.norm(a_np @ expect - b_np)
    np.testing.assert_allclose(resid, expect_resid, rtol=1e-6)


def test_minres_qlp_zero_rhs():
    from neural_network_quantum_state_tpu.optim.minres import minres_qlp_solve

    b = cplx.zeros(8, jnp.float64)
    res = minres_qlp_solve(lambda x: x, b)
    assert float(cplx.norm2(res.x)) == 0.0


def test_minres_qlp_eigenvector_rhs(rng):
    """b an exact eigenvector: one-iteration termination path."""
    v = 12
    m = rng.normal(size=(v, v)) + 1j * rng.normal(size=(v, v))
    herm = (m + np.conj(m.T)) / 2 + 5.0 * np.eye(v)
    w, q = np.linalg.eigh(herm)
    b_np = q[:, 3]
    x, res = _solve_qlp(herm, b_np)
    np.testing.assert_allclose(x, b_np / w[3], rtol=1e-8, atol=1e-10)
