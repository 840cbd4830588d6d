"""SR math tests: CG vs dense solve, solver agreement, schedule values
(SURVEY.md 4 item 2: SR direction vs explicitly built S^-1 F)."""

import jax.numpy as jnp
import numpy as np

from neural_network_quantum_state_tpu.ops import cplx
from neural_network_quantum_state_tpu.optim import solvers
from neural_network_quantum_state_tpu.optim.cg import cg_solve
from neural_network_quantum_state_tpu.optim.sr import (
    build_s_matrix,
    energy_and_rsd,
    force_vector,
    lambda_schedule,
    sgd_diag_solve,
    sr_cg_solve,
    sr_dense_solve,
)


def _rand_oe(rng, k=64, v=12):
    o = rng.normal(size=(k, v)) + 1j * rng.normal(size=(k, v))
    e = rng.normal(size=k) + 1j * 0.1 * rng.normal(size=k)
    return cplx.from_complex(jnp.asarray(o)), cplx.from_complex(jnp.asarray(e)), o, e


def test_force_vector_matches_numpy(rng):
    o_c, e_c, o, e = _rand_oe(rng)
    f, a_o = force_vector(o_c, e_c)
    k = o.shape[0]
    a_np = o.mean(0)
    f_np = (e @ np.conj(o)) / k - e.mean() * np.conj(a_np)
    np.testing.assert_allclose(np.asarray(cplx.to_complex(f)), f_np, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(cplx.to_complex(a_o)), a_np, rtol=1e-10)


def test_s_matrix_and_matvec(rng):
    o_c, e_c, o, e = _rand_oe(rng)
    k = o.shape[0]
    a_np = o.mean(0)
    s_np = np.conj(o.T) @ o / k - np.outer(np.conj(a_np), a_np)
    _, a_o = force_vector(o_c, e_c)
    s = build_s_matrix(o_c, a_o)
    np.testing.assert_allclose(np.asarray(cplx.to_complex(s)), s_np, rtol=1e-9, atol=1e-12)
    # Hermitian
    np.testing.assert_allclose(s_np, np.conj(s_np.T), rtol=1e-10)


def test_cg_matches_dense_solution(rng):
    o_c, e_c, o, e = _rand_oe(rng)
    lam = jnp.asarray(0.05)
    dx_cg, res = sr_cg_solve(o_c, e_c, lam, tol=1e-12, max_iters=500)
    # dense reference with the *same* regularization: S + lam*diag(S)
    k = o.shape[0]
    a_np = o.mean(0)
    s_np = np.conj(o.T) @ o / k - np.outer(np.conj(a_np), a_np)
    s_reg = s_np + 0.05 * np.diag(np.real(np.diag(s_np)))
    f_np = (e @ np.conj(o)) / k - e.mean() * np.conj(a_np)
    want = np.linalg.solve(s_reg, f_np)
    np.testing.assert_allclose(np.asarray(cplx.to_complex(dx_cg)), want, rtol=1e-6, atol=1e-9)


def test_dense_solvers_agree(rng):
    o_c, e_c, o, e = _rand_oe(rng)
    lam = jnp.asarray(0.1)
    for name in ["lu", "cholesky", "svd"]:
        dx = sr_dense_solve(o_c, e_c, lam, solvers.SOLVERS[name])
        dx_cg, _ = sr_cg_solve(o_c, e_c, lam, tol=1e-12, max_iters=500)
        np.testing.assert_allclose(
            np.asarray(cplx.to_complex(dx)),
            np.asarray(cplx.to_complex(dx_cg)),
            rtol=1e-5,
            atol=1e-8,
            err_msg=name,
        )


def test_sgd_diag(rng):
    o_c, e_c, o, e = _rand_oe(rng)
    lam = jnp.asarray(0.1)
    dx = sgd_diag_solve(o_c, e_c, lam)
    k = o.shape[0]
    a_np = o.mean(0)
    diag = (np.abs(o) ** 2).mean(0) - np.abs(a_np) ** 2
    f_np = (e @ np.conj(o)) / k - e.mean() * np.conj(a_np)
    want = f_np / (1.1 * diag)
    np.testing.assert_allclose(np.asarray(cplx.to_complex(dx)), want, rtol=1e-8)


def test_lambda_schedule():
    # lambda(0) = 100*0.9 = 90; decays by 0.9; floored at 1e-2
    assert abs(float(lambda_schedule(0, jnp.float64)) - 90.0) < 1e-9
    assert abs(float(lambda_schedule(1, jnp.float64)) - 81.0) < 1e-9
    assert float(lambda_schedule(1000, jnp.float64)) == 1e-2


def test_energy_and_rsd(rng):
    e = rng.normal(size=256) + 1j * rng.normal(size=256) * 0.01
    havg, rsd = energy_and_rsd(cplx.from_complex(jnp.asarray(e)))
    np.testing.assert_allclose(complex(havg.re + 1j * havg.im), e.mean(), rtol=1e-10)
    var = (np.abs(e) ** 2).mean() - abs(e.mean()) ** 2
    np.testing.assert_allclose(float(rsd), np.sqrt(var / abs(e.mean()) ** 2), rtol=1e-10)


def test_cg_generic_hermitian(rng):
    """PCG solves a random HPD system to tolerance."""
    v = 20
    a = rng.normal(size=(v, v)) + 1j * rng.normal(size=(v, v))
    s_np = a @ np.conj(a.T) + 5.0 * np.eye(v)
    rhs_np = rng.normal(size=v) + 1j * rng.normal(size=v)
    s = cplx.from_complex(jnp.asarray(s_np))
    rhs = cplx.from_complex(jnp.asarray(rhs_np))

    def matvec(x):
        return cplx.matmul_cc(s, x)

    res = cg_solve(matvec, rhs, tol=1e-12, max_iters=500)
    want = np.linalg.solve(s_np, rhs_np)
    np.testing.assert_allclose(np.asarray(cplx.to_complex(res.x)), want, rtol=1e-8, atol=1e-10)


def test_cg_custom_precond_diag_same_solution(rng):
    """A precond_diag override changes only the preconditioner, never the
    solution: same dx as the default to solver tolerance."""
    o_c, e_c, o, e = _rand_oe(rng)
    lam = jnp.asarray(0.05)
    dx_ref, _ = sr_cg_solve(o_c, e_c, lam, tol=1e-12, max_iters=500)
    smooth = jnp.ones((o.shape[1],), jnp.float64) * 0.7  # arbitrary positive
    dx_p, res = sr_cg_solve(o_c, e_c, lam, tol=1e-12, max_iters=500, precond_diag=smooth)
    np.testing.assert_allclose(
        np.asarray(cplx.to_complex(dx_p)), np.asarray(cplx.to_complex(dx_ref)),
        rtol=1e-6, atol=1e-9,
    )


def test_vmc_precond_ema_converges():
    """End-to-end: precond_ema=0.9 trains the N=8 TFI chain to the exact
    energy like plain CG (the EMA is a preconditioner, not a solver change)."""
    import jax

    import neural_network_quantum_state_tpu as nqs
    from neural_network_quantum_state_tpu.hamiltonians import TFIChain
    from neural_network_quantum_state_tpu.models import RBM
    from neural_network_quantum_state_tpu.utils.exact import ground_energy, tfi_chain_dense

    n = 8
    machine = RBM(n_inputs=n, n_hiddens=16, dtype=jnp.float64)
    ham = TFIChain(n_sites=n, h=-1.0, j=-1.0)
    cfg = nqs.VMCConfig(n_walkers=256, learning_rate=2e-2, precond_ema=0.9,
                        steps_per_host_loop=25, seed=3)
    vmc = nqs.VMC(machine, ham, cfg)
    params, state = vmc.init()
    state = vmc.warm_up(params, state, 200)
    params, state, history, _ = vmc.run(params, state, 400)
    e = float(np.mean([h["energy"] for h in history[-20:]]))
    e_exact = ground_energy(tfi_chain_dense(n, h=-1.0, j=-1.0))
    assert abs(e - e_exact) / abs(e_exact) < 2e-3, (e, e_exact)
