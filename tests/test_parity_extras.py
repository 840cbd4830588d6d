"""Parity extras: dense-SR accumulation, RBM partial updates, Hubbard
total-N mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import neural_network_quantum_state_tpu as nqs
from neural_network_quantum_state_tpu.hamiltonians import HubbardChain, TFIChain
from neural_network_quantum_state_tpu.models import RBM
from neural_network_quantum_state_tpu.ops import cplx, engine
from neural_network_quantum_state_tpu.ops.rng import random_spins
from neural_network_quantum_state_tpu.optim import solvers
from neural_network_quantum_state_tpu.optim.sr import sr_dense_solve, sr_dense_solve_accumulated
from neural_network_quantum_state_tpu.sampler import kawasaki, metropolis
from neural_network_quantum_state_tpu.utils.exact import ground_energy, tfi_chain_dense


def _rand_oe(rng, k=32, v=10):
    o = rng.normal(size=(k, v)) + 1j * rng.normal(size=(k, v))
    e = rng.normal(size=k) + 1j * 0.1 * rng.normal(size=k)
    return cplx.from_complex(jnp.asarray(o)), cplx.from_complex(jnp.asarray(e))


def test_accumulated_equals_pooled(rng):
    """Accumulating R rounds == one dense solve over the pooled walker set
    (same math, reference optimizer.hpp:37-57)."""
    rounds = [_rand_oe(rng) for _ in range(3)]
    lam = jnp.asarray(0.07)
    dx_acc = sr_dense_solve_accumulated(rounds, lam, solvers.lu_solve)
    pooled_o = cplx.concat([o for o, _ in rounds], axis=0)
    pooled_e = cplx.concat([e for _, e in rounds], axis=0)
    dx_pool = sr_dense_solve(pooled_o, pooled_e, lam, solvers.lu_solve)
    np.testing.assert_allclose(
        np.asarray(cplx.to_complex(dx_acc)), np.asarray(cplx.to_complex(dx_pool)), rtol=1e-8
    )


def test_vmc_accumulated_dense_converges():
    n = 6
    machine = RBM(n_inputs=n, n_hiddens=10, dtype=jnp.float64)
    ham = TFIChain(n_sites=n, h=-1.0, j=-1.0)
    cfg = nqs.VMCConfig(n_walkers=128, learning_rate=1e-2, solver="cholesky",
                        n_accumulations=3, seed=6)
    vmc = nqs.VMC(machine, ham, cfg)
    params, state = vmc.init()
    state = vmc.warm_up(params, state, 100)
    params, state, hist, _ = vmc.run(params, state, 250)
    e_exact = ground_energy(tfi_chain_dense(n, h=-1.0, j=-1.0))
    e = float(np.mean([x["energy"] for x in hist[-20:]]))
    assert abs(e - e_exact) / abs(e_exact) < 1e-2, (e, e_exact)


def test_vmc_accumulated_dense_with_tempering_converges():
    """Accumulated dense SR composes with parallel tempering: each
    accumulation round reads only its beta=1 replicas (replica-minor
    stride), so the pooled S/F estimate stays an unbiased |psi|^2 average
    while the hot replicas keep the chains ergodic (closes the
    round-3 vmc.py NotImplementedError)."""
    n = 6
    machine = RBM(n_inputs=n, n_hiddens=10, dtype=jnp.float64)
    ham = TFIChain(n_sites=n, h=-1.0, j=-1.0)
    cfg = nqs.VMCConfig(n_walkers=256, learning_rate=1e-2, solver="cholesky",
                        n_accumulations=3, n_beta=4, seed=6)
    vmc = nqs.VMC(machine, ham, cfg)
    params, state = vmc.init()
    state = vmc.warm_up(params, state, 100)
    params, state, hist, _ = vmc.run(params, state, 250)
    e_exact = ground_energy(tfi_chain_dense(n, h=-1.0, j=-1.0))
    e = float(np.mean([x["energy"] for x in hist[-20:]]))
    assert abs(e - e_exact) / abs(e_exact) < 1e-2, (e, e_exact)


def test_accumulation_requires_dense_solver():
    machine = RBM(n_inputs=4, n_hiddens=4, dtype=jnp.float64)
    ham = TFIChain(n_sites=4, h=-1.0, j=-1.0)
    with pytest.raises(ValueError):
        nqs.VMC(machine, ham, nqs.VMCConfig(n_walkers=16, solver="cg", n_accumulations=2))


def test_rbm_partial_grad_and_update():
    n, m, k = 6, 8, 5
    machine = RBM(n_inputs=n, n_hiddens=m, dtype=jnp.float64)
    params = machine.init_params(jax.random.PRNGKey(0))
    work = machine.make_work(params)
    spins = random_spins(jax.random.PRNGKey(1), k, n, jnp.float64)
    cache, _ = engine.full_forward(work, spins)

    nodes = [2, 5]
    o_part = np.asarray(cplx.to_complex(machine.grad_log_partial(params, cache, nodes)))
    o_full = np.asarray(cplx.to_complex(machine.grad_log(params, cache)))
    for ki in range(k):
        want = list(o_full[ki][n * m : n * m + n])  # a (all)
        want += [o_full[ki][n * m + n + j] for j in nodes]  # b subset
        for i in range(n):  # w rows, subset columns
            want += [o_full[ki][i * m + j] for j in nodes]
        np.testing.assert_allclose(o_part[ki], np.asarray(want), rtol=1e-12)

    nj = len(nodes)
    dx = cplx.from_complex(jnp.arange(1, n + nj + n * nj + 1, dtype=jnp.float64) + 0j)
    new = machine.update_params_partial(params, dx, 0.1, nodes)
    others = np.asarray([j for j in range(m) if j not in nodes])
    np.testing.assert_array_equal(np.asarray(new["w"].re)[:, others], np.asarray(params["w"].re)[:, others])
    np.testing.assert_allclose(
        np.asarray(new["a"].re), np.asarray(params["a"].re) - 0.1 * np.arange(1, n + 1), rtol=1e-12
    )


def test_hubbard_total_particle_mode():
    l = 3
    ham = HubbardChain(n_sites=2 * l, u=4.0, t=1.0, n_particles=3,
                       per_flavor_rings=False, pbc=True)
    machine = RBM(n_inputs=2 * l, n_hiddens=6, dtype=jnp.float64)
    params = machine.init_params(jax.random.PRNGKey(2))
    work = machine.make_work(params)
    spins = ham.init_spins(jax.random.PRNGKey(3), 64, jnp.float64)
    total0 = ((1 + np.asarray(spins)) / 2).sum(axis=1)
    assert np.all(total0 == 3)
    state = metropolis.init_state(work, spins, jax.random.PRNGKey(4))
    state = kawasaki.exchange_sweeps(work, state, ham.bonds, 10, ham.n_unit_steps)
    total = ((1 + np.asarray(state.cache.spins)) / 2).sum(axis=1)
    assert np.all(total == 3)  # total conserved (per-flavor not, by design)
