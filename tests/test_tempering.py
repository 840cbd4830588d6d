"""Parallel-tempering sampler tests: beta=1 slice reproduces |psi|^2,
cache consistency through swap moves, PT-VMC convergence."""

import jax
import jax.numpy as jnp
import numpy as np

import neural_network_quantum_state_tpu as nqs
from neural_network_quantum_state_tpu.hamiltonians import TFIChain
from neural_network_quantum_state_tpu.models import RBM
from neural_network_quantum_state_tpu.ops import cplx, engine
from neural_network_quantum_state_tpu.sampler import metropolis, tempering
from neural_network_quantum_state_tpu.sampler.schedule import chain_checkerboard
from neural_network_quantum_state_tpu.utils.exact import ground_energy, spins_to_index, tfi_chain_dense


def test_cache_consistent_through_swaps():
    n, n_beta, kb = 6, 4, 16
    machine = RBM(n_inputs=n, n_hiddens=10, dtype=jnp.float64)
    params = machine.init_params(jax.random.PRNGKey(0))
    work = machine.make_work(params)
    state = metropolis.init_state(work, jnp.ones((n_beta * kb, n), jnp.float64), jax.random.PRNGKey(1))
    schedule = jnp.asarray(chain_checkerboard(n))
    state = tempering.tempering_sweeps(work, state, schedule, 15, n_beta)
    _, lnpsi_ref = engine.full_forward(work, state.cache.spins)
    np.testing.assert_allclose(
        np.asarray(cplx.to_complex(state.lnpsi)), np.asarray(cplx.to_complex(lnpsi_ref)), rtol=1e-9
    )


def test_beta1_slice_reproduces_psi_squared():
    n, n_beta, kb = 4, 4, 1024
    machine = RBM(n_inputs=n, n_hiddens=8, dtype=jnp.float64)
    params = machine.init_params(jax.random.PRNGKey(3))
    work = machine.make_work(params)

    idx = np.arange(2**n)
    bits = (idx[:, None] >> np.arange(n)[None, :]) & 1
    all_spins = jnp.asarray(1.0 - 2.0 * bits, jnp.float64)
    lnpsi_all = np.asarray(cplx.to_complex(engine.log_psi(work, all_spins)))
    p_exact = np.exp(2 * lnpsi_all.real)
    p_exact /= p_exact.sum()

    from neural_network_quantum_state_tpu.ops.rng import random_spins

    k_tot = n_beta * kb
    spins0 = random_spins(jax.random.PRNGKey(11), k_tot, n, jnp.float64)
    state = metropolis.init_state(work, spins0, jax.random.PRNGKey(13))
    schedule = jnp.asarray(chain_checkerboard(n))
    state = tempering.tempering_sweeps(work, state, schedule, 100, n_beta)

    counts = np.zeros(2**n)
    n_samples = 0
    for _ in range(4):
        state = tempering.tempering_sweeps(work, state, schedule, 20, n_beta)
        b1 = np.asarray(state.cache.spins)[::n_beta]  # beta = 1 replicas
        counts += np.bincount(spins_to_index(b1), minlength=2**n)
        n_samples += kb
    p_emp = counts / n_samples
    err = np.abs(p_emp - p_exact)
    tol = 5.0 * np.sqrt(p_exact / n_samples) + 4e-3
    assert np.all(err < tol), (p_emp, p_exact, err, tol)


def test_pt_vmc_converges():
    n = 8
    machine = RBM(n_inputs=n, n_hiddens=16, dtype=jnp.float64)
    ham = TFIChain(n_sites=n, h=-1.0, j=-1.0)
    cfg = nqs.VMCConfig(n_walkers=512, learning_rate=1e-2, solver="cg", n_beta=4, seed=17)
    vmc = nqs.VMC(machine, ham, cfg)
    params, state = vmc.init()
    state = vmc.warm_up(params, state, 150)
    params, state, history, _ = vmc.run(params, state, 400)
    e_exact = ground_energy(tfi_chain_dense(n, h=-1.0, j=-1.0))
    e = float(np.mean([x["energy"] for x in history[-20:]]))
    rel = abs(e - e_exact) / abs(e_exact)
    assert rel < 5e-3, (e, e_exact, rel)
