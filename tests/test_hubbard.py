"""Hubbard chain + Kawasaki exchange sampler tests vs exact diagonalization."""

import jax
import jax.numpy as jnp
import numpy as np

import neural_network_quantum_state_tpu as nqs
from neural_network_quantum_state_tpu.hamiltonians import HubbardChain
from neural_network_quantum_state_tpu.models import RBM
from neural_network_quantum_state_tpu.ops import cplx, engine
from neural_network_quantum_state_tpu.sampler import kawasaki, metropolis
from neural_network_quantum_state_tpu.utils.exact import (
    ground_energy,
    hubbard_chain_dense,
    sector_restrict,
    spins_to_index,
)

L = 3  # 6 JW spins


def test_local_energy_matches_dense_h():
    """Etilde(s) from the Hamiltonian = sum_s' H[s,s'] psi(s')/psi(s) for a
    random machine - validates every term incl. the JW edge string."""
    n = 2 * L
    machine = RBM(n_inputs=n, n_hiddens=8, dtype=jnp.float64)
    params = machine.init_params(jax.random.PRNGKey(0))
    work = machine.make_work(params)
    ham = HubbardChain(n_sites=n, u=4.0, t=1.0, n_up=1, n_down=1, pbc=True,
                       v=tuple(0.1 * i for i in range(n)))

    # all 2^n configurations
    idx = np.arange(2**n)
    bits = (idx[:, None] >> np.arange(n)[None, :]) & 1
    all_spins = jnp.asarray(1.0 - 2.0 * bits, jnp.float64)
    cache, lnpsi = engine.full_forward(work, all_spins)
    got = np.asarray(cplx.to_complex(ham.local_energy(work, cache, lnpsi)))

    psi = np.exp(np.asarray(cplx.to_complex(lnpsi)))
    h = hubbard_chain_dense(L, u=4.0, t=1.0, pbc=True, v=np.asarray(ham.v))
    want = (h @ psi) / psi
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-10)


def test_exchange_sampler_conserves_particles():
    n = 2 * L
    machine = RBM(n_inputs=n, n_hiddens=8, dtype=jnp.float64)
    params = machine.init_params(jax.random.PRNGKey(1))
    work = machine.make_work(params)
    ham = HubbardChain(n_sites=n, u=4.0, t=1.0, n_up=2, n_down=1, pbc=True)
    spins = ham.init_spins(jax.random.PRNGKey(2), 64, jnp.float64)
    state = metropolis.init_state(work, spins, jax.random.PRNGKey(3))
    state = kawasaki.exchange_sweeps(work, state, ham.bonds, 20, ham.n_unit_steps)
    s = np.asarray(state.cache.spins)
    n_up = ((1 + s[:, :L]) / 2).sum(axis=1)
    n_dn = ((1 + s[:, L:]) / 2).sum(axis=1)
    assert np.all(n_up == 2) and np.all(n_dn == 1)
    # lnpsi cache consistency after exchange sweeps
    _, lnpsi_ref = engine.full_forward(work, state.cache.spins)
    np.testing.assert_allclose(
        np.asarray(cplx.to_complex(state.lnpsi)), np.asarray(cplx.to_complex(lnpsi_ref)), rtol=1e-9
    )


def test_hubbard_vmc_converges_to_sector_ground_state():
    n = 2 * L
    machine = RBM(n_inputs=n, n_hiddens=16, dtype=jnp.float64)
    ham = HubbardChain(n_sites=n, u=4.0, t=1.0, n_up=1, n_down=1, pbc=True)
    cfg = nqs.VMCConfig(n_walkers=256, learning_rate=2e-2, solver="cg", seed=5)
    vmc = nqs.VMC(machine, ham, cfg)
    params, state = vmc.init()
    state = vmc.warm_up(params, state, 200)
    params, state, history, _ = vmc.run(params, state, 600)
    h = hubbard_chain_dense(L, u=4.0, t=1.0, pbc=True)
    h_sec, _ = sector_restrict(h, L, 1, 1)
    e_exact = ground_energy(h_sec)
    e = float(np.mean([x["energy"] for x in history[-30:]]))
    rel = abs(e - e_exact) / abs(e_exact)
    assert rel < 2e-2, (e, e_exact, rel)
