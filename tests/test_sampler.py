"""Metropolis sampler statistical tests: the chain reproduces |psi|^2 on a
tiny system (chi^2 over the 2^N histogram - SURVEY.md 4 item 3)."""

import jax
import jax.numpy as jnp
import numpy as np

from neural_network_quantum_state_tpu.models import RBM
from neural_network_quantum_state_tpu.ops import cplx, engine
from neural_network_quantum_state_tpu.sampler import metropolis
from neural_network_quantum_state_tpu.sampler.schedule import chain_checkerboard
from neural_network_quantum_state_tpu.utils.exact import spins_to_index


def test_sampler_reproduces_psi_squared():
    n, k = 4, 512
    machine = RBM(n_inputs=n, n_hiddens=8, dtype=jnp.float64)
    params = machine.init_params(jax.random.PRNGKey(3))
    work = machine.make_work(params)

    # exact |psi|^2 over all 2^n basis states
    idx = np.arange(2**n)
    bits = (idx[:, None] >> np.arange(n)[None, :]) & 1
    all_spins = jnp.asarray(1.0 - 2.0 * bits, jnp.float64)
    lnpsi_all = np.asarray(cplx.to_complex(engine.log_psi(work, all_spins)))
    p_exact = np.exp(2 * lnpsi_all.real)
    p_exact /= p_exact.sum()

    # independent random chain inits + long warm-up + widely spaced reads
    # -> near-independent samples, so per-bin sqrt(p/n) bounds apply
    from neural_network_quantum_state_tpu.ops.rng import random_spins

    k = 4096
    spins0 = random_spins(jax.random.PRNGKey(21), k, n, jnp.float64)
    state = metropolis.init_state(work, spins0, jax.random.PRNGKey(11))
    schedule = jnp.asarray(chain_checkerboard(n))
    state = metropolis.sweeps(work, state, schedule, 100)  # warm up

    counts = np.zeros(2**n)
    n_samples = 0
    for _ in range(4):
        state = metropolis.sweeps(work, state, schedule, 20)
        b = spins_to_index(np.asarray(state.cache.spins))
        counts += np.bincount(b, minlength=2**n)
        n_samples += k
    p_emp = counts / n_samples

    err = np.abs(p_emp - p_exact)
    tol = 5.0 * np.sqrt(p_exact / n_samples) + 2e-3
    assert np.all(err < tol), (p_emp, p_exact, err, tol)


def test_acceptance_ratio_read_reset():
    n, k = 6, 64
    machine = RBM(n_inputs=n, n_hiddens=6, dtype=jnp.float64)
    params = machine.init_params(jax.random.PRNGKey(0))
    work = machine.make_work(params)
    state = metropolis.init_state(work, jnp.ones((k, n), jnp.float64), jax.random.PRNGKey(1))
    schedule = jnp.asarray(chain_checkerboard(n))
    state = metropolis.sweeps(work, state, schedule, 10)
    ratio, state = metropolis.acceptance_ratio(state)
    assert 0.0 < float(ratio) <= 1.0
    assert float(state.n_proposed) == 0.0
    ratio2, _ = metropolis.acceptance_ratio(state)
    assert float(ratio2) == 0.0  # reset


def test_lnpsi_consistent_after_sweeps():
    """The carried lnpsi must equal a from-scratch forward after any number
    of sweeps (cache-vs-recompute discipline, SURVEY.md 7 hard parts)."""
    n, k = 6, 32
    machine = RBM(n_inputs=n, n_hiddens=10, dtype=jnp.float64)
    params = machine.init_params(jax.random.PRNGKey(5))
    work = machine.make_work(params)
    state = metropolis.init_state(work, jnp.ones((k, n), jnp.float64), jax.random.PRNGKey(6))
    schedule = jnp.asarray(chain_checkerboard(n))
    state = metropolis.sweeps(work, state, schedule, 25)
    _, lnpsi_ref = engine.full_forward(work, state.cache.spins)
    np.testing.assert_allclose(
        np.asarray(cplx.to_complex(state.lnpsi)),
        np.asarray(cplx.to_complex(lnpsi_ref)),
        rtol=1e-9,
        atol=1e-9,
    )
