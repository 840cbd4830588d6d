"""Block-flip proposal move: detailed balance, cache consistency, and the
de-collapse behavior it exists for (sampler/metropolis.block_flip_moves)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_network_quantum_state_tpu.models import RBM
from neural_network_quantum_state_tpu.ops import cplx, engine
from neural_network_quantum_state_tpu.sampler import metropolis
from neural_network_quantum_state_tpu.sampler.schedule import chain_checkerboard
from neural_network_quantum_state_tpu.utils.exact import spins_to_index


def _setup(n=4, k=4096, seed=3):
    machine = RBM(n_inputs=n, n_hiddens=8, dtype=jnp.float64)
    params = machine.init_params(jax.random.PRNGKey(seed))
    work = machine.make_work(params)
    from neural_network_quantum_state_tpu.ops.rng import random_spins

    spins0 = random_spins(jax.random.PRNGKey(21), k, n, jnp.float64)
    state = metropolis.init_state(work, spins0, jax.random.PRNGKey(11))
    return machine, work, state


def test_blockflip_preserves_psi_squared():
    """Sweeps + block moves still reproduce |psi|^2 on the 2^N histogram:
    the added proposal family is symmetric, so the combined chain has the
    same stationary distribution."""
    n, k = 4, 4096
    machine, work, state = _setup(n, k)

    idx = np.arange(2**n)
    bits = (idx[:, None] >> np.arange(n)[None, :]) & 1
    all_spins = jnp.asarray(1.0 - 2.0 * bits, jnp.float64)
    lnpsi_all = np.asarray(cplx.to_complex(engine.log_psi(work, all_spins)))
    p_exact = np.exp(2 * lnpsi_all.real)
    p_exact /= p_exact.sum()

    schedule = jnp.asarray(chain_checkerboard(n))
    state = metropolis.sweeps(work, state, schedule, 50)
    state = metropolis.block_flip_moves(work, state, n_moves=50)

    counts = np.zeros(2**n)
    n_samples = 0
    for _ in range(4):
        state = metropolis.sweeps(work, state, schedule, 10)
        state = metropolis.block_flip_moves(work, state, n_moves=10)
        b = spins_to_index(np.asarray(state.cache.spins))
        counts += np.bincount(b, minlength=2**n)
        n_samples += k
    p_emp = counts / n_samples
    err = np.abs(p_emp - p_exact)
    tol = 5.0 * np.sqrt(p_exact / n_samples) + 2e-3
    assert np.all(err < tol), (p_emp, p_exact, err, tol)


def test_blockflip_cache_consistent():
    """After block moves, the incremental cache equals a from-scratch
    forward of the committed spins (the accept/select kept them in sync)."""
    _, work, state = _setup(n=6, k=128)
    state = metropolis.block_flip_moves(work, state, n_moves=7)
    cache2, lnpsi2 = engine.full_forward(work, state.cache.spins)
    np.testing.assert_allclose(np.asarray(state.lnpsi.re), np.asarray(lnpsi2.re), atol=1e-12)
    np.testing.assert_allclose(np.asarray(state.cache.y.re), np.asarray(cache2.y.re), atol=1e-12)
    np.testing.assert_allclose(np.asarray(state.cache.y.im), np.asarray(cache2.y.im), atol=1e-12)


def test_blockflip_tempered_beta_zero_always_accepts():
    """beta=0 replicas sample the uniform distribution - every block
    proposal must be accepted (acceptance probability exp(0) = 1), so the
    spins decorrelate from the start state in one move."""
    _, work, state = _setup(n=8, k=64)
    before = np.asarray(state.cache.spins).copy()
    beta = jnp.zeros((64,), jnp.float64)
    state = metropolis.block_flip_moves(work, state, n_moves=1, beta=beta)
    after = np.asarray(state.cache.spins)
    # every walker flipped a non-empty block
    assert (np.abs(after - before).sum(axis=1) > 0).all()


def test_blockflip_vmc_trains_and_dogfoods():
    """End-to-end: VMCConfig(block_moves_per_sweep=1) trains the tiny TFI
    chain to the exact ground state - the extra move family does not bias
    the SR estimators."""
    import neural_network_quantum_state_tpu as nqs
    from neural_network_quantum_state_tpu.hamiltonians import TFIChain
    from neural_network_quantum_state_tpu.utils.exact import (
        ground_energy,
        tfi_chain_dense,
    )

    n = 8
    machine = RBM(n_inputs=n, n_hiddens=2 * n, dtype=jnp.float64)
    ham = TFIChain(n_sites=n, h=-1.0, j=-1.0)
    cfg = nqs.VMCConfig(n_walkers=256, learning_rate=1e-2, seed=5, block_moves_per_sweep=1)
    vmc = nqs.VMC(machine, ham, cfg)
    params, state = vmc.init()
    state = vmc.warm_up(params, state, 100)
    params, state, history, _ = vmc.run(params, state, 500)
    e = sum(h["energy"] for h in history[-20:]) / 20
    e_exact = ground_energy(tfi_chain_dense(n, h=-1.0, j=-1.0))
    assert abs(e - e_exact) / abs(e_exact) < 5e-3


def test_blockflip_exchange_sampler_rejected():
    """Particle-conserving exchange sampling must refuse block flips."""
    import neural_network_quantum_state_tpu as nqs
    from neural_network_quantum_state_tpu.hamiltonians import HubbardChain

    ham = HubbardChain(n_sites=8, u=4.0, t=1.0, n_up=1, n_down=1)
    machine = RBM(n_inputs=8, n_hiddens=8, dtype=jnp.float64)
    with pytest.raises(ValueError, match="particle conservation"):
        nqs.VMC(machine, ham, nqs.VMCConfig(n_walkers=64, block_moves_per_sweep=1))
