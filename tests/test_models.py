"""Ansatz-layer tests: incremental updates vs from-scratch, closed-form
gradients vs jax.grad, symmetry invariance (SURVEY.md 4 item 1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_network_quantum_state_tpu.models import (
    FFNN,
    FFNNSfSymm,
    FFNNTrSymm,
    RBM,
    RBMSfSymm,
    RBMTrSymm,
    RBMZ2PrSymm,
)
from neural_network_quantum_state_tpu.ops import engine
from neural_network_quantum_state_tpu.ops.rng import random_spins

N, K = 8, 6

MACHINES = [
    RBM(n_inputs=N, n_hiddens=12, dtype=jnp.complex128),
    RBMTrSymm(n_inputs=N, alpha=2, dtype=jnp.complex128),
    RBMSfSymm(n_inputs=N, alpha=2, dtype=jnp.complex128),
    RBMZ2PrSymm(n_inputs=N, alpha=3, dtype=jnp.complex128),
    FFNN(n_inputs=N, n_hiddens=12, dtype=jnp.complex128),
    FFNNTrSymm(n_inputs=N, alpha=2, dtype=jnp.complex128),
    FFNNSfSymm(n_inputs=N, alpha=2, dtype=jnp.complex128),
]
IDS = [type(m).__name__ for m in MACHINES]


def setup(machine, seed=0):
    key = jax.random.PRNGKey(seed)
    params = machine.init_params(key)
    spins = random_spins(jax.random.PRNGKey(seed + 1), K, N, jnp.float64)
    work = machine.make_work(params)
    cache, lnpsi = engine.full_forward(work, spins)
    return params, work, cache, lnpsi


@pytest.mark.parametrize("machine", MACHINES, ids=IDS)
def test_nvars_matches_flatten(machine):
    params, *_ = setup(machine)
    assert machine.flatten_params(params).shape == (machine.n_vars,)


@pytest.mark.parametrize("machine", MACHINES, ids=IDS)
def test_flip_log_psi_matches_scratch(machine):
    params, work, cache, lnpsi = setup(machine)
    for site in [0, 3, N - 1]:
        got = engine.flip_log_psi(work, cache, site)
        flipped = cache.spins.at[:, site].multiply(-1.0)
        _, want = engine.full_forward(work, flipped)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-10, atol=1e-10)


@pytest.mark.parametrize("machine", MACHINES, ids=IDS)
def test_commit_flip_consistency(machine):
    params, work, cache, lnpsi = setup(machine)
    accept = jnp.asarray([True, False, True, True, False, True])
    site = 2
    new_cache = engine.commit_flip(work, cache, site, accept)
    ref_cache, ref_lnpsi = engine.full_forward(work, new_cache.spins)
    np.testing.assert_allclose(np.asarray(new_cache.y), np.asarray(ref_cache.y), rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(np.asarray(new_cache.sa), np.asarray(ref_cache.sa), rtol=1e-10, atol=1e-10)
    # spins flipped only where accepted
    want_spins = np.asarray(cache.spins).copy()
    want_spins[np.asarray(accept), site] *= -1
    np.testing.assert_allclose(np.asarray(new_cache.spins), want_spins)


@pytest.mark.parametrize("machine", MACHINES, ids=IDS)
def test_grad_log_matches_autodiff(machine):
    params, work, cache, lnpsi = setup(machine)
    o_mat = machine.grad_log(params, cache)
    assert o_mat.shape == (K, machine.n_vars)

    # holomorphic gradient of ln psi wrt flattened complex params
    def lnpsi_k(vec, spins_row):
        p = machine.unflatten_params(vec)
        w = machine.make_work(p)
        return engine.log_psi(w, spins_row[None, :])[0]

    vec = machine.flatten_params(params)
    for k in range(3):
        g = jax.grad(lnpsi_k, holomorphic=True)(vec, cache.spins[k])
        # holomorphic grad returns conj-free d lnpsi/d theta
        np.testing.assert_allclose(np.asarray(o_mat[k]), np.asarray(g), rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize(
    "machine",
    [RBMTrSymm(n_inputs=N, alpha=2, dtype=jnp.complex128), FFNNTrSymm(n_inputs=N, alpha=2, dtype=jnp.complex128)],
    ids=["RBMTrSymm", "FFNNTrSymm"],
)
def test_translation_invariance(machine):
    params, work, cache, lnpsi = setup(machine)
    rolled = jnp.roll(cache.spins, 3, axis=1)
    _, lnpsi_rolled = engine.full_forward(work, rolled)
    np.testing.assert_allclose(np.asarray(lnpsi), np.asarray(lnpsi_rolled), rtol=1e-10)


@pytest.mark.parametrize(
    "machine",
    [RBMSfSymm(n_inputs=N, alpha=2, dtype=jnp.complex128), FFNNSfSymm(n_inputs=N, alpha=2, dtype=jnp.complex128),
     RBMZ2PrSymm(n_inputs=N, alpha=3, dtype=jnp.complex128)],
    ids=["RBMSfSymm", "FFNNSfSymm", "RBMZ2PrSymm"],
)
def test_spin_flip_invariance(machine):
    params, work, cache, lnpsi = setup(machine)
    _, lnpsi_flipped = engine.full_forward(work, -cache.spins)
    np.testing.assert_allclose(np.asarray(lnpsi), np.asarray(lnpsi_flipped), rtol=1e-10)


def test_z2prsymm_parity_invariance():
    machine = RBMZ2PrSymm(n_inputs=N, alpha=3, dtype=jnp.complex128)
    params, work, cache, lnpsi = setup(machine)
    _, lnpsi_reflected = engine.full_forward(work, cache.spins[:, ::-1])
    np.testing.assert_allclose(np.asarray(lnpsi), np.asarray(lnpsi_reflected), rtol=1e-10)


@pytest.mark.parametrize("machine", MACHINES, ids=IDS)
def test_per_walker_flip_and_pair_flip(machine):
    params, work, cache, lnpsi = setup(machine)
    sites1 = jnp.asarray([0, 1, 2, 3, 4, 5], jnp.int32)
    sites2 = jnp.asarray([5, 4, 6, 7, 0, 1], jnp.int32)
    got1 = engine.flip_log_psi_per_walker(work, cache, sites1)
    got2 = engine.flip2_log_psi_per_walker(work, cache, sites1, sites2)
    spins = np.asarray(cache.spins).copy()
    for k in range(K):
        row = spins[k].copy()
        row[sites1[k]] *= -1
        _, w1 = engine.full_forward(work, jnp.asarray(row)[None])
        np.testing.assert_allclose(complex(got1[k]), complex(w1[0]), rtol=1e-10)
        row[sites2[k]] *= -1
        _, w2 = engine.full_forward(work, jnp.asarray(row)[None])
        np.testing.assert_allclose(complex(got2[k]), complex(w2[0]), rtol=1e-10)


@pytest.mark.parametrize("machine", MACHINES, ids=IDS)
def test_all_flip_log_psi(machine):
    params, work, cache, lnpsi = setup(machine)
    sites = jnp.arange(N, dtype=jnp.int32)
    got = engine.all_flip_log_psi(work, cache, sites)
    for i in [0, N // 2, N - 1]:
        want = engine.flip_log_psi(work, cache, i)
        np.testing.assert_allclose(np.asarray(got[:, i]), np.asarray(want), rtol=1e-10)
