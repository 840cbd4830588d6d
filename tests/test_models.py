"""Ansatz-layer tests: incremental updates vs from-scratch, closed-form
gradients vs finite differences, symmetry invariance (SURVEY.md 4 item 1)."""

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
from neural_network_quantum_state_tpu.ops import cplx, engine
from neural_network_quantum_state_tpu.ops.cplx import C
from neural_network_quantum_state_tpu.ops.rng import random_spins

N, K = 8, 6

MACHINES = [
    RBM(n_inputs=N, n_hiddens=12, dtype=jnp.float64),
    RBMTrSymm(n_inputs=N, alpha=2, dtype=jnp.float64),
    RBMSfSymm(n_inputs=N, alpha=2, dtype=jnp.float64),
    RBMZ2PrSymm(n_inputs=N, alpha=3, dtype=jnp.float64),
    FFNN(n_inputs=N, n_hiddens=12, dtype=jnp.float64),
    FFNNTrSymm(n_inputs=N, alpha=2, dtype=jnp.float64),
    FFNNSfSymm(n_inputs=N, alpha=2, dtype=jnp.float64),
]
IDS = [type(m).__name__ for m in MACHINES]


def setup(machine, seed=0):
    key = jax.random.PRNGKey(seed)
    params = machine.init_params(key)
    spins = random_spins(jax.random.PRNGKey(seed + 1), K, N, jnp.float64)
    work = machine.make_work(params)
    cache, lnpsi = engine.full_forward(work, spins)
    return params, work, cache, np.asarray(cplx.to_complex(lnpsi))


@pytest.mark.parametrize("machine", MACHINES, ids=IDS)
def test_nvars_matches_flatten(machine):
    params, *_ = setup(machine)
    assert machine.flatten_params(params).re.shape == (machine.n_vars,)
    # round trip
    vec = machine.flatten_params(params)
    params2 = machine.unflatten_params(vec)
    for k in params:
        np.testing.assert_array_equal(np.asarray(params[k].re), np.asarray(params2[k].re))
        np.testing.assert_array_equal(np.asarray(params[k].im), np.asarray(params2[k].im))


@pytest.mark.parametrize("machine", MACHINES, ids=IDS)
def test_flip_log_psi_matches_scratch(machine):
    params, work, cache, lnpsi = setup(machine)
    for site in [0, 3, N - 1]:
        got = np.asarray(cplx.to_complex(engine.flip_log_psi(work, cache, site)))
        flipped = cache.spins.at[:, site].multiply(-1.0)
        _, want = engine.full_forward(work, flipped)
        np.testing.assert_allclose(got, np.asarray(cplx.to_complex(want)), rtol=1e-10, atol=1e-10)


@pytest.mark.parametrize("machine", MACHINES, ids=IDS)
def test_commit_flip_consistency(machine):
    params, work, cache, lnpsi = setup(machine)
    accept = jnp.asarray([True, False, True, True, False, True])
    site = 2
    new_cache = engine.commit_flip(work, cache, site, accept)
    ref_cache, _ = engine.full_forward(work, new_cache.spins)
    np.testing.assert_allclose(np.asarray(new_cache.y.re), np.asarray(ref_cache.y.re), rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(np.asarray(new_cache.y.im), np.asarray(ref_cache.y.im), rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(np.asarray(new_cache.sa.re), np.asarray(ref_cache.sa.re), rtol=1e-10, atol=1e-10)
    want_spins = np.asarray(cache.spins).copy()
    want_spins[np.asarray(accept), site] *= -1
    np.testing.assert_allclose(np.asarray(new_cache.spins), want_spins)


@pytest.mark.parametrize("machine", MACHINES, ids=IDS)
def test_grad_log_matches_finite_differences(machine):
    """O_k = d lnpsi / d theta (holomorphic): central differences along random
    complex directions, f64."""
    params, work, cache, _ = setup(machine)
    o_mat = machine.grad_log(params, cache)
    assert o_mat.re.shape == (K, machine.n_vars)

    vec = machine.flatten_params(params)
    zvec = np.asarray(cplx.to_complex(vec))
    rng = np.random.default_rng(7)

    def lnpsi_all(zv):
        p = machine.unflatten_params(cplx.from_complex(jnp.asarray(zv)))
        w = machine.make_work(p)
        return np.asarray(cplx.to_complex(engine.log_psi(w, cache.spins)))

    eps = 1e-6
    o_np = np.asarray(cplx.to_complex(o_mat))
    for _ in range(3):
        d = rng.normal(size=zvec.shape) + 1j * rng.normal(size=zvec.shape)
        d /= np.linalg.norm(d)
        fd = (lnpsi_all(zvec + eps * d) - lnpsi_all(zvec - eps * d)) / (2 * eps)
        want = o_np @ d  # holomorphic directional derivative
        np.testing.assert_allclose(fd, want, rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize(
    "machine",
    [RBMTrSymm(n_inputs=N, alpha=2, dtype=jnp.float64), FFNNTrSymm(n_inputs=N, alpha=2, dtype=jnp.float64)],
    ids=["RBMTrSymm", "FFNNTrSymm"],
)
def test_translation_invariance(machine):
    params, work, cache, lnpsi = setup(machine)
    rolled = jnp.roll(cache.spins, 3, axis=1)
    _, lnpsi_rolled = engine.full_forward(work, rolled)
    np.testing.assert_allclose(lnpsi, np.asarray(cplx.to_complex(lnpsi_rolled)), rtol=1e-10)


@pytest.mark.parametrize(
    "machine",
    [
        RBMTrSymm(n_inputs=N, alpha=2, dtype=jnp.float64),
        FFNNTrSymm(n_inputs=N, alpha=2, dtype=jnp.float64),
        RBMSfSymm(n_inputs=N, alpha=2, dtype=jnp.float64),
        FFNNSfSymm(n_inputs=N, alpha=2, dtype=jnp.float64),
        RBMZ2PrSymm(n_inputs=N, alpha=3, dtype=jnp.float64),
    ],
    ids=["RBMTrSymm", "FFNNTrSymm", "RBMSfSymm", "FFNNSfSymm", "RBMZ2PrSymm"],
)
def test_neel_sector_amplitudes_equal(machine):
    """Symmetric ansatze carry EXACTLY equal amplitude on the two Neel
    configurations: Neel- is the one-site translation of Neel+ (and also
    its global flip), so translation- or flip-symmetric machines cannot
    represent an asymmetric Neel cat. This is the structural fact behind
    RESULTS.md 6h (the deep-ordered S2 = ln 2 resolution)."""
    params, work, *_ = setup(machine)
    neel = jnp.tile(jnp.array([1.0, -1.0], jnp.float64), N // 2)[None, :]
    _, ln_plus = engine.full_forward(work, neel)
    _, ln_minus = engine.full_forward(work, -neel)
    np.testing.assert_allclose(
        np.asarray(cplx.to_complex(ln_plus)), np.asarray(cplx.to_complex(ln_minus)), rtol=1e-12
    )


@pytest.mark.parametrize(
    "machine",
    [
        RBMSfSymm(n_inputs=N, alpha=2, dtype=jnp.float64),
        FFNNSfSymm(n_inputs=N, alpha=2, dtype=jnp.float64),
        RBMZ2PrSymm(n_inputs=N, alpha=3, dtype=jnp.float64),
    ],
    ids=["RBMSfSymm", "FFNNSfSymm", "RBMZ2PrSymm"],
)
def test_spin_flip_invariance(machine):
    params, work, cache, lnpsi = setup(machine)
    _, lnpsi_flipped = engine.full_forward(work, -cache.spins)
    np.testing.assert_allclose(lnpsi, np.asarray(cplx.to_complex(lnpsi_flipped)), rtol=1e-10)


def test_z2prsymm_parity_invariance():
    machine = RBMZ2PrSymm(n_inputs=N, alpha=3, dtype=jnp.float64)
    params, work, cache, lnpsi = setup(machine)
    _, lnpsi_reflected = engine.full_forward(work, cache.spins[:, ::-1])
    np.testing.assert_allclose(lnpsi, np.asarray(cplx.to_complex(lnpsi_reflected)), rtol=1e-10)


@pytest.mark.parametrize("machine", MACHINES, ids=IDS)
def test_per_walker_flip_and_pair_flip(machine):
    params, work, cache, lnpsi = setup(machine)
    sites1 = jnp.asarray([0, 1, 2, 3, 4, 5], jnp.int32)
    sites2 = jnp.asarray([5, 4, 6, 7, 0, 1], jnp.int32)
    got1 = np.asarray(cplx.to_complex(engine.flip_log_psi_per_walker(work, cache, sites1)))
    got2 = np.asarray(cplx.to_complex(engine.flip2_log_psi_per_walker(work, cache, sites1, sites2)))
    spins = np.asarray(cache.spins).copy()
    for k in range(K):
        row = spins[k].copy()
        row[sites1[k]] *= -1
        _, w1 = engine.full_forward(work, jnp.asarray(row)[None])
        np.testing.assert_allclose(got1[k], complex(np.asarray(cplx.to_complex(w1))[0]), rtol=1e-10)
        row[sites2[k]] *= -1
        _, w2 = engine.full_forward(work, jnp.asarray(row)[None])
        np.testing.assert_allclose(got2[k], complex(np.asarray(cplx.to_complex(w2))[0]), rtol=1e-10)


@pytest.mark.parametrize("machine", MACHINES, ids=IDS)
def test_all_flip_log_psi(machine):
    params, work, cache, lnpsi = setup(machine)
    sites = jnp.arange(N, dtype=jnp.int32)
    got = np.asarray(cplx.to_complex(engine.all_flip_log_psi(work, cache, sites)))
    for i in [0, N // 2, N - 1]:
        want = np.asarray(cplx.to_complex(engine.flip_log_psi(work, cache, i)))
        np.testing.assert_allclose(got[:, i], want, rtol=1e-10)


@pytest.mark.parametrize("machine", MACHINES, ids=IDS)
def test_commit_flip2_per_walker(machine):
    params, work, cache, _ = setup(machine)
    sites1 = jnp.asarray([0, 1, 2, 3, 4, 5], jnp.int32)
    sites2 = jnp.asarray([5, 4, 6, 7, 0, 1], jnp.int32)
    accept = jnp.asarray([True, False, True, False, True, True])
    new_cache = engine.commit_flip2_per_walker(work, cache, sites1, sites2, accept)
    ref_cache, _ = engine.full_forward(work, new_cache.spins)
    np.testing.assert_allclose(np.asarray(new_cache.y.re), np.asarray(ref_cache.y.re), rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(np.asarray(new_cache.y.im), np.asarray(ref_cache.y.im), rtol=1e-10, atol=1e-10)
