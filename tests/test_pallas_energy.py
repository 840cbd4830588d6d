"""Fused local-energy kernel vs the XLA path (TPU-interpret mode; no PRNG
involved, so the interpreter validates the full computation incl. the
polynomial atan2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_network_quantum_state_tpu.hamiltonians.ising import _offdiag_sum
from neural_network_quantum_state_tpu.models import RBM, RBMTrSymm
from neural_network_quantum_state_tpu.ops import cplx, engine
from neural_network_quantum_state_tpu.ops.pallas_energy import _atan2, pallas_offdiag_sum
from neural_network_quantum_state_tpu.ops.rng import random_spins


def test_polynomial_atan2(rng):
    a = rng.normal(size=512).astype(np.float32) * 3
    b = rng.normal(size=512).astype(np.float32) * 3
    got = np.asarray(_atan2(jnp.asarray(b), jnp.asarray(a)))
    want = np.arctan2(b, a)
    np.testing.assert_allclose(got, want, atol=3e-6)


@pytest.mark.parametrize(
    "machine",
    [RBM(n_inputs=16, n_hiddens=12, dtype=jnp.float32), RBMTrSymm(n_inputs=16, alpha=2, dtype=jnp.float32)],
    ids=["RBM", "RBMTrSymm"],
)
def test_offdiag_kernel_matches_xla(machine):
    n, k = 16, 128
    params = machine.init_params(jax.random.PRNGKey(0))
    work = machine.make_work(params)
    spins = random_spins(jax.random.PRNGKey(1), k, n, jnp.float32)
    cache, lnpsi = engine.full_forward(work, spins)
    sites = jnp.arange(n, dtype=jnp.int32)
    got = pallas_offdiag_sum(work, cache, lnpsi, sites, block_k=64, interpret=True)
    want = _offdiag_sum(work, cache, lnpsi, n)
    np.testing.assert_allclose(np.asarray(got.re), np.asarray(want.re), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got.im), np.asarray(want.im), rtol=2e-4, atol=2e-4)
