"""Chunked off-diagonal local energy == unchunked (memory-bounded path)."""

import jax
import jax.numpy as jnp
import numpy as np

from neural_network_quantum_state_tpu.hamiltonians import ising
from neural_network_quantum_state_tpu.hamiltonians.ising import LITFIChain, TFIChain
from neural_network_quantum_state_tpu.models import RBM
from neural_network_quantum_state_tpu.ops import cplx, engine
from neural_network_quantum_state_tpu.ops.rng import random_spins


def test_chunked_matches_full(monkeypatch):
    n, k = 10, 32
    machine = RBM(n_inputs=n, n_hiddens=12, dtype=jnp.float64)
    params = machine.init_params(jax.random.PRNGKey(0))
    work = machine.make_work(params)
    spins = random_spins(jax.random.PRNGKey(1), k, n, jnp.float64)
    cache, lnpsi = engine.full_forward(work, spins)

    ham = TFIChain(n_sites=n, h=-0.7, j=-1.0)
    full = np.asarray(cplx.to_complex(ham.local_energy(work, cache, lnpsi)))

    # force tiny chunks (3 sites per block, with padding on the last block)
    monkeypatch.setattr(ising, "_OFFDIAG_CHUNK_ELEMS", 3 * k * machine.n_hidden)
    chunked = np.asarray(cplx.to_complex(ham.local_energy(work, cache, lnpsi)))
    np.testing.assert_allclose(chunked, full, rtol=1e-12)

    ham2 = LITFIChain(n_sites=n, h=0.4, j=0.9, alpha=2.0, pbc=True)
    monkeypatch.setattr(ising, "_OFFDIAG_CHUNK_ELEMS", 10**12)
    full2 = np.asarray(cplx.to_complex(ham2.local_energy(work, cache, lnpsi)))
    monkeypatch.setattr(ising, "_OFFDIAG_CHUNK_ELEMS", 4 * k * machine.n_hidden)
    chunked2 = np.asarray(cplx.to_complex(ham2.local_energy(work, cache, lnpsi)))
    np.testing.assert_allclose(chunked2, full2, rtol=1e-12)
