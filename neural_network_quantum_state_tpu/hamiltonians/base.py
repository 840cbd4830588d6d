"""Hamiltonian protocol.

A Hamiltonian is a frozen config exposing:

- ``schedule()``: site-visit order for the Metropolis sweep (sublattice order),
- ``init_spins(key, n_walkers, dtype)``: initial spin states,
- ``local_energy(work, cache, lnpsi)``: per-walker local energy
  Etilde(s) = sum_s' <s|H|s'> psi(s')/psi(s)   -> (K,) complex.

Unlike the reference's CRTP samplers (cpu/include/hamiltonians.hpp:14-249)
there is no incrementally-updated ``diag_`` cache: the diagonal energy is
recomputed from the spins at each estimate (a trivial gather/GEMM next to the
N-forward off-diagonal term), which keeps the sampler generic and the state
functional.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from neural_network_quantum_state_tpu.ops.engine import Cache, Work


@dataclasses.dataclass(frozen=True)
class Hamiltonian:
    n_sites: int

    def schedule(self) -> np.ndarray:
        raise NotImplementedError

    def init_spins(self, key: jax.Array, n_walkers: int, dtype=jnp.float32) -> jnp.ndarray:
        """Default: all spins up (RBM::initialize(NULL) convention,
        impl_neural_quantum_state.hpp:110-113)."""
        del key
        return jnp.ones((n_walkers, self.n_sites), dtype)

    def local_energy(self, work: Work, cache: Cache, lnpsi: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError
