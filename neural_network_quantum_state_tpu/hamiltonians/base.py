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

    def reseed_spins(self, key: jax.Array, n_walkers: int, dtype=jnp.float32) -> jnp.ndarray:
        """Fresh walker configurations for collapse remediation: uniform
        random +-1 (NOT init_spins, whose ordered starts - e.g. LITFIChain's
        Neel init - are exactly the configuration a collapsed ensemble is
        pinned on). Particle-conserving Hamiltonians override to stay in
        sector."""
        spins = jax.random.bernoulli(key, 0.5, (n_walkers, self.n_sites))
        return jnp.where(spins, 1.0, -1.0).astype(dtype)

    def local_energy(self, work: Work, cache: Cache, lnpsi: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError

    # -- multi-device -----------------------------------------------------
    def local_energy_local(self, work: Work, cache: Cache, lnpsi):
        """Per-device-shard local energy, called inside shard_map. Defaults
        to ``local_energy``; subclasses override to enable per-shard fused
        Pallas kernels (which pjit cannot partition on its own)."""
        return self.local_energy(work, cache, lnpsi)

    def local_energy_sharded(self, work: Work, cache: Cache, lnpsi, mesh, axis_name=None):
        """Walker-sharded local energy over a device mesh.

        The local energy has NO cross-walker terms (it is a per-chain
        estimate, reference get_htilda_ hooks, impl_hamiltonians.hpp), so it
        shard_maps cleanly over the walker axis: parameters replicate, each
        device computes its own shard - including any per-shard fused
        kernels - and no collectives are issued at all.
        """
        from jax.sharding import PartitionSpec as P

        try:
            from jax import shard_map
        except ImportError:  # older jax
            from jax.experimental.shard_map import shard_map

        # all mesh axes carry walkers (1D; or 2D multi-slice (slice, walkers))
        axes = axis_name if axis_name is not None else tuple(mesh.axis_names)
        w_spec = P(axes)
        repl = P()

        def body(work, cache, lnpsi):
            return self.local_energy_local(work, cache, lnpsi)

        specs_of = lambda tree, spec: jax.tree_util.tree_map(lambda _: spec, tree)
        mapped = shard_map(
            body,
            mesh=mesh,
            in_specs=(specs_of(work, repl), specs_of(cache, w_spec), specs_of(lnpsi, w_spec)),
            out_specs=specs_of(lnpsi, w_spec),
            # per-shard pallas_call results carry no varying-mesh-axes metadata
            check_vma=False,
        )
        return mapped(work, cache, lnpsi)
