"""1D Fermi-Hubbard chain via Jordan-Wigner mapping onto 2L spins.

Reference: fermion::jordanwigner::HubbardChain, cpu/include/hamiltonians.hpp
:220-249 (+impl :1315-1449) and the richer GPU version with site potential
and per-flavor particle counts (gpu impl_hamiltonians.cuh:599-690, kernels
:890-963). Machine inputs: [0,L) = spin-up orbitals, [L,2L) = spin-down;
spin +1 = occupied, -1 = empty.

Local energy (ket-side occupancies s):
    hopping:  -0.25*t * sum_{flavor,dir} (1+s_a)(1-s_b) psi(flip_ab s)/psi(s)
    PBC edge: -0.25*t * 2 * JWstring * (1 - s_a s_b) * ratio, with
              JWstring = prod_{interior i of the flavor sector} (-s_i)
    onsite:   0.25*U * sum_i (1+s_i^up)(1+s_i^dn)
    trap:     0.5 * sum_i V_i (1+s_i)            (GPU only)
    scaled by 1/L (GPU convention, impl_hamiltonians.cuh:676)

Sampling: Kawasaki pair exchange (conserves particle number) - see
sampler.kawasaki.
"""

from __future__ import annotations

import dataclasses
from functools import cached_property
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from neural_network_quantum_state_tpu.hamiltonians.base import Hamiltonian
from neural_network_quantum_state_tpu.ops import cplx, engine
from neural_network_quantum_state_tpu.ops.cplx import C
from neural_network_quantum_state_tpu.ops.engine import Cache, Work
from neural_network_quantum_state_tpu.sampler import kawasaki


@dataclasses.dataclass(frozen=True)
class HubbardChain(Hamiltonian):
    """n_sites here is the machine input count 2L (JW spins)."""

    u: float = 4.0
    t: float = 1.0
    n_up: int = 0
    n_down: int = 0
    # CPU-reference mode: total particle count scattered over all 2L inputs
    # (HubbardChain::initialize, cpu impl_hamiltonians.hpp:1344-1360);
    # overrides (n_up, n_down) when set - pair with per_flavor_rings=False
    # so exchange moves conserve only the total.
    n_particles: Optional[int] = None
    pbc: bool = True
    v: Optional[tuple] = None  # length-2L site potential, or None
    per_flavor_rings: bool = True  # gpu mChainLattice vs cpu single ring
    scale_per_site: bool = True  # GPU 1/L convention

    def __post_init__(self):
        if self.n_sites % 2 != 0:
            raise ValueError("HubbardChain needs an even machine input count (2L)")
        if self.v is not None and len(self.v) != self.n_sites:
            raise ValueError("V must have length 2L")

    @property
    def l(self) -> int:
        return self.n_sites // 2

    # ---- sampler wiring --------------------------------------------------
    sampler_kind = "exchange"

    def reseed_spins(self, key, n_walkers: int, dtype=jnp.float32):
        """Collapse remediation must conserve particle number (the Kawasaki
        proposals never leave the sector): init_spins already draws random
        sector-correct configurations."""
        return self.init_spins(key, n_walkers, dtype)

    @cached_property
    def bonds(self) -> jnp.ndarray:
        if self.per_flavor_rings:
            return jnp.asarray(kawasaki.two_ring_bonds(self.l))
        return jnp.asarray(kawasaki.ring_bonds(self.n_sites))

    @property
    def n_unit_steps(self) -> int:
        return self.n_sites  # knMCUnitSteps = nInputs (gpu ctor :608)

    def schedule(self) -> np.ndarray:  # unused by the exchange sampler
        return np.arange(self.n_sites, dtype=np.int32)

    def init_spins(self, key: jax.Array, n_walkers: int, dtype=jnp.float32) -> jnp.ndarray:
        """Random placement of n_up particles in [0,L) and n_down in [L,2L)
        per walker (GPU initialize_ with np counts), or n_particles over all
        2L inputs (CPU-reference mode)."""
        l = self.l

        if self.n_particles is not None:

            def one_total(k):
                filled = jnp.where(jnp.arange(2 * l) < self.n_particles, 1.0, -1.0)
                return jax.random.permutation(k, filled).astype(dtype)

            return jax.vmap(one_total)(jax.random.split(key, n_walkers))

        def one(k):
            ku, kd = jax.random.split(k)
            up = jnp.where(jnp.arange(l) < self.n_up, 1.0, -1.0)
            dn = jnp.where(jnp.arange(l) < self.n_down, 1.0, -1.0)
            up = jax.random.permutation(ku, up)
            dn = jax.random.permutation(kd, dn)
            return jnp.concatenate([up, dn]).astype(dtype)

        return jax.vmap(one)(jax.random.split(key, n_walkers))

    # ---- local energy ----------------------------------------------------
    @cached_property
    def _hop_pairs(self) -> Tuple[np.ndarray, np.ndarray]:
        """Interior hopping pair lists (a_t, b_t), both directions, both
        flavors (impl_hamiltonians.hpp:1374-1398)."""
        l = self.l
        a_list, b_list = [], []
        for s in (0, 1):
            off = s * l
            for i in range(l - 1):  # left to right: (i, i+1)
                a_list.append(off + i)
                b_list.append(off + i + 1)
            for i in range(1, l):  # right to left: (i, i-1)
                a_list.append(off + i)
                b_list.append(off + i - 1)
        return np.asarray(a_list, np.int32), np.asarray(b_list, np.int32)

    def local_energy(self, work: Work, cache: Cache, lnpsi: C) -> C:
        l = self.l
        s = cache.spins  # (K, 2L)
        a_idx, b_idx = self._hop_pairs
        a_j, b_j = jnp.asarray(a_idx), jnp.asarray(b_idx)

        pairs_a, pairs_b = [a_j], [b_j]
        if self.pbc:
            edge_a = jnp.asarray([0, l], jnp.int32)
            edge_b = jnp.asarray([l - 1, 2 * l - 1], jnp.int32)
            pairs_a.append(edge_a)
            pairs_b.append(edge_b)
        all_a = jnp.concatenate(pairs_a)
        all_b = jnp.concatenate(pairs_b)

        lnpsi1 = engine.all_flip2_log_psi(work, cache, all_a, all_b)  # (K, T)
        ratio = cplx.cexp(C(lnpsi1.re - lnpsi.re[:, None], lnpsi1.im - lnpsi.im[:, None]))

        t_int = a_j.shape[0]
        # interior hopping coefficient: (1+s_a)(1-s_b)
        coeff_int = (1.0 + s[:, a_j]) * (1.0 - s[:, b_j])  # (K, T_int)
        hop = C(
            jnp.sum(coeff_int * ratio.re[:, :t_int], axis=1),
            jnp.sum(coeff_int * ratio.im[:, :t_int], axis=1),
        )

        if self.pbc:
            # edge term per flavor: 2 * JWstring * (1 - s_a s_b) * ratio
            # JWstring = prod over interior sites (sL+1 .. sL+L-2) of (-s_i)
            sign = (-1.0) ** (l - 2)
            coeffs, res, ims = [], [], []
            for f, (ea, eb) in enumerate(((0, l - 1), (l, 2 * l - 1))):
                interior = jnp.prod(s[:, ea + 1 : eb], axis=1) * sign
                ce = 2.0 * interior * (1.0 - s[:, ea] * s[:, eb])
                res.append(ce * ratio.re[:, t_int + f])
                ims.append(ce * ratio.im[:, t_int + f])
            hop = hop + C(res[0] + res[1], ims[0] + ims[1])

        htilda = hop * (-0.25 * self.t)

        # onsite interaction 0.25*U*(1+n_up)(1+n_dn)
        onsite = 0.25 * self.u * jnp.sum((1.0 + s[:, :l]) * (1.0 + s[:, l:]), axis=1)
        htilda = htilda + onsite

        if self.v is not None:
            vv = jnp.asarray(np.asarray(self.v), s.dtype)
            htilda = htilda + 0.5 * jnp.sum(vv[None, :] * (1.0 + s), axis=1)

        if self.scale_per_site:
            htilda = htilda * (1.0 / l)
        return htilda
