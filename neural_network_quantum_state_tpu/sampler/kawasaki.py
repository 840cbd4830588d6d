"""Kawasaki (particle-number-conserving) pair-exchange Metropolis sampler.

Replaces kawasaki::NNSpinExchanger + lattice traits (cpu/include/
kawasaki_updater.hpp:24-152; gpu kawasaki_updater.cuh:35-150): proposals
exchange the two ends of a randomly chosen *active* (anti-aligned)
nearest-neighbor bond, so total occupation is conserved - the move class
for the Jordan-Wigner Hubbard chain.

TPU-native redesign: the reference maintains an incrementally-updated
per-chain bond table (make_table_, :92-109). Here the active-bond mask is
recomputed from the spins each proposal - an O(K*B) elementwise op that is
free next to the O(K*H) amplitude evaluation, removes all hidden sampler
state, and vectorizes perfectly. Bond selection is an inverse-CDF lookup on
the mask's running sum.

Lattice topologies:
- ring_bonds(n): one ring over all inputs (cpu ChainLattice,
  kawasaki_updater.hpp:124-151) - exchanges may cross the up/down sector
  boundary (conserves total N only).
- two_ring_bonds(l): two independent rings for the spin-up [0,L) and
  spin-down [L,2L) sectors (gpu mChainLattice, kawasaki_updater.cuh:108-150)
  - conserves per-flavor particle numbers.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from neural_network_quantum_state_tpu.ops import cplx, engine
from neural_network_quantum_state_tpu.ops.engine import Work
from neural_network_quantum_state_tpu.sampler.metropolis import MCState


def ring_bonds(n: int) -> np.ndarray:
    """(B,2) spin indices of ring bonds b: (b, (b+1)%n)."""
    b = np.arange(n)
    return np.stack([b, (b + 1) % n], axis=1).astype(np.int32)


def two_ring_bonds(l: int) -> np.ndarray:
    """(2L,2) bonds of two independent rings: up sector [0,L), down [L,2L)."""
    up = ring_bonds(l)
    return np.concatenate([up, up + l], axis=0).astype(np.int32)


def _select_active_bond(active: jnp.ndarray, u: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Uniformly pick one active bond per walker.

    active: (K,B) bool; u: (K,) uniforms. Returns (bond_idx (K,), n_active (K,)).
    Mirrors get_indexes_of_spin_pairs (kawasaki_updater.hpp:63-71):
    target = floor(u * n_active); chosen = index of the (target+1)-th active
    bond, via the running-sum inverse CDF.
    """
    nb = jnp.sum(active, axis=1)  # (K,)
    target = jnp.floor(u * nb).astype(jnp.int32)
    target = jnp.minimum(target, jnp.maximum(nb - 1, 0))
    cs = jnp.cumsum(active.astype(jnp.int32), axis=1)  # (K,B)
    bond = jnp.sum((cs <= target[:, None]).astype(jnp.int32), axis=1)
    bond = jnp.minimum(bond, active.shape[1] - 1)
    return bond, nb


def _exchange_scan(work: Work, cache, lnpsi0, bonds: jnp.ndarray, uniforms_sel, uniforms_acc):
    def body(carry, xs):
        cache, lnpsi0, n_acc = carry
        u_sel, u_acc = xs
        s = cache.spins
        active = s[:, bonds[:, 0]] * s[:, bonds[:, 1]] < 0  # anti-aligned
        bond, nb = _select_active_bond(active, u_sel)
        i, j = bonds[bond, 0], bonds[bond, 1]
        lnpsi1 = engine.flip2_log_psi_per_walker(work, cache, i, j)
        dln = lnpsi1.re - lnpsi0.re
        accept = (u_acc < jnp.exp(2.0 * jnp.minimum(dln, 0.0))) & (nb > 0)
        cache = engine.commit_flip2_per_walker(work, cache, i, j, accept)
        lnpsi0 = cplx.where(accept, lnpsi1, lnpsi0)
        return (cache, lnpsi0, n_acc + jnp.sum(accept, dtype=jnp.float32)), None

    init = (cache, lnpsi0, jnp.zeros((), jnp.float32))
    (cache, lnpsi0, n_acc), _ = jax.lax.scan(body, init, (uniforms_sel, uniforms_acc))
    return cache, lnpsi0, n_acc


@partial(jax.jit, static_argnames=("n_sweeps", "n_unit_steps"))
def exchange_sweeps(work: Work, state: MCState, bonds: jnp.ndarray, n_sweeps: int, n_unit_steps: int) -> MCState:
    """Run n_sweeps, each of n_unit_steps exchange proposals (the reference
    sets knMCUnitSteps = nInputs for the GPU Hubbard sampler,
    impl_hamiltonians.cuh:608)."""
    key, k1, k2 = jax.random.split(state.key, 3)
    n_steps = n_sweeps * n_unit_steps
    k = state.lnpsi.re.shape[0]
    u_sel = jax.random.uniform(k1, (n_steps, k), state.cache.spins.dtype)
    u_acc = jax.random.uniform(k2, (n_steps, k), state.cache.spins.dtype)
    cache, lnpsi, n_acc = _exchange_scan(work, state.cache, state.lnpsi, bonds, u_sel, u_acc)
    return MCState(
        cache=cache,
        lnpsi=lnpsi,
        key=key,
        n_accepted=state.n_accepted + n_acc,
        n_proposed=state.n_proposed + jnp.float32(n_steps * k),
    )


@partial(jax.jit, static_argnames=("bonds_tuple", "n_sweeps", "n_unit_steps", "block_k", "interpret"))
def exchange_sweeps_fused(
    work: Work,
    state: MCState,
    bonds_tuple: tuple,
    n_sweeps: int,
    n_unit_steps: int,
    block_k: int | None = None,
    interpret: bool | None = None,
) -> MCState:
    """Pallas fused-kernel variant of :func:`exchange_sweeps` (float32, TPU):
    the whole multi-sweep pair-exchange loop runs in one kernel with y
    resident in VMEM and every per-walker dynamic choice lowered to static
    MXU matmuls (ops.pallas_exchange). Statistically equivalent to the XLA
    scan, different RNG stream. bonds_tuple: hashable ((i, j), ...) table."""
    from neural_network_quantum_state_tpu.ops.pallas_exchange import pallas_exchange_sweeps

    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    key, sub = jax.random.split(state.key)
    seed = jax.random.randint(sub, (), 0, 2**31 - 1, jnp.int32)
    n_steps = n_sweeps * n_unit_steps
    cache, lnpsi, n_acc = pallas_exchange_sweeps(
        work, state.cache, state.lnpsi, bonds_tuple, seed, n_steps,
        block_k=block_k, interpret=interpret,
    )
    k = state.lnpsi.re.shape[0]
    return MCState(
        cache=cache,
        lnpsi=lnpsi,
        key=key,
        n_accepted=state.n_accepted + n_acc,
        n_proposed=state.n_proposed + jnp.float32(n_steps * k),
    )


def make_fused_exchange_sharded_sweeps(mesh, bonds_tuple: tuple, n_unit_steps: int, axis_name=None, interpret: bool = False):
    """Multi-chip fused exchange sweeps: per-device Pallas kernels on the
    local walker shard under shard_map (mirrors
    metropolis.make_fused_sharded_sweeps; pair exchanges are walker-local so
    no cross-device communication beyond the acceptance psum)."""
    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    from neural_network_quantum_state_tpu.ops.engine import Cache
    from neural_network_quantum_state_tpu.ops.pallas_exchange import pallas_exchange_sweeps

    axes = axis_name if axis_name is not None else tuple(mesh.axis_names)
    w_spec = P(axes)

    def sweeps_fn(work: Work, state: MCState, n_sweeps: int) -> MCState:
        n_steps = n_sweeps * n_unit_steps

        def local_body(work, cache, lnpsi, seed):
            cache, lnpsi, n_acc = pallas_exchange_sweeps(
                work, cache, lnpsi, bonds_tuple, seed[0], n_steps, interpret=interpret
            )
            return cache, lnpsi, jax.lax.psum(n_acc.reshape(1), axes)

        key, sub = jax.random.split(state.key)
        n_dev = int(np.prod([mesh.shape[a] for a in axes]))
        dev_seeds = jax.random.randint(sub, (n_dev,), 0, 2**31 - 1, jnp.int32)
        state_specs = Cache(spins=w_spec, y=cplx.C(w_spec, w_spec), sa=cplx.C(w_spec, w_spec))
        ln_specs = cplx.C(w_spec, w_spec)
        repl = P()
        work_specs = jax.tree_util.tree_map(lambda _: repl, work)
        mapped = shard_map(
            local_body,
            mesh=mesh,
            in_specs=(work_specs, state_specs, ln_specs, w_spec),
            out_specs=(state_specs, ln_specs, repl),
            check_vma=False,
        )
        cache, lnpsi, n_acc = mapped(work, state.cache, state.lnpsi, dev_seeds)
        k = state.lnpsi.re.shape[0]
        return MCState(
            cache=cache,
            lnpsi=lnpsi,
            key=key,
            n_accepted=state.n_accepted + n_acc[0],
            n_proposed=state.n_proposed + jnp.float32(n_steps * k),
        )

    return sweeps_fn
