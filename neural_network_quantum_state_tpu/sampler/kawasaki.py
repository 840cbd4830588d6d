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


def _exchange_scan(work: Work, cache, lnpsi0, bonds: jnp.ndarray, uniforms_sel, uniforms_acc, beta=None):
    """beta: optional (K,) per-walker inverse temperatures for tempered
    exchange acceptance |exp(beta*dlnpsi)|^2 (None = beta 1 everywhere).
    Returns per-scalar or per-walker accept counts depending on ``beta``
    (tempered callers aggregate per replica)."""
    per_walker = beta is not None
    k = lnpsi0.re.shape[0]

    def body(carry, xs):
        cache, lnpsi0, n_acc = carry
        u_sel, u_acc = xs
        s = cache.spins
        active = s[:, bonds[:, 0]] * s[:, bonds[:, 1]] < 0  # anti-aligned
        bond, nb = _select_active_bond(active, u_sel)
        i, j = bonds[bond, 0], bonds[bond, 1]
        lnpsi1 = engine.flip2_log_psi_per_walker(work, cache, i, j)
        dln = lnpsi1.re - lnpsi0.re
        if beta is None:
            accept = (u_acc < jnp.exp(2.0 * jnp.minimum(dln, 0.0))) & (nb > 0)
        else:
            # tempered accept prob = min(1, |exp(beta*dlnpsi)|^2), the
            # replica-exchange rule of impl_mcmc_sampler.hpp:150 applied to
            # the particle-conserving pair-exchange move class
            accept = (u_acc < jnp.exp(2.0 * beta * jnp.minimum(dln, 0.0))) & (nb > 0)
        cache = engine.commit_flip2_per_walker(work, cache, i, j, accept)
        lnpsi0 = cplx.where(accept, lnpsi1, lnpsi0)
        acc_f = accept.astype(jnp.float32)
        return (cache, lnpsi0, n_acc + (acc_f if per_walker else jnp.sum(acc_f))), None

    init0 = jnp.zeros((k,) if per_walker else (), jnp.float32)
    init = (cache, lnpsi0, init0)
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


# ---------------------------------------------------------------------------
# Parallel-tempered Kawasaki exchange (replica exchange for fermion samplers)
# ---------------------------------------------------------------------------
# Composition the reference never shipped: its PT machinery is spin-flip-only
# and CPU-only (BaseParallelTemperingSampler, impl_mcmc_sampler.hpp:93-221)
# while Kawasaki exchange is the Hubbard move class
# (kawasaki_updater.hpp:24-152); trapped-Hubbard exchange dynamics were
# measured to mix slowly (RESULTS.md: L=32 trap needed nwarm=5000), exactly
# the regime PT exists for. Sector safety: the pair-exchange move conserves
# particle numbers within every replica, and a replica swap exchanges WHOLE
# configurations between replicas of the same physical chain, so per-flavor
# particle numbers are conserved replica-by-replica by construction.


@partial(jax.jit, static_argnames=("n_sweeps", "n_unit_steps", "n_beta"))
def tempered_exchange_sweeps(
    work: Work,
    state: MCState,
    bonds: jnp.ndarray,
    n_sweeps: int,
    n_unit_steps: int,
    n_beta: int,
) -> MCState:
    """n_sweeps of (tempered exchange sweep + even swaps + odd swaps).

    Replica-minor layout identical to tempering.tempering_sweeps (walker
    w = k*nBeta + r); estimators read the beta=1 slice [::n_beta]. The swap
    phases are shared with the spin-flip PT sampler - they act on the whole
    (cache, lnpsi) pytrees and are move-class agnostic."""
    from neural_network_quantum_state_tpu.sampler.tempering import _swap_phase, replica_betas

    if n_sweeps <= 0:
        # static no-op (opdm_pair warm-starts sites m > 0 with n_warmup=0;
        # jnp.stack over zero per-sweep subkeys would throw)
        return state
    k_tot = state.lnpsi.re.shape[0]
    assert k_tot % n_beta == 0
    kb = k_tot // n_beta
    rdt = state.cache.spins.dtype
    beta = replica_betas(n_beta, kb, rdt)

    def sweep_body(carry, sub):
        cache, lnpsi, n_acc_tot = carry
        k1, k2, k3, k4 = jax.random.split(sub, 4)
        u_sel = jax.random.uniform(k1, (n_unit_steps, k_tot), rdt)
        u_acc = jax.random.uniform(k2, (n_unit_steps, k_tot), rdt)
        cache, lnpsi, n_acc = _exchange_scan(work, cache, lnpsi, bonds, u_sel, u_acc, beta=beta)
        cache, lnpsi, _ = _swap_phase(cache, lnpsi, jax.random.uniform(k3, (k_tot,), rdt), 0, n_beta, kb)
        cache, lnpsi, _ = _swap_phase(cache, lnpsi, jax.random.uniform(k4, (k_tot,), rdt), 1, n_beta, kb)
        return (cache, lnpsi, n_acc_tot + jnp.sum(n_acc)), None

    key, *subs = jax.random.split(state.key, n_sweeps + 1)
    init = (state.cache, state.lnpsi, jnp.zeros((), jnp.float32))
    (cache, lnpsi, n_acc_tot), _ = jax.lax.scan(sweep_body, init, jnp.stack(subs))
    return MCState(
        cache=cache,
        lnpsi=lnpsi,
        key=key,
        n_accepted=state.n_accepted + n_acc_tot,
        n_proposed=state.n_proposed + jnp.float32(n_sweeps * n_unit_steps * k_tot),
    )


@partial(jax.jit, static_argnames=("n_sweeps", "n_unit_steps", "n_beta"))
def exchange_swap_acceptance_probe(
    work: Work,
    state: MCState,
    bonds: jnp.ndarray,
    n_sweeps: int,
    n_unit_steps: int,
    n_beta: int,
) -> tuple[jnp.ndarray, jnp.ndarray, MCState]:
    """Exchange-move analog of tempering.swap_acceptance_probe: returns
    (pair_swap_acceptance (n_beta-1,), exchange_acceptance_per_replica
    (n_beta,), updated state) measured over n_sweeps tempered exchange
    sweeps - the ladder diagnostics tune_n_beta needs, with the CORRECT
    (particle-conserving) move class for fermion ensembles."""
    from neural_network_quantum_state_tpu.sampler.tempering import _swap_phase, replica_betas

    k_tot = state.lnpsi.re.shape[0]
    assert k_tot % n_beta == 0
    kb = k_tot // n_beta
    rdt = state.cache.spins.dtype
    beta = replica_betas(n_beta, kb, rdt)
    r_id = jnp.arange(k_tot) % n_beta

    def sweep_body(carry, sub):
        cache, lnpsi, ex_acc, pair_acc = carry
        k1, k2, k3, k4 = jax.random.split(sub, 4)
        u_sel = jax.random.uniform(k1, (n_unit_steps, k_tot), rdt)
        u_acc = jax.random.uniform(k2, (n_unit_steps, k_tot), rdt)
        cache, lnpsi, n_acc = _exchange_scan(work, cache, lnpsi, bonds, u_sel, u_acc, beta=beta)
        ex_acc = ex_acc.at[r_id].add(n_acc)
        for parity, k in ((0, k3), (1, k4)):
            cache, lnpsi, acc_lower = _swap_phase(
                cache, lnpsi, jax.random.uniform(k, (k_tot,), rdt), parity, n_beta, kb
            )
            pair_acc = pair_acc.at[r_id].add(acc_lower.astype(jnp.float32))
        return (cache, lnpsi, ex_acc, pair_acc), None

    key, *subs = jax.random.split(state.key, n_sweeps + 1)
    init = (
        state.cache,
        state.lnpsi,
        jnp.zeros((n_beta,), jnp.float32),
        jnp.zeros((n_beta,), jnp.float32),
    )
    (cache, lnpsi, ex_acc, pair_acc), _ = jax.lax.scan(sweep_body, init, jnp.stack(subs))
    new_state = MCState(
        cache=cache,
        lnpsi=lnpsi,
        key=key,
        n_accepted=state.n_accepted + jnp.sum(ex_acc),
        n_proposed=state.n_proposed + jnp.float32(n_sweeps * n_unit_steps * k_tot),
    )
    swap_rate = pair_acc[: n_beta - 1] / jnp.float32(n_sweeps * kb)
    ex_rate = ex_acc / jnp.float32(n_sweeps * n_unit_steps * kb)
    return swap_rate, ex_rate, new_state


def tune_n_beta_exchange(
    work: Work,
    state: MCState,
    bonds: jnp.ndarray,
    n_unit_steps: int,
    candidates: tuple[int, ...] = (2, 4, 6, 8, 12, 16),
    target: float = 0.2,
    mix_target: float = 0.1,
    warm_sweeps: int = 50,
    probe_sweeps: int = 25,
    n_devices: int = 1,
) -> tuple[int, dict[int, dict[str, list[float]]]]:
    """Exchange-move analog of tempering.tune_n_beta: pick the smallest
    replica count whose measured ladder works, probing with the
    particle-conserving pair-exchange dynamics (a flip-based probe would
    both break the sector and mis-measure fermion mixing). Criteria and
    semantics identical: every adjacent-pair swap acceptance >= target and
    the hottest replica's exchange acceptance >= mix_target."""
    k_tot = int(state.lnpsi.re.shape[0])
    diags: dict[int, dict[str, list[float]]] = {}
    best = None
    for nb in candidates:
        if nb < 2 or k_tot % (nb * max(n_devices, 1)) != 0:
            continue
        st = tempered_exchange_sweeps(work, state, bonds, warm_sweeps, n_unit_steps, nb)
        swap_rate, ex_rate, _ = exchange_swap_acceptance_probe(
            work, st, bonds, probe_sweeps, n_unit_steps, nb
        )
        swap_l, ex_l = jax.device_get((swap_rate, ex_rate))
        diags[nb] = {"swap": [float(a) for a in swap_l], "flip": [float(a) for a in ex_l]}
        best = nb
        if min(diags[nb]["swap"]) >= target and max(diags[nb]["flip"]) >= mix_target:
            return nb, diags
    if best is None:
        raise ValueError(
            f"no n_beta candidate in {candidates} divides n_walkers={k_tot} "
            f"(x {n_devices} devices)"
        )
    return best, diags
