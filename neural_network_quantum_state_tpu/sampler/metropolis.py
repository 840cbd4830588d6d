"""Vectorized single-spin-flip Metropolis engine.

Replaces BaseParallelSampler (cpu/include/mcmc_sampler.hpp:22-48,
impl_mcmc_sampler.hpp:5-90; gpu impl_mcmc_sampler.cuh:28-103): K walkers
advance in lock-step through the site schedule. One sweep = len(schedule)
proposal rounds, each:

    lnpsi1 = flip ln psi          (O(K*H) incremental update)
    ratio  = min(1, exp(2 Re(lnpsi1 - lnpsi0)))
    accept = u < ratio            (branchless masked commit)

The whole sweep is one ``lax.scan`` inside jit - a single XLA computation
per n-sweep block instead of the reference's ~6 kernel launches per site
(SURVEY.md 3.2). Acceptance counters mirror the CPU stack's
``meas_acceptance_ratio`` (impl_mcmc_sampler.hpp:83-90).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from neural_network_quantum_state_tpu.ops import cplx, engine
from neural_network_quantum_state_tpu.ops.cplx import C
from neural_network_quantum_state_tpu.ops.engine import Cache, Work


class MCState(NamedTuple):
    """Sampler state threaded through jit steps."""

    cache: Cache  # spins / y / sa, all (K, ...)
    lnpsi: C  # (K,) split-complex: ln psi of the current states
    key: jax.Array  # threefry key (replaces TRNG4 jump streams)
    n_accepted: jnp.ndarray  # () counter (f32-safe: float)
    n_proposed: jnp.ndarray  # () counter


def init_state(work: Work, spins: jnp.ndarray, key: jax.Array) -> MCState:
    cache, lnpsi = engine.full_forward(work, spins)
    # distinct buffers per counter: aliased leaves break donate_argnums
    return MCState(
        cache=cache,
        lnpsi=lnpsi,
        key=key,
        n_accepted=jnp.zeros((), jnp.float32),
        n_proposed=jnp.zeros((), jnp.float32),
    )


def _sweep_scan(work: Work, cache: Cache, lnpsi0, schedule, uniforms):
    """Scan len(schedule) proposal rounds; returns updated (cache, lnpsi, n_acc)."""

    def body(carry, xs):
        cache, lnpsi0, n_acc = carry
        site, u = xs
        lnpsi1 = engine.flip_log_psi(work, cache, site)
        dln = lnpsi1.re - lnpsi0.re
        # accept prob = min(1, exp(2*dln))   (impl_mcmc_sampler.hpp:48-52)
        accept = u < jnp.exp(2.0 * jnp.minimum(dln, 0.0))
        cache = engine.commit_flip(work, cache, site, accept)
        lnpsi0 = cplx.where(accept, lnpsi1, lnpsi0)
        return (cache, lnpsi0, n_acc + jnp.sum(accept, dtype=jnp.float32)), None

    (cache, lnpsi0, n_acc), _ = jax.lax.scan(body, (cache, lnpsi0, jnp.zeros((), jnp.float32)), (schedule, uniforms))
    return cache, lnpsi0, n_acc


@partial(jax.jit, static_argnames=("n_sweeps",))
def sweeps(work: Work, state: MCState, schedule: jnp.ndarray, n_sweeps: int) -> MCState:
    """Run ``n_sweeps`` full sweeps over the site schedule.

    Equivalent to do_mcmc_steps(n_sweeps) with knMCUnitSteps = len(schedule)
    (the reference sets knMCUnitSteps = nSites, impl_hamiltonians.hpp:10).
    """
    key, sub = jax.random.split(state.key)
    n_steps = n_sweeps * schedule.shape[0]
    full_sched = jnp.tile(schedule, n_sweeps)
    k = state.lnpsi.re.shape[0]
    uniforms = jax.random.uniform(sub, (n_steps, k), state.cache.spins.dtype)
    cache, lnpsi, n_acc = _sweep_scan(work, state.cache, state.lnpsi, full_sched, uniforms)
    return MCState(
        cache=cache,
        lnpsi=lnpsi,
        key=key,
        n_accepted=state.n_accepted + n_acc,
        n_proposed=state.n_proposed + jnp.float32(n_steps * k),
    )


@partial(jax.jit, static_argnames=("n_sweeps", "block_k", "n_beta", "interpret"))
def sweeps_fused(work: Work, state: MCState, schedule: jnp.ndarray, n_sweeps: int, block_k: int | None = None, n_beta: int = 1, interpret: bool | None = None) -> MCState:
    """Pallas fused-sweep variant of :func:`sweeps` (float32, TPU): the whole
    multi-sweep proposal loop runs in one kernel with y resident in VMEM
    (ops.pallas_sweep). Statistically equivalent, different RNG stream.
    n_beta > 1 runs the replica-exchange chain fully in-kernel (tempered
    accepts + swap phases; replica-minor layout like sampler.tempering)."""
    from neural_network_quantum_state_tpu.ops.pallas_sweep import pallas_sweeps

    if interpret is None:
        # trace-time constant: off-TPU the kernel must run in the
        # TPU-emulating interpreter (pltpu primitives have no CPU lowering)
        interpret = jax.devices()[0].platform == "cpu"
    key, sub = jax.random.split(state.key)
    seed = jax.random.randint(sub, (), 0, 2**31 - 1, jnp.int32)
    cache, lnpsi, n_acc = pallas_sweeps(work, state.cache, state.lnpsi, schedule, seed, n_sweeps, block_k=block_k, n_beta=n_beta, interpret=interpret)
    n_steps = n_sweeps * schedule.shape[0]
    k = state.lnpsi.re.shape[0]
    return MCState(
        cache=cache,
        lnpsi=lnpsi,
        key=key,
        n_accepted=state.n_accepted + n_acc,
        n_proposed=state.n_proposed + jnp.float32(n_steps * k),
    )


def make_fused_sharded_sweeps(mesh, axis_name=None, interpret: bool = False, n_beta: int = 1):
    """Multi-chip fused sweeps: the Pallas kernel runs per-device on the
    local walker shard under shard_map (a pallas_call under plain pjit
    cannot be partitioned by XLA). Weights replicate; each device's kernel
    grid covers only its shard; per-device PRNG seeds are decorrelated with
    the mesh axis index; acceptance counts psum over the mesh. On a 2D
    multi-slice mesh the walker axis spans both mesh axes (sweeps stay
    device-local; only the scalar acceptance psum crosses slices).
    """
    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    from neural_network_quantum_state_tpu.ops.pallas_sweep import pallas_sweeps

    axes = axis_name if axis_name is not None else tuple(mesh.axis_names)
    w_spec = P(axes)

    def sweeps_fn(work: Work, state: MCState, schedule: jnp.ndarray, n_sweeps: int) -> MCState:
        def local_body(work, cache, lnpsi, sched, seed):
            # seed arrives pre-sliced to this device's own threefry-derived
            # value (in_spec P(axis) below) - no linear-offset seed arithmetic.
            # block_k=None: the adaptive, n_beta-aware block sizing in
            # _pallas_sweeps_body applies per-device (a hardcoded 1024 broke
            # n_beta values that don't divide 1024, e.g. 3 or 6, and
            # per-device walker counts not a multiple of 1024).
            cache, lnpsi, n_acc = pallas_sweeps(
                work, cache, lnpsi, sched, seed[0], n_sweeps, block_k=None,
                interpret=interpret, n_beta=n_beta
            )
            return cache, lnpsi, jax.lax.psum(n_acc.reshape(1), axes)

        key, sub = jax.random.split(state.key)
        n_dev = int(np.prod([mesh.shape[a] for a in axes]))
        # one independent 31-bit seed per device, drawn from the threefry
        # chain (reference contract: disjoint TRNG4 block streams,
        # impl_mcmc_sampler.hpp:18-24); each device then derives independent
        # per-block seeds from its own value inside pallas_sweeps
        dev_seeds = jax.random.randint(sub, (n_dev,), 0, 2**31 - 1, jnp.int32)
        state_specs = Cache(spins=w_spec, y=C(w_spec, w_spec), sa=C(w_spec, w_spec))
        ln_specs = C(w_spec, w_spec)
        repl = P()
        work_specs = jax.tree_util.tree_map(lambda _: repl, work)
        mapped = shard_map(
            local_body,
            mesh=mesh,
            in_specs=(work_specs, state_specs, ln_specs, repl, w_spec),
            out_specs=(state_specs, ln_specs, repl),
            # pallas_call out_shapes carry no varying-mesh-axes metadata
            check_vma=False,
        )
        cache, lnpsi, n_acc = mapped(work, state.cache, state.lnpsi, jnp.asarray(schedule, jnp.int32), dev_seeds)
        n_steps = n_sweeps * schedule.shape[0]
        k = state.lnpsi.re.shape[0]
        return MCState(
            cache=cache,
            lnpsi=lnpsi,
            key=key,
            n_accepted=state.n_accepted + n_acc[0],
            n_proposed=state.n_proposed + jnp.float32(n_steps * k),
        )

    return sweeps_fn


def _select_walkers(accept: jnp.ndarray, a, b):
    """Per-walker select over a (K, ...)-leaved pytree."""

    def sel(x, y):
        m = accept.reshape((-1,) + (1,) * (x.ndim - 1))
        return jnp.where(m, x, y)

    return jax.tree_util.tree_map(sel, a, b)


@partial(jax.jit, static_argnames=("n_moves", "max_block"))
def block_flip_moves(
    work: Work,
    state: MCState,
    n_moves: int = 1,
    max_block: int | None = None,
    beta: jnp.ndarray | None = None,
) -> MCState:
    """Symmetric block-flip proposals: per walker, flip a contiguous block
    of sites [i, i+l) (PBC wrap) with i ~ U[0, N) and l ~ U[1, max_block].

    The proposal is symmetric (re-drawing the same (i, l) reverses it), so
    Metropolis acceptance min(1, |psi'/psi|^2) preserves |psi|^2 - or the
    tempered |psi|^{2 beta_k} when a per-walker ``beta`` is given (parallel
    tempering replicas, sampler.tempering.replica_betas layout).

    This is an ERGODICITY move beyond the reference's single-flip family:
    in the deep-ordered phase single flips freeze (the N=128 walker
    collapse, RESULTS.md 5/5b) while a block flip can hop between ordered
    sectors in one accept. Cost: one full forward (a (K,N)x(N,H) GEMM
    pair) per move - about one sweep's worth of incremental updates - so
    it is applied sparingly between sweeps. Block accepts are NOT counted
    in the single-flip acceptance counters (reference parity for
    meas_acceptance_ratio).
    """
    n = state.cache.spins.shape[1]
    if max_block is None:
        max_block = max(n // 2, 1)
    key, sub = jax.random.split(state.key)
    k = state.lnpsi.re.shape[0]
    dt = state.cache.spins.dtype

    def body(carry, move_key):
        cache, lnpsi0 = carry
        ki, kl, ku = jax.random.split(move_key, 3)
        i0 = jax.random.randint(ki, (k,), 0, n)
        ell = jax.random.randint(kl, (k,), 1, max_block + 1)
        pos = (jnp.arange(n)[None, :] - i0[:, None]) % n
        mask = pos < ell[:, None]
        prop = jnp.where(mask, -cache.spins, cache.spins)
        cache1, lnpsi1 = engine.full_forward(work, prop)
        dln = lnpsi1.re - lnpsi0.re
        if beta is not None:
            dln = beta.astype(dln.dtype) * dln
        u = jax.random.uniform(ku, (k,), dt)
        accept = u < jnp.exp(2.0 * jnp.minimum(dln, 0.0))
        cache = _select_walkers(accept, cache1, cache)
        lnpsi0 = cplx.where(accept, lnpsi1, lnpsi0)
        return (cache, lnpsi0), None

    move_keys = jax.random.split(sub, n_moves)
    (cache, lnpsi), _ = jax.lax.scan(body, (state.cache, state.lnpsi), move_keys)
    return state._replace(cache=cache, lnpsi=lnpsi, key=key)


def acceptance_ratio(state: MCState) -> tuple[jnp.ndarray, MCState]:
    """Read-and-reset acceptance ratio (impl_mcmc_sampler.hpp:83-90)."""
    ratio = state.n_accepted / jnp.maximum(state.n_proposed, 1.0)
    zero = jnp.zeros((), jnp.float32)
    return ratio, state._replace(n_accepted=zero, n_proposed=zero)
