"""Replica-exchange (parallel tempering) Metropolis sampler.

Reference: BaseParallelTemperingSampler (cpu/include/mcmc_sampler.hpp:57-87,
impl_mcmc_sampler.hpp:93-221; CPU-only there). nBeta replicas of
nChainsPerBeta chains each; beta_r = (nBeta - r)/nBeta.

One MC step = knMCUnitSteps tempered flip rounds (accept prob
|exp(beta*dlnpsi)|^2) followed by even-pair then odd-pair swap moves between
adjacent replicas (accept prob |exp((beta_r - beta_{r+1}) *
(lnpsi_{r+1} - lnpsi_r))|^2, :150-188). A swap exchanges the full machine
state - here a masked partner-gather over every (K, ...) state leaf, so the
whole move is a handful of fused elementwise ops; no data leaves the device.

TPU-native layout deviation: walkers are *replica-minor* (walker index
w = k*nBeta + r, i.e. each physical chain's nBeta replicas are adjacent)
rather than the reference's replica-major blocks. Swap partners are then
w +- 1, so under walker-axis mesh sharding replica exchange never crosses a
device boundary (a replica-major layout would ppermute the full machine
state between devices every sweep). Estimators read the beta=1 replicas via
the strided slice [::nBeta] (reference reads [0, Kb), :193-205).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from neural_network_quantum_state_tpu.ops import cplx, engine
from neural_network_quantum_state_tpu.ops.cplx import C
from neural_network_quantum_state_tpu.ops.engine import Work
from neural_network_quantum_state_tpu.sampler.metropolis import MCState


def replica_betas(n_beta: int, kb: int, dtype=jnp.float32) -> jnp.ndarray:
    """(K,) per-walker beta: beta_r = (nBeta - r)/nBeta, replica-minor
    (w = k*nBeta + r)."""
    r = jnp.arange(n_beta, dtype=dtype)
    return jnp.tile((n_beta - r) / n_beta, kb)


def _tempered_flip_scan(work: Work, cache, lnpsi0, schedule, uniforms, beta):
    def body(carry, xs):
        cache, lnpsi0, n_acc = carry
        site, u = xs
        lnpsi1 = engine.flip_log_psi(work, cache, site)
        dln = lnpsi1.re - lnpsi0.re
        # accept prob = min(1, |exp(beta*dlnpsi)|^2)  (impl_mcmc_sampler.hpp:150)
        accept = u < jnp.exp(2.0 * beta * jnp.minimum(dln, 0.0))
        cache = engine.commit_flip(work, cache, site, accept)
        lnpsi0 = cplx.where(accept, lnpsi1, lnpsi0)
        return (cache, lnpsi0, n_acc + jnp.sum(accept, dtype=jnp.float32)), None

    init = (cache, lnpsi0, jnp.zeros((), jnp.float32))
    (cache, lnpsi0, n_acc), _ = jax.lax.scan(body, init, (schedule, uniforms))
    return cache, lnpsi0, n_acc


def _swap_phase(cache, lnpsi: C, u: jnp.ndarray, parity: int, n_beta: int, kb: int):
    """One swap phase: pairs (r, r+1) with r = parity mod 2.

    Accept prob exp(2*dbeta*(Re lnpsi_upper - Re lnpsi_lower)) with
    dbeta = beta_r - beta_{r+1} = 1/nBeta, decided by the lower chain's
    uniform and applied to both pair members via a partner gather.
    """
    k_tot = lnpsi.re.shape[0]
    idx = jnp.arange(k_tot)
    r = idx % n_beta  # replica-minor: replica id is the fast axis
    in_pair_lower = ((r - parity) % 2 == 0) & (r >= parity) & (r + 1 < n_beta)
    in_pair_upper = ((r - parity) % 2 == 1) & (r > parity)
    partner = jnp.where(in_pair_lower, idx + 1, jnp.where(in_pair_upper, idx - 1, idx))

    dbeta = 1.0 / n_beta
    dln = lnpsi.re[partner] - lnpsi.re  # for lower chains: upper - lower
    ratio = jnp.minimum(jnp.exp(2.0 * dbeta * dln), 1.0)
    acc_lower = in_pair_lower & (u < ratio)
    acc = acc_lower | acc_lower[partner]  # upper member mirrors its lower

    def gather_leaf(x):
        return jnp.where(acc.reshape((-1,) + (1,) * (x.ndim - 1)), x[partner], x)

    cache = jax.tree_util.tree_map(gather_leaf, cache)
    lnpsi = jax.tree_util.tree_map(gather_leaf, lnpsi)
    return cache, lnpsi


@partial(jax.jit, static_argnames=("n_sweeps", "n_beta"))
def tempering_sweeps(work: Work, state: MCState, schedule: jnp.ndarray, n_sweeps: int, n_beta: int) -> MCState:
    """n_sweeps of (flip sweep + even swaps + odd swaps); walker count must
    be a multiple of n_beta (replica-major layout)."""
    k_tot = state.lnpsi.re.shape[0]
    assert k_tot % n_beta == 0
    kb = k_tot // n_beta
    rdt = state.cache.spins.dtype
    beta = replica_betas(n_beta, kb, rdt)

    key = state.key
    cache, lnpsi = state.cache, state.lnpsi
    n_acc_tot = jnp.zeros((), jnp.float32)
    n_steps = schedule.shape[0]

    def sweep_body(carry, sub):
        cache, lnpsi, n_acc_tot = carry
        k1, k2, k3 = jax.random.split(sub, 3)
        uniforms = jax.random.uniform(k1, (n_steps, k_tot), rdt)
        cache, lnpsi, n_acc = _tempered_flip_scan(work, cache, lnpsi, schedule, uniforms, beta)
        cache, lnpsi = _swap_phase(cache, lnpsi, jax.random.uniform(k2, (k_tot,), rdt), 0, n_beta, kb)
        cache, lnpsi = _swap_phase(cache, lnpsi, jax.random.uniform(k3, (k_tot,), rdt), 1, n_beta, kb)
        return (cache, lnpsi, n_acc_tot + n_acc), None

    key, *subs = jax.random.split(key, n_sweeps + 1)
    (cache, lnpsi, n_acc_tot), _ = jax.lax.scan(
        sweep_body, (cache, lnpsi, n_acc_tot), jnp.stack(subs)
    )
    return MCState(
        cache=cache,
        lnpsi=lnpsi,
        key=key,
        n_accepted=state.n_accepted + n_acc_tot,
        n_proposed=state.n_proposed + jnp.float32(n_sweeps * n_steps * k_tot),
    )
