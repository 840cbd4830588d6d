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
    """Returns per-walker accept counts (K,) so callers can aggregate either
    the total (tempering_sweeps) or per-replica mixing statistics
    (swap_acceptance_probe)."""
    k_tot = lnpsi0.re.shape[0]

    def body(carry, xs):
        cache, lnpsi0, n_acc = carry
        site, u = xs
        lnpsi1 = engine.flip_log_psi(work, cache, site)
        dln = lnpsi1.re - lnpsi0.re
        # accept prob = min(1, |exp(beta*dlnpsi)|^2)  (impl_mcmc_sampler.hpp:150)
        accept = u < jnp.exp(2.0 * beta * jnp.minimum(dln, 0.0))
        cache = engine.commit_flip(work, cache, site, accept)
        lnpsi0 = cplx.where(accept, lnpsi1, lnpsi0)
        return (cache, lnpsi0, n_acc + accept.astype(jnp.float32)), None

    init = (cache, lnpsi0, jnp.zeros((k_tot,), jnp.float32))
    (cache, lnpsi0, n_acc), _ = jax.lax.scan(body, init, (schedule, uniforms))
    return cache, lnpsi0, n_acc


def _swap_phase(cache, lnpsi: C, u: jnp.ndarray, parity: int, n_beta: int, kb: int):
    """One swap phase: pairs (r, r+1) with r = parity mod 2.

    Accept prob exp(2*dbeta*(Re lnpsi_upper - Re lnpsi_lower)) with
    dbeta = beta_r - beta_{r+1} = 1/nBeta, decided by the lower chain's
    uniform and applied to both pair members via a partner gather.

    Also returns acc_lower, the (K,) bool mask of ACCEPTED lower pair
    members (one entry per proposed swap this phase) - the per-pair
    exchange-acceptance statistic that swap_acceptance_probe aggregates.
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
    return cache, lnpsi, acc_lower


@partial(jax.jit, static_argnames=("n_sweeps", "n_beta"))
def tempering_sweeps(work: Work, state: MCState, schedule: jnp.ndarray, n_sweeps: int, n_beta: int) -> MCState:
    """n_sweeps of (flip sweep + even swaps + odd swaps); walker count must
    be a multiple of n_beta (replica-minor layout: walker k holds physical
    chain k // n_beta, replica k % n_beta - see the module header; the
    estimator-side beta=1 slice is ``[::n_beta]``)."""
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
        cache, lnpsi, _ = _swap_phase(cache, lnpsi, jax.random.uniform(k2, (k_tot,), rdt), 0, n_beta, kb)
        cache, lnpsi, _ = _swap_phase(cache, lnpsi, jax.random.uniform(k3, (k_tot,), rdt), 1, n_beta, kb)
        return (cache, lnpsi, n_acc_tot + jnp.sum(n_acc)), None

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


@partial(jax.jit, static_argnames=("n_sweeps", "n_beta"))
def swap_acceptance_probe(
    work: Work, state: MCState, schedule: jnp.ndarray, n_sweeps: int, n_beta: int
) -> tuple[jnp.ndarray, jnp.ndarray, MCState]:
    """Measured PT ladder diagnostics over n_sweeps tempered sweeps.

    Returns (pair_swap_acceptance (n_beta-1,), flip_acceptance_per_replica
    (n_beta,), updated state), both in [0,1]. Swap acceptance counts
    accepted r <-> r+1 exchanges per adjacent pair (each pair proposed once
    per sweep by each of the kb physical chains: even pairs in phase 0, odd
    in phase 1, denominator exactly n_sweeps*kb). Flip acceptance is the
    per-replica single-flip Metropolis rate - the hottest replica's value
    is the ladder's mixing engine (if even beta_min = 1/nBeta is frozen, PT
    cannot restore ergodicity no matter how freely swaps are accepted).

    Beyond-reference instrumentation: the reference's PT sampler
    (impl_mcmc_sampler.hpp:157-188) tracks no swap statistics at all, so
    its nBeta is a blind manual choice.
    """
    k_tot = state.lnpsi.re.shape[0]
    assert k_tot % n_beta == 0
    kb = k_tot // n_beta
    rdt = state.cache.spins.dtype
    beta = replica_betas(n_beta, kb, rdt)
    r_id = jnp.arange(k_tot) % n_beta
    n_steps = schedule.shape[0]

    def sweep_body(carry, sub):
        cache, lnpsi, flip_acc, pair_acc = carry
        k1, k2, k3 = jax.random.split(sub, 3)
        uniforms = jax.random.uniform(k1, (n_steps, k_tot), rdt)
        cache, lnpsi, n_acc = _tempered_flip_scan(work, cache, lnpsi, schedule, uniforms, beta)
        flip_acc = flip_acc.at[r_id].add(n_acc)
        for parity, k in ((0, k2), (1, k3)):
            cache, lnpsi, acc_lower = _swap_phase(
                cache, lnpsi, jax.random.uniform(k, (k_tot,), rdt), parity, n_beta, kb
            )
            pair_acc = pair_acc.at[r_id].add(acc_lower.astype(jnp.float32))
        return (cache, lnpsi, flip_acc, pair_acc), None

    key, *subs = jax.random.split(state.key, n_sweeps + 1)
    init = (
        state.cache,
        state.lnpsi,
        jnp.zeros((n_beta,), jnp.float32),
        jnp.zeros((n_beta,), jnp.float32),
    )
    (cache, lnpsi, flip_acc, pair_acc), _ = jax.lax.scan(sweep_body, init, jnp.stack(subs))
    new_state = MCState(
        cache=cache,
        lnpsi=lnpsi,
        key=key,
        n_accepted=state.n_accepted + jnp.sum(flip_acc),
        n_proposed=state.n_proposed + jnp.float32(n_sweeps * n_steps * k_tot),
    )
    swap_rate = pair_acc[: n_beta - 1] / jnp.float32(n_sweeps * kb)
    flip_rate = flip_acc / jnp.float32(n_sweeps * n_steps * kb)
    return swap_rate, flip_rate, new_state


def tune_n_beta(
    work: Work,
    state: MCState,
    schedule: jnp.ndarray,
    candidates: tuple[int, ...] = (2, 4, 6, 8, 12, 16),
    target: float = 0.2,
    mix_target: float = 0.1,
    warm_sweeps: int = 50,
    probe_sweeps: int = 25,
    n_devices: int = 1,
) -> tuple[int, dict[int, dict[str, list[float]]]]:
    """Pick the smallest replica count that makes the PT ladder WORK, by
    two measured criteria:

    1. every adjacent-pair swap acceptance >= target (a stalled pair
       partitions the ladder and the beta=1 replicas stop receiving
       hot-replica ergodicity; ~20% is the usual round-trip sweet spot);
    2. the hottest replica's single-flip acceptance >= mix_target (the
       ladder's mixing engine: on a frozen/collapsed ensemble adjacent
       replicas hold near-identical configurations so swaps accept
       trivially - criterion 1 alone would pass a useless ladder whose
       every replica is still stuck).

    Both rates rise as n_beta grows (dbeta = 1/nBeta shrinks, beta_min =
    1/nBeta gets hotter), so the ascending probe stops at the cheapest
    adequate ladder. Candidates that don't divide the walker count (per
    device) are skipped; if none qualifies, the largest valid candidate is
    returned with its diagnostics. The probe warms warm_sweeps tempered
    sweeps per candidate so replicas decorrelate to their own betas before
    measuring. diags[nb] = {"swap": [...], "flip": [...]}.
    """
    k_tot = int(state.lnpsi.re.shape[0])
    diags: dict[int, dict[str, list[float]]] = {}
    best = None
    for nb in candidates:
        if nb < 2 or k_tot % (nb * max(n_devices, 1)) != 0:
            continue
        st = tempering_sweeps(work, state, schedule, warm_sweeps, nb)
        swap_rate, flip_rate, _ = swap_acceptance_probe(work, st, schedule, probe_sweeps, nb)
        swap_l, flip_l = jax.device_get((swap_rate, flip_rate))
        diags[nb] = {"swap": [float(a) for a in swap_l], "flip": [float(a) for a in flip_l]}
        best = nb
        if min(diags[nb]["swap"]) >= target and max(diags[nb]["flip"]) >= mix_target:
            return nb, diags
    if best is None:
        raise ValueError(
            f"no n_beta candidate in {candidates} divides n_walkers={k_tot} "
            f"(x {n_devices} devices)"
        )
    return best, diags
