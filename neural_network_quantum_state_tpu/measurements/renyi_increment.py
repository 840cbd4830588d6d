"""Increment-trick Renyi-2 estimator (ratio / "glued ensemble" method).

The direct swap estimator (estimators.renyi2_entropy; reference
impl_meas.cuh:57-142) averages exp(ln3 + ln4 - ln1 - ln2) over two
independent |psi|^2 replicas. At half-chain l = N/2 with S2 ~ 1 that
observable is exponentially small on typical samples and heavy-tailed, so
finite sampling is systematically biased LOW (measured: RESULTS.md rows
6c/6d - exact-enumeration cross-check reads -0.033 at N=12 and the bias
grows with sampling depth at N=64). This module implements the standard
fix (Hastings, Gonzalez, Kallin, Melko, PRL 104, 157201 (2010)): write

    Tr rho_A^2 = prod_{j=0}^{l-1}  q_{j+1} / q_j,      A_j = sites [0, j)

with q_j = <SWAP_{A_j}> and estimate each ratio in the *glued* (tilted)
ensemble

    W_j(s1, s2) = |psi(s1) psi(s2) psi(s3^j) psi(s4^j)|,
    s3^j = s1 on A_j else s2,   s4^j = s2 on A_j else s1,

where the increment observable

    O_j = phi_j * g_{j+1}/g_j,      g_j = psi(s3^j) psi(s4^j),
    phi_j = conj(psi(s1) psi(s2)) g_j / |psi(s1) psi(s2) g_j|   (pure phase)

is O(1): g_{j+1}/g_j only touches the single site j (a per-walker flip
ratio on each glued cache, zero when s1_j == s2_j). Then

    q_{j+1}/q_j = <O_j>_{W_j} / <phi_j>_{W_j}.

TPU-native layout: the reference has no counterpart (its swap estimator is
the only entropy path); a CPU implementation would run the l levels
sequentially. Here every level is just MORE BATCH - the sampler state holds
l * walkers_per_level walkers (levels-major), each walker carrying its own
region mask row, and the whole measurement (sweeps + accumulation for all
levels) runs as ONE lax.scan on device. Four coupled log-cosh caches
(s1, s2, s3, s4) advance in lock-step; a single-site Metropolis proposal on
replica 1 touches cache 1 and exactly one of caches 3/4 (site in / out of
A_j), so the acceptance ratio is a product of two incremental O(K*H)
flip ratios - the Work/Cache engine (ops/engine.py) is reused unchanged.
Note the first-power acceptance exp(d), not exp(2d): W_j carries each
amplitude to the first power.
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
from neural_network_quantum_state_tpu.ops.rng import random_spins


class GluedState(NamedTuple):
    """Four coupled walker ensembles + per-walker glue geometry.

    Invariant: c3.spins == where(mask, c1.spins, c2.spins) and
    c4.spins == where(mask, c2.spins, c1.spins) at all times.
    """

    c1: Cache
    c2: Cache
    c3: Cache
    c4: Cache
    ln1: C
    ln2: C
    ln3: C
    ln4: C
    key: jax.Array
    n_accepted: jnp.ndarray  # () float32
    n_proposed: jnp.ndarray  # () float32


def init_glued(work: Work, s1: jnp.ndarray, s2: jnp.ndarray, mask: jnp.ndarray, key: jax.Array) -> GluedState:
    """Build the 4-cache state from replica spins (K, N) and region mask (K, N)."""
    s3 = jnp.where(mask, s1, s2)
    s4 = jnp.where(mask, s2, s1)
    c1, ln1 = engine.full_forward(work, s1)
    c2, ln2 = engine.full_forward(work, s2)
    c3, ln3 = engine.full_forward(work, s3)
    c4, ln4 = engine.full_forward(work, s4)
    return GluedState(c1, c2, c3, c4, ln1, ln2, ln3, ln4, key,
                      jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32))


def _propose(work: Work, cp, lnp, ca, lna, cb, lnb, in_reg, site, u, beta=None):
    """One Metropolis proposal: flip `site` in the primary replica (cp) and
    in its glued partner - cache `ca` where in_reg, cache `cb` elsewhere.

    ``beta``: optional (K,) per-walker inverse temperatures - the glued PT
    ladder samples W_j^beta, so the tempered accept prob is min(1, e^{beta*d}).

    Returns the six updated (cache, lnpsi) plus the per-walker accept mask.
    """
    lnp1 = engine.flip_log_psi(work, cp, site)
    lna1 = engine.flip_log_psi(work, ca, site)
    lnb1 = engine.flip_log_psi(work, cb, site)
    dglue = jnp.where(in_reg, lna1.re - lna.re, lnb1.re - lnb.re)
    d = (lnp1.re - lnp.re) + dglue
    if beta is not None:
        d = beta * d
    # first-power weight |psi1 psi2 psi3 psi4|: accept prob = min(1, e^d)
    accept = u < jnp.exp(jnp.minimum(d, 0.0))
    cp = engine.commit_flip(work, cp, site, accept)
    ca = engine.commit_flip(work, ca, site, accept & in_reg)
    cb = engine.commit_flip(work, cb, site, accept & ~in_reg)
    lnp = cplx.where(accept, lnp1, lnp)
    lna = cplx.where(accept & in_reg, lna1, lna)
    lnb = cplx.where(accept & ~in_reg, lnb1, lnb)
    return cp, lnp, ca, lna, cb, lnb, accept


def _glued_swap_phase(caches, lns, u: jnp.ndarray, parity: int, n_beta: int):
    """One PT swap phase for the glued ensemble: pairs (r, r+1) with
    r = parity mod 2, replica-minor (walker w = c*nBeta + r - identical
    partner geometry to tempering._swap_phase, which see).

    The sampled weight is FIRST-power, W_j^beta with
    ln W_j = Re(ln1 + ln2 + ln3 + ln4), so the swap accept prob is
    exp(dbeta * (ln W_upper - ln W_lower)) with dbeta = 1/nBeta, and an
    accepted swap exchanges the ENTIRE per-walker glued state (all four
    caches + lnpsi's). Swap partners always share a level (callers enforce
    walkers_per_level % n_beta == 0), so the per-walker region masks agree.
    """
    lnw = sum(ln.re for ln in lns)
    k_tot = lnw.shape[0]
    idx = jnp.arange(k_tot)
    r = idx % n_beta
    in_pair_lower = ((r - parity) % 2 == 0) & (r >= parity) & (r + 1 < n_beta)
    in_pair_upper = ((r - parity) % 2 == 1) & (r > parity)
    partner = jnp.where(in_pair_lower, idx + 1, jnp.where(in_pair_upper, idx - 1, idx))

    dbeta = 1.0 / n_beta
    dln = lnw[partner] - lnw
    acc_lower = in_pair_lower & (u < jnp.minimum(jnp.exp(dbeta * dln), 1.0))
    acc = acc_lower | acc_lower[partner]

    def gather_leaf(x):
        return jnp.where(acc.reshape((-1,) + (1,) * (x.ndim - 1)), x[partner], x)

    caches = tuple(jax.tree_util.tree_map(gather_leaf, c) for c in caches)
    lns = tuple(jax.tree_util.tree_map(gather_leaf, ln) for ln in lns)
    return caches, lns, acc_lower


@partial(jax.jit, static_argnames=("n_sweeps", "n_beta"))
def glued_sweeps(work: Work, state: GluedState, schedule: jnp.ndarray, mask: jnp.ndarray,
                 n_sweeps: int, n_beta: int = 1) -> GluedState:
    """Advance ``n_sweeps`` full sweeps; one sweep = len(schedule) sites x
    two proposals (replica 1 then replica 2) per site.

    ``n_beta`` > 1 runs the glued PT ladder (replica-minor within each
    level's walker block, beta_r = (nBeta - r)/nBeta): tempered proposals
    sample W_j^beta and each sweep ends with even- then odd-pair whole-state
    swaps. Estimators must then read the beta=1 slice ``[::n_beta]``."""
    key, sub = jax.random.split(state.key)
    n_steps = n_sweeps * schedule.shape[0]
    full_sched = jnp.tile(schedule, n_sweeps)
    k = state.ln1.re.shape[0]
    rdt = state.c1.spins.dtype
    uniforms = jax.random.uniform(sub, (n_steps, 2, k), rdt)
    if n_beta > 1:
        assert k % n_beta == 0
        from neural_network_quantum_state_tpu.sampler.tempering import replica_betas

        beta = replica_betas(n_beta, k // n_beta, rdt)
        key, sub_sw = jax.random.split(key)
        swap_uniforms = jax.random.uniform(sub_sw, (n_sweeps, 2, k), rdt)
    else:
        beta = None
        swap_uniforms = jnp.zeros((n_sweeps, 2, k), rdt)  # unused

    def site_body(carry, xs):
        (c1, c2, c3, c4, ln1, ln2, ln3, ln4, n_acc) = carry
        site, u = xs
        in_reg = mask[:, site]
        # replica 1 lives on s3 inside A_j, on s4 outside
        c1, ln1, c3, ln3, c4, ln4, a1 = _propose(work, c1, ln1, c3, ln3, c4, ln4, in_reg, site, u[0], beta)
        # replica 2 lives on s4 inside A_j, on s3 outside
        c2, ln2, c4, ln4, c3, ln3, a2 = _propose(work, c2, ln2, c4, ln4, c3, ln3, in_reg, site, u[1], beta)
        n_acc = n_acc + jnp.sum(a1, dtype=jnp.float32) + jnp.sum(a2, dtype=jnp.float32)
        return (c1, c2, c3, c4, ln1, ln2, ln3, ln4, n_acc), None

    init = (state.c1, state.c2, state.c3, state.c4, state.ln1, state.ln2, state.ln3, state.ln4,
            jnp.zeros((), jnp.float32))
    if n_beta == 1:
        (c1, c2, c3, c4, ln1, ln2, ln3, ln4, n_acc), _ = jax.lax.scan(site_body, init, (full_sched, uniforms))
    else:
        n_site_steps = schedule.shape[0]

        def sweep_body(carry, xs):
            sched_u, u_sw = xs
            carry, _ = jax.lax.scan(site_body, carry, sched_u)
            (c1, c2, c3, c4, ln1, ln2, ln3, ln4, n_acc) = carry
            caches, lns = (c1, c2, c3, c4), (ln1, ln2, ln3, ln4)
            for parity in (0, 1):
                caches, lns, _ = _glued_swap_phase(caches, lns, u_sw[parity], parity, n_beta)
            return (*caches, *lns, n_acc), None

        sched_per_sweep = full_sched.reshape(n_sweeps, n_site_steps)
        unis_per_sweep = uniforms.reshape(n_sweeps, n_site_steps, 2, k)
        (c1, c2, c3, c4, ln1, ln2, ln3, ln4, n_acc), _ = jax.lax.scan(
            sweep_body, init, ((sched_per_sweep, unis_per_sweep), swap_uniforms)
        )
    return GluedState(
        c1, c2, c3, c4, ln1, ln2, ln3, ln4, key,
        state.n_accepted + n_acc,
        state.n_proposed + jnp.float32(2 * n_steps * k),
    )


def _increment_observable(work: Work, state: GluedState, inc_site: jnp.ndarray):
    """Per-walker (num, den) of the level ratio:

    num = phi_j * g_{j+1}/g_j,   den = phi_j.

    g_{j+1}/g_j flips site j (= inc_site, per walker) in BOTH glued caches
    when s1_j != s2_j (otherwise A_{j+1} and A_j glue identically: ratio 1).
    """
    k = jnp.arange(state.c1.spins.shape[0])
    differ = state.c1.spins[k, inc_site] != state.c2.spins[k, inc_site]
    d3 = engine.flip_log_psi_per_walker(work, state.c3, inc_site) - state.ln3
    d4 = engine.flip_log_psi_per_walker(work, state.c4, inc_site) - state.ln4
    dre = jnp.where(differ, d3.re + d4.re, 0.0)
    dim = jnp.where(differ, d3.im + d4.im, 0.0)
    # phi = conj(psi1 psi2) g_j / |...|  (pure phase)
    phase = state.ln3.im + state.ln4.im - state.ln1.im - state.ln2.im
    num = cplx.cexp(C(dre, dim + phase))
    den = cplx.cexp(C(jnp.zeros_like(phase), phase))
    return num, den


def _orbit_increment_observable(work: Work, state: GluedState, mask: jnp.ndarray, inc_site: jnp.ndarray):
    """Z2-orbit-quadrature increment observable: Rao-Blackwellize the
    per-walker (num, den) of ``_increment_observable`` over the 4-element
    global-flip orbit {+-s1} x {+-s2} of the glued ensemble.

    For each orbit element (a, b) the glued configurations are rebuilt as
    t3 = glue(a s1, b s2), t4 = glue(b s2, a s1) and the level ratio is
    evaluated there, weighted by the actual sampling weight
    W_j(a s1, b s2) = |psi(a s1) psi(b s2) psi(t3) psi(t4)| (first power).
    The orbit-average identity makes the quadrature EXACTLY unbiased for
    any psi (no Z2 symmetry assumed); its point is deep-ordered cat-like
    states, where the glued single-flip chains freeze in one Neel sector
    and the pure increment chain inherits a per-level freeze bias - the
    quadrature restores the sector average analytically at EVERY level,
    removing the need for the hybrid ``level_offset`` base (the in-chain
    refinement flagged in docs/BACKLOG.md after the round-3 N=64 study).

    Cost: 14 extra full batched forwards per measurement step (2 for
    -s1/-s2 + 4 glued + 2 flip-site forwards per non-identity orbit
    element); the identity element reuses the incremental caches.
    """
    kidx = jnp.arange(state.c1.spins.shape[0])
    s1, s2 = state.c1.spins, state.c2.spins

    def flip_at(t):
        return t.at[kidx, inc_site].set(-t[kidx, inc_site])

    lnAs = {1.0: state.ln1, -1.0: engine.log_psi(work, -s1)}
    lnBs = {1.0: state.ln2, -1.0: engine.log_psi(work, -s2)}

    zs, nums, dens = [], [], []
    for a in (1.0, -1.0):
        for b in (1.0, -1.0):
            lnA, lnB = lnAs[a], lnBs[b]
            if a > 0 and b > 0:
                ln3, ln4 = state.ln3, state.ln4
                d3 = engine.flip_log_psi_per_walker(work, state.c3, inc_site) - ln3
                d4 = engine.flip_log_psi_per_walker(work, state.c4, inc_site) - ln4
            else:
                t3 = jnp.where(mask, a * s1, b * s2)
                t4 = jnp.where(mask, b * s2, a * s1)
                ln3 = engine.log_psi(work, t3)
                ln4 = engine.log_psi(work, t4)
                d3 = engine.log_psi(work, flip_at(t3)) - ln3
                d4 = engine.log_psi(work, flip_at(t4)) - ln4
            differ = (a * s1[kidx, inc_site]) != (b * s2[kidx, inc_site])
            dre = jnp.where(differ, d3.re + d4.re, 0.0)
            dim = jnp.where(differ, d3.im + d4.im, 0.0)
            phase = ln3.im + ln4.im - lnA.im - lnB.im
            zs.append(lnA.re + lnB.re + ln3.re + ln4.re)  # ln W_j at (a, b)
            nums.append(cplx.cexp(C(dre, dim + phase)))
            dens.append(cplx.cexp(C(jnp.zeros_like(phase), phase)))
    z = jnp.stack(zs)  # (4, K)
    w = jnp.exp(z - jnp.max(z, axis=0, keepdims=True))
    wsum = jnp.sum(w, axis=0)
    num = C(sum(w[i] * o.re for i, o in enumerate(nums)) / wsum,
            sum(w[i] * o.im for i, o in enumerate(nums)) / wsum)
    den = C(sum(w[i] * o.re for i, o in enumerate(dens)) / wsum,
            sum(w[i] * o.im for i, o in enumerate(dens)) / wsum)
    return num, den


def swap_base_z2(
    sampler1,
    sampler2,
    l: int,
    n_iterations: int,
    n_sweeps: int = 1,
    n_warmup: int = 100,
    n_blocks: int = 20,
):
    """-ln q_l via the swap estimator with exact Z2 (global spin-flip)
    orbit quadrature; returns (s2, err).

    Each sampled replica pair (s1, s2) is Rao-Blackwellized over its
    4-element orbit {+-s1} x {+-s2}: the per-pair estimate is

        f = sum_ab w_ab O_ab / sum_ab w_ab,
        w_ab = |psi(a s1) psi(b s2)|^2,   O_ab = swap observable at (a s1, b s2)

    which is EXACTLY unbiased for E[O] under ANY pi (the orbit-average
    identity: grouping the state sum by orbits shows E_pi[f] = E_pi[O]) -
    no Z2 symmetry of psi is assumed. Its point: for deep-ordered cat-like
    states the two Neel sectors are global-flip images of each other, so
    the quadrature restores the sector ergodicity that single-flip (and
    weakly-tempered) chains lack - measured on chip at N=64 theta=1.57 the
    plain PT swap base read -ln q_1 = 0.566 (frozen-sector bias) where the
    cat-state value is ln 2 = 0.693. Cost: 12 extra batched forwards per
    iteration (4 sign combos x (2 amplitudes + swapped pair)).

    Intended for SMALL l (the hybrid base of renyi2_increment, where the
    observable is O(1)); at large l it still has the heavy-tail bias that
    the increment chain exists to remove.
    """
    from neural_network_quantum_state_tpu.measurements.sampler import run_pair_estimator

    n = sampler1.n_inputs
    work = sampler1.work
    sampler1.warm_up(n_warmup)
    sampler2.warm_up(n_warmup)
    region = (jnp.arange(n) < l)[None, :]  # subsystem A = sites [0, l)

    def accum(c1, ln1: C, c2, ln2: C):
        s1, s2 = c1.spins, c2.spins
        num_re = num_im = den = None
        zs = []
        obs = []
        for a in (1.0, -1.0):
            for b in (1.0, -1.0):
                t1, t2 = a * s1, b * s2
                lnA = engine.log_psi(work, t1) if a < 0 else ln1
                lnB = engine.log_psi(work, t2) if b < 0 else ln2
                s3 = jnp.where(region, t2, t1)  # A from the other replica
                s4 = jnp.where(region, t1, t2)
                ln3 = engine.log_psi(work, s3)
                ln4 = engine.log_psi(work, s4)
                zs.append(2.0 * (lnA.re + lnB.re))  # ln w_ab
                obs.append(cplx.cexp(ln3 + ln4 - lnA - lnB))
        z = jnp.stack(zs)  # (4, K)
        zmax = jnp.max(z, axis=0, keepdims=True)
        w = jnp.exp(z - zmax)
        den = jnp.sum(w, axis=0)
        num_re = sum(w[i] * o.re for i, o in enumerate(obs))
        num_im = sum(w[i] * o.im for i, o in enumerate(obs))
        f_re = num_re / den  # per-walker orbit-averaged swap estimate
        f_im = num_im / den
        return jnp.mean(f_re), jnp.mean(f_im)

    re, im = run_pair_estimator(sampler1, sampler2, accum, n_iterations, n_sweeps)
    from neural_network_quantum_state_tpu.measurements.estimators import _blocked_jackknife

    val, err, _ = _blocked_jackknife(
        lambda r, i: -np.log(np.real(r + 1j * i)), (np.asarray(re), np.asarray(im)), n_blocks
    )
    return float(val), float(err)


def renyi2_increment(
    machine,
    params,
    l: int,
    n_iterations: int,
    n_sweeps: int = 1,
    n_warmup: int = 100,
    walkers_per_level: int = 512,
    key: jax.Array | int = 0,
    chunk: int = 0,
    n_blocks: int = 20,
    level_offset: int = 0,
    init_spins=None,
    z2_quadrature: bool = False,
    n_beta: int = 1,
    mesh=None,
):
    """S2(A = [0, l)) - S2(A = [0, level_offset)) via the increment trick;
    returns (s2, err, per_level).

    ``per_level`` is an (l - level_offset, 3) array of (ln-ratio,
    ln-ratio-err, Re ratio) per increment. Error bars: blocked jackknife of
    ln(num/den) per level (levels are independent chains), summed in
    quadrature.

    ``level_offset`` > 0 starts the ratio chain at A_{level_offset}: the
    result is -ln(q_l / q_{level_offset}); the caller supplies
    -ln q_{level_offset} separately (for deep-ordered/cat-like states,
    measure q_1 with the parallel-tempered swap estimator - at l=1 its
    observable is O(1) and PT restores the sector ergodicity the glued
    single-flip chains lack; see drivers.measure -what=renyi_inc -l0).

    ``init_spins``: optional (s1, s2) arrays of shape (K, N) or (N,) to
    start every chain from (e.g. a Neel row for ordered states - random
    init needs O(N^2) warmup sweeps of domain-wall diffusion to reach the
    high-weight glued configurations; measured on chip at N=64 theta=1.57).

    ``chunk`` > 0 bounds each device call to that many scan iterations
    (remote-tunnel watchdog safety - same contract as
    AmplitudeSampler.run_estimator).

    ``z2_quadrature``: Rao-Blackwellize every level's observable over the
    global-flip orbit (``_orbit_increment_observable``) - exactly unbiased
    for any psi, and immune to the Neel-sector freeze of the glued chains
    on deep-ordered cat-like states (the in-chain alternative to the
    hybrid ``level_offset`` base). ~14 extra batched forwards per
    measurement step.

    ``n_beta`` > 1: glued PT ladder (docs/BACKLOG item; replica-minor
    within each level block) - walkers_per_level TOTAL chains per level of
    which walkers_per_level/n_beta beta=1 chains feed the estimator; the
    hot replicas sample W_j^beta and restore ergodicity on rough glued
    landscapes exactly like the spin samplers' ladder.

    ``mesh``: optional ``jax.sharding.Mesh`` - the levels x walkers batch
    is pure data parallelism, so the whole walker axis (all levels) shards
    across it; the only cross-device traffic is the per-level means. All
    glue geometry (masks, swap partners, beta=1 slices) is walker-local by
    layout: each device shard must hold whole replica groups, enforced
    below.
    """
    n = machine.n_inputs
    if not (0 <= level_offset < l < n):
        raise ValueError("need 0 <= level_offset < l < n")
    if n_beta > 1 and walkers_per_level % n_beta != 0:
        raise ValueError("walkers_per_level must be a multiple of n_beta")
    rdt = machine.real_dtype
    if isinstance(key, int):
        key = jax.random.PRNGKey(key)
    k1, k2, krun = jax.random.split(key, 3)

    n_levels = l - level_offset
    k_total = n_levels * walkers_per_level
    # levels-major: walker k sits at level j = offset + k // walkers_per_level,
    # sampling W_j with A_j = [0, j) and measuring the ratio q_{j+1}/q_j;
    # within a level block the n_beta replicas of a physical chain are
    # adjacent (replica-minor), so PT swap partners are w +- 1
    level = jnp.repeat(jnp.arange(level_offset, l, dtype=jnp.int32), walkers_per_level)
    mask = jnp.arange(n, dtype=jnp.int32)[None, :] < level[:, None]  # (K, N)
    inc_site = level  # increment site of level j is site j

    if init_spins is None:
        s1 = random_spins(k1, k_total, n, rdt)
        s2 = random_spins(k2, k_total, n, rdt)
    else:
        s1, s2 = (jnp.broadcast_to(jnp.asarray(s, rdt), (k_total, n)) for s in init_spins)

    if mesh is not None:
        from neural_network_quantum_state_tpu.parallel import mesh as meshlib

        n_dev = int(np.prod(list(mesh.shape.values())))
        if k_total % n_dev != 0 or (k_total // n_dev) % n_beta != 0:
            raise ValueError(
                f"walker shards must hold whole replica groups: k_total={k_total} "
                f"over {n_dev} devices with n_beta={n_beta}"
            )
        work = machine.make_work(meshlib.replicate_tree(params, mesh))
        s1, s2, mask, level = meshlib.shard_walker_tree((s1, s2, mask, level), mesh, k_total)
        inc_site = level
    else:
        work = machine.make_work(params)
    state = init_glued(work, s1, s2, mask, krun)
    schedule = jnp.arange(n, dtype=jnp.int32)

    state = glued_sweeps(work, state, schedule, mask, n_warmup, n_beta)
    kb_per_level = walkers_per_level // n_beta

    def body(st, _):
        st = glued_sweeps(work, st, schedule, mask, n_sweeps, n_beta)
        if n_beta > 1:
            # beta=1 readout slice (replica-minor): the hot replicas are
            # auxiliary; observables (incl. the z2q orbit forwards) are
            # only evaluated on the cold chains
            b1 = lambda t: jax.tree_util.tree_map(lambda x: x[::n_beta], t)
            st_obs = GluedState(b1(st.c1), b1(st.c2), b1(st.c3), b1(st.c4),
                                b1(st.ln1), b1(st.ln2), b1(st.ln3), b1(st.ln4),
                                st.key, st.n_accepted, st.n_proposed)
            mask_o, inc_o = mask[::n_beta], inc_site[::n_beta]
        else:
            st_obs, mask_o, inc_o = st, mask, inc_site
        if z2_quadrature:
            num, den = _orbit_increment_observable(work, st_obs, mask_o, inc_o)
        else:
            num, den = _increment_observable(work, st_obs, inc_o)
        # per-level means over the readout-walker axis
        per = lambda x: jnp.mean(x.reshape(n_levels, kb_per_level), axis=1)
        return st, (per(num.re), per(num.im), per(den.re), per(den.im))

    def make_runner(length):
        @jax.jit
        def runner(st):
            return jax.lax.scan(body, st, None, length=length)

        return runner

    if chunk <= 0 or chunk >= n_iterations:
        state, outs = make_runner(n_iterations)(state)
        outs = jax.device_get(outs)
    else:
        n_full, rem = divmod(n_iterations, chunk)
        runner = make_runner(chunk)
        pieces = []
        for _ in range(n_full):
            state, o = runner(state)
            pieces.append(jax.device_get(o))
        if rem:
            state, o = make_runner(rem)(state)
            pieces.append(jax.device_get(o))
        outs = jax.tree_util.tree_map(lambda *xs: np.concatenate(xs, axis=0), *pieces)

    nr, ni, dr, di = (np.asarray(o, np.float64) for o in outs)  # (T, l)
    from neural_network_quantum_state_tpu.measurements.estimators import _blocked_jackknife

    def ln_ratio(a, b, c, d):
        return np.log(np.real((a + 1j * b) / (c + 1j * d)))

    per_level = np.zeros((n_levels, 3))
    for j in range(n_levels):
        v, e, _ = _blocked_jackknife(ln_ratio, (nr[:, j], ni[:, j], dr[:, j], di[:, j]), n_blocks)
        r = np.real((nr[:, j].mean() + 1j * ni[:, j].mean()) / (dr[:, j].mean() + 1j * di[:, j].mean()))
        per_level[j] = (v, e, r)

    s2 = float(-per_level[:, 0].sum())
    err = float(np.sqrt((per_level[:, 1] ** 2).sum()))
    return s2, err, per_level
