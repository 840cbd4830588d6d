"""Fused sweep + local-energy megakernel (Pallas TPU).

Round-3 verdict item 4 / docs/BACKLOG.md "Fused sweep+energy megakernel":
one pallas_call runs the ENTIRE multi-sweep Metropolis proposal loop
(ops/pallas_sweep._sweep_kernel semantics) and then the N-forward
off-diagonal local-energy estimate (ops/pallas_energy._energy_kernel
semantics) on the same VMEM-resident walker block - y/spins/sa never
round-trip through HBM between sampling and estimation, and one kernel
launch replaces two.

Scope: the flagship training path only - RBM family (no complex output
weights), float32, single device; in-kernel replica exchange (n_beta > 1)
is supported like the sweep kernel, with the off-diagonal sum produced for
every walker (the VMC step slices the beta=1 replicas downstream exactly
as it does for the cache). The FFNN family and the mixed-precision
estimator path keep the two-kernel pipeline.

Expected effect at N=64/H=256/K=8192 (BACKLOG estimate): the boundary
saving is one (K,H) x 2-plane HBM round trip + one dispatch (~0.1 ms)
against an ~8.5 ms iteration - small by construction; this module exists
to measure it honestly (scripts/bench_megakernel_ab.py) per the verdict's
"A/B or documented negative result".

Reference mapping: the combination of gpu impl_mcmc_sampler.cuh:28-39
(sampling hot loop) and impl_hamiltonians.cuh:234-238 (N-forward local
energy) that the reference dispatches as ~6 kernels per site plus N
forward kernels per estimate.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from neural_network_quantum_state_tpu.ops import cplx
from neural_network_quantum_state_tpu.ops.cplx import C
from neural_network_quantum_state_tpu.ops.engine import Cache, Work
from neural_network_quantum_state_tpu.ops.fastmath import fast_atan2, fast_cos, fast_sin
from neural_network_quantum_state_tpu.ops.pallas_sweep import _hash_bits, _logcosh_re

_LN2 = 0.6931471805599453
_INV24 = float(2.0**-24)


def _sweep_energy_kernel(
    sched_ref,  # (n_sites,) int32 scalar-prefetch - ONE sweep's site order
    seed_ref,  # (n_blocks,) int32 scalar-prefetch: per-block threefry seeds
    wre_ref,
    wim_ref,  # (N, H) VMEM
    c2w_ref,
    s2w_ref,  # (N, H): cos(2*w_im), sin(2*w_im) precomputed by XLA
    are_ref,
    aim_ref,  # (N, 1)
    beta_ref,  # (BK, 1) per-walker temperature (ones when n_beta == 1)
    spins_ref,  # (N, BK) in, transposed (dynamic site index on sublanes)
    yre_ref,
    yim_ref,  # (BK, H) in
    sare_ref,
    saim_ref,  # (BK, 1) in
    ospins_ref,
    oyre_ref,
    oyim_ref,
    osare_ref,
    osaim_ref,
    olnre_ref,  # state outs (sweep phase, updated in place)
    oacc_ref,  # (n_blocks, 1) SMEM accept counts
    ore_ref,
    oim_ref,  # (BK, 1) off-diagonal sum outs (energy phase)
    *,
    hash_prng: bool = False,
    n_sweeps: int = 1,
    n_beta: int = 1,
):
    n_sites = sched_ref.shape[0]
    # ---- phase 1: the sweep loop (pallas_sweep._sweep_kernel, RBM branch)
    ospins_ref[:] = spins_ref[:]
    oyre_ref[:] = yre_ref[:]
    oyim_ref[:] = yim_ref[:]
    osare_ref[:] = sare_ref[:]
    osaim_ref[:] = saim_ref[:]

    block_seed = seed_ref[pl.program_id(0)]
    if not hash_prng:
        pltpu.prng_seed(block_seed)

    olnre_ref[:] = (
        jnp.sum(_logcosh_re(yre_ref[:], yim_ref[:]), axis=1, keepdims=True) + sare_ref[:]
    )
    beta = beta_ref[:]

    def _uniform(t, shape):
        if hash_prng:
            bits = _hash_bits(block_seed.astype(jnp.uint32), t, shape)
        else:
            bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
        return pltpu.bitcast(bits >> 8, jnp.int32).astype(jnp.float32) * _INV24

    def body(t, acc):
        site = sched_ref[t % n_sites]
        srow = ospins_ref[pl.ds(site, 1), :]
        two_s = 2.0 * jnp.transpose(srow)
        wr = wre_ref[pl.ds(site, 1), :]
        wi = wim_ref[pl.ds(site, 1), :]
        y1re = oyre_ref[:] - two_s * wr
        y1im = oyim_ref[:] - two_s * wi
        ln1re = jnp.sum(_logcosh_re(y1re, y1im), axis=1, keepdims=True)
        ar = are_ref[pl.ds(site, 1), :]
        ln1re = ln1re + osare_ref[:] - two_s * ar
        dln = ln1re - olnre_ref[:]
        u = _uniform(t, dln.shape)
        accept = u < jnp.exp(2.0 * beta * jnp.minimum(dln, 0.0))
        mask = accept.astype(jnp.float32)
        two_s_m = two_s * mask
        oyre_ref[:] = oyre_ref[:] - two_s_m * wr
        oyim_ref[:] = oyim_ref[:] - two_s_m * wi
        ai = aim_ref[pl.ds(site, 1), :]
        osare_ref[:] = osare_ref[:] - two_s_m * ar
        osaim_ref[:] = osaim_ref[:] - two_s_m * ai
        olnre_ref[:] = jnp.where(accept, ln1re, olnre_ref[:])
        mask_row = jnp.transpose(mask)
        ospins_ref[pl.ds(site, 1), :] = srow * (1.0 - 2.0 * mask_row)
        return acc + jnp.sum(mask)

    if n_beta <= 1:
        acc = jax.lax.fori_loop(0, n_sweeps * n_sites, body, jnp.float32(0.0))
    else:
        # replica-exchange swap phases after each sweep (replica-minor
        # layout; identical to pallas_sweep._sweep_kernel)
        bk = beta.shape[0]
        r_col = jax.lax.broadcasted_iota(jnp.int32, (bk, 1), 0) % n_beta
        dbeta = jnp.float32(1.0 / n_beta)

        def swap_phase(s, parity):
            lower = ((r_col % 2) == parity) & (r_col + 1 < n_beta)
            ln = olnre_ref[:]
            ln_up = pltpu.roll(ln, bk - 1, 0)
            u = _uniform(jnp.int32(0x40000000) + s * 2 + parity, ln.shape)
            acc_low = (lower & (u < jnp.exp(2.0 * dbeta * jnp.minimum(ln_up - ln, 0.0)))).astype(
                jnp.float32
            )
            acc_up = pltpu.roll(acc_low, 1, 0)

            def exch_col(ref):
                x = ref[:]
                ref[:] = jnp.where(
                    acc_low > 0.5, pltpu.roll(x, bk - 1, 0), jnp.where(acc_up > 0.5, pltpu.roll(x, 1, 0), x)
                )

            exch_col(oyre_ref)
            exch_col(oyim_ref)
            exch_col(osare_ref)
            exch_col(osaim_ref)
            exch_col(olnre_ref)
            m_low = jnp.transpose(acc_low)
            m_up = pltpu.roll(m_low, 1, 1)
            sp = ospins_ref[:]
            ospins_ref[:] = jnp.where(
                m_low > 0.5, pltpu.roll(sp, bk - 1, 1), jnp.where(m_up > 0.5, pltpu.roll(sp, 1, 1), sp)
            )

        def sweep_body(s, acc):
            acc = jax.lax.fori_loop(s * n_sites, (s + 1) * n_sites, body, acc)
            swap_phase(s, 0)
            swap_phase(s, 1)
            return acc

        acc = jax.lax.fori_loop(0, n_sweeps, sweep_body, jnp.float32(0.0))
    oacc_ref[pl.program_id(0), 0] = acc

    # ---- phase 2: N-forward off-diagonal sum on the VMEM-resident state
    # (pallas_energy._energy_kernel with the angle-addition identity; the
    # base y/spins/sa are the post-sweep output refs, never reloaded from
    # HBM). ln psi_0 is recomputed with the SAME in-kernel transcendentals
    # so the ratio ln1 - ln0 cancels implementation flavor.
    ore_ref[:] = jnp.zeros_like(ore_ref)
    oim_ref[:] = jnp.zeros_like(oim_ref)
    x0 = oyre_ref[:]
    cy = fast_cos(oyim_ref[:])
    sy = fast_sin(oyim_ref[:])
    absx0 = jnp.abs(x0)
    sgn0 = jnp.where(x0 < 0, -1.0, 1.0).astype(x0.dtype)
    e0 = jnp.exp(-2.0 * absx0)
    wre0 = (1.0 + e0) * cy
    wim0 = (1.0 - e0) * sy * sgn0
    l0re = 0.5 * jnp.log(wre0 * wre0 + wim0 * wim0) + (absx0 - _LN2)
    l0im = fast_atan2(wim0, wre0)
    ln0re = jnp.sum(l0re, axis=1, keepdims=True) + osare_ref[:]
    ln0im = jnp.sum(l0im, axis=1, keepdims=True) + osaim_ref[:]

    def e_body(site, _):
        srow = ospins_ref[pl.ds(site, 1), :]
        s_col = jnp.transpose(srow)
        two_s = 2.0 * s_col
        wr = wre_ref[pl.ds(site, 1), :]
        c2 = c2w_ref[pl.ds(site, 1), :]
        s2 = s2w_ref[pl.ds(site, 1), :]
        y1re = oyre_ref[:] - two_s * wr
        ss2 = s_col * s2
        c1 = cy * c2 + sy * ss2
        s1 = sy * c2 - cy * ss2
        absx1 = jnp.abs(y1re)
        sgn1 = jnp.where(y1re < 0, -1.0, 1.0).astype(y1re.dtype)
        e1 = jnp.exp(-2.0 * absx1)
        wre1 = (1.0 + e1) * c1
        wim1 = (1.0 - e1) * s1 * sgn1
        lyre = 0.5 * jnp.log(wre1 * wre1 + wim1 * wim1) + (absx1 - _LN2)
        lyim = fast_atan2(wim1, wre1)
        ar = are_ref[pl.ds(site, 1), :]
        ai = aim_ref[pl.ds(site, 1), :]
        dre = jnp.sum(lyre, axis=1, keepdims=True) + osare_ref[:] - two_s * ar - ln0re
        dim = jnp.sum(lyim, axis=1, keepdims=True) + osaim_ref[:] - two_s * ai - ln0im
        mag = jnp.exp(dre)
        ore_ref[:] = ore_ref[:] + mag * jnp.cos(dim)
        oim_ref[:] = oim_ref[:] + mag * jnp.sin(dim)
        return 0

    jax.lax.fori_loop(0, n_sites, e_body, 0)


@functools.partial(jax.jit, static_argnames=("n_sweeps", "block_k", "interpret", "n_beta"))
def pallas_sweeps_offdiag(
    work: Work,
    cache: Cache,
    lnpsi: C,
    schedule: jnp.ndarray,
    seed: jnp.ndarray,
    n_sweeps: int,
    block_k: int | None = None,
    interpret: bool = False,
    n_beta: int = 1,
):
    """n_sweeps fused sweeps + the off-diagonal local-energy sum, one kernel.

    Returns (new_cache, new_lnpsi, n_accepted, offdiag) where offdiag is
    C (K,) = sum_i exp(lnpsi(flip_i s') - lnpsi(s')) over the POST-sweep
    state s' - exactly pallas_sweeps(...) followed by pallas_offdiag_sum on
    its outputs, with the intermediate HBM round trip removed. RBM family
    (work.c is None), float32 only.
    """
    k, n = cache.spins.shape
    h = work.w.re.shape[1]
    assert cache.spins.dtype == jnp.float32, "megakernel is float32-only"
    assert work.c is None, "megakernel covers the RBM family only"
    with jax.enable_x64(False):
        return _body(work, cache, lnpsi, schedule, seed, n_sweeps, block_k, interpret, k, n, h, n_beta)


def _body(work, cache, lnpsi, schedule, seed, n_sweeps, block_k, interpret, k, n, h, n_beta):
    if block_k is None:
        # the energy phase keeps ~6 extra (BK, H) temporaries live beside
        # the sweep state (cy/sy + per-site planes), so budget half the
        # sweep kernel's VMEM target
        bk_cap = max(128, (128 * 1024) // max(1, h))
        cands = [1024, 512, 256, 128]
        if n_beta > 1:
            cands = [b for b in cands if b % n_beta == 0]
            cands += [m * n_beta for m in (128, 64, 32) if (m * n_beta) not in cands]
            cands.sort(reverse=True)
        block_k = next((b for b in cands if b <= bk_cap and k % b == 0), k)
    block_k = min(block_k, k)
    assert k % block_k == 0, (k, block_k)
    if n_beta > 1:
        assert block_k % n_beta == 0, (block_k, n_beta)
    n_blocks = k // block_k

    full_sched = jnp.asarray(schedule, jnp.int32)
    block_seeds = jax.random.randint(
        jax.random.PRNGKey(jnp.asarray(seed, jnp.uint32)), (n_blocks,), 0, 2**31 - 1, jnp.int32
    )
    a = work.a if work.a is not None else cplx.zeros((n,), jnp.float32)
    if n_beta > 1:
        from neural_network_quantum_state_tpu.sampler.tempering import replica_betas

        beta = replica_betas(n_beta, k // n_beta, jnp.float32).reshape(k, 1)
    else:
        beta = jnp.ones((k, 1), jnp.float32)

    state_spec = lambda cols: pl.BlockSpec((block_k, cols), lambda i, *_: (i, 0), memory_space=pltpu.VMEM)
    spins_spec = pl.BlockSpec((n, block_k), lambda i, *_: (0, i), memory_space=pltpu.VMEM)
    fixed_spec = lambda rows, cols: pl.BlockSpec((rows, cols), lambda i, *_: (0, 0), memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_blocks,),
        in_specs=[
            fixed_spec(n, h),  # wre
            fixed_spec(n, h),  # wim
            fixed_spec(n, h),  # cos(2 w_im)
            fixed_spec(n, h),  # sin(2 w_im)
            fixed_spec(n, 1),  # are
            fixed_spec(n, 1),  # aim
            state_spec(1),  # beta
            spins_spec,
            state_spec(h),
            state_spec(h),
            state_spec(1),
            state_spec(1),
        ],
        out_specs=[
            spins_spec,
            state_spec(h),
            state_spec(h),
            state_spec(1),
            state_spec(1),
            state_spec(1),
            pl.BlockSpec((n_blocks, 1), lambda i, *_: (0, 0), memory_space=pltpu.SMEM),
            state_spec(1),  # offdiag re
            state_spec(1),  # offdiag im
        ],
    )
    out_shape = [
        jax.ShapeDtypeStruct((n, k), jnp.float32),
        jax.ShapeDtypeStruct((k, h), jnp.float32),
        jax.ShapeDtypeStruct((k, h), jnp.float32),
        jax.ShapeDtypeStruct((k, 1), jnp.float32),
        jax.ShapeDtypeStruct((k, 1), jnp.float32),
        jax.ShapeDtypeStruct((k, 1), jnp.float32),
        jax.ShapeDtypeStruct((n_blocks, 1), jnp.float32),
        jax.ShapeDtypeStruct((k, 1), jnp.float32),
        jax.ShapeDtypeStruct((k, 1), jnp.float32),
    ]

    outs = pl.pallas_call(
        functools.partial(
            _sweep_energy_kernel, hash_prng=interpret, n_sweeps=n_sweeps, n_beta=n_beta
        ),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=pltpu.InterpretParams() if interpret else False,
    )(
        full_sched,
        block_seeds,
        work.w.re,
        work.w.im,
        jnp.cos(2.0 * work.w.im),
        jnp.sin(2.0 * work.w.im),
        a.re.reshape(n, 1),
        a.im.reshape(n, 1),
        beta,
        cache.spins.T,
        cache.y.re,
        cache.y.im,
        cache.sa.re.reshape(k, 1),
        cache.sa.im.reshape(k, 1),
    )
    spins_t, yre, yim, sare, saim, _lnre, acc, odre, odim = outs
    new_cache = Cache(spins=spins_t.T, y=C(yre, yim), sa=C(sare[:, 0], saim[:, 0]))
    from neural_network_quantum_state_tpu.ops.engine import _hidden_sum

    ly = cplx.clogcosh(new_cache.y)
    new_lnpsi = _hidden_sum(work, ly) + new_cache.sa
    return new_cache, new_lnpsi, jnp.sum(acc), C(odre[:, 0], odim[:, 0])
