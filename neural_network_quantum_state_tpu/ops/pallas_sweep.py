"""Fused Metropolis sweep as a single Pallas TPU kernel.

The XLA-scan sweep (sampler.metropolis) round-trips the (K,H) hidden
pre-activations through HBM at every site proposal (~6 fused ops per site,
like the reference's ~6 kernel launches, SURVEY.md 3.2). This kernel runs
the ENTIRE multi-sweep proposal loop on-chip:

- grid over walker blocks; each program keeps its y/spins/sa/lnpsi block in
  VMEM for all n_steps proposals,
- the site schedule is scalar-prefetched to SMEM and indexed inside a
  fori_loop (no host round trips, no per-site dispatch),
- per proposal: y' = y - 2 s_i w_i (VPU), fused stable log-cosh + c-weighted
  hidden reduction, on-chip PRNG accept draw (pltpu.prng_random_bits),
  branchless masked commit,
- weights/biases stay resident in VMEM across the whole call.

Supports every log-cosh machine (optional visible bias a, optional output
weights c) in float32 (TPU-native dtype; the f64 test path uses the XLA
sweep). Acceptance counts are returned per block.

RNG note: accept draws come from the Pallas per-core PRNG, seeded per grid
program with an independent threefry-derived value (never linear offsets of
one seed) - statistically equivalent to, bitwise different from, the XLA
path's host threefry stream. In interpret mode (no HW PRNG) a murmur3-based
counter PRNG substitutes, keeping the interpreted kernel statistically
faithful for chi^2 validation.
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

_LN2 = 0.6931471805599453
_INV24 = float(2.0**-24)


def _logcosh_re(x, y):
    """Re ln cosh(x+iy) only (stable; no atan2 - Mosaic can't lower it).

    |cosh z|^2 identity: (1+e)^2 cos^2 y + (1-e)^2 sin^2 y =
    1 + e^2 + 2 e cos(2y) with e = exp(-2|x|) - 3 transcendentals per
    element. cos is the polynomial ops.fastmath.fast_cos (2.1x whole-kernel
    by A/B ablation: TPU's library cos pays full Payne-Hanek reduction);
    exp and log stay native - the VPU lowers them near-free, and the
    polynomial versions measured 15-25% SLOWER (see fastmath docstring).
    """
    absx = jnp.abs(x)
    e = jnp.exp(-2.0 * absx)
    mag2 = 1.0 + e * e + 2.0 * e * fast_cos(2.0 * y)
    return 0.5 * jnp.log(mag2) + (absx - _LN2)


def _logcosh_both(x, y):
    """(Re, Im) of ln cosh(x+iy) - the FFNN-family path: complex output
    weights c make Re(c * lncosh) depend on Im lncosh, so the accept chain
    needs both planes. Im uses the polynomial fast_atan2 (Mosaic has no
    atan2); same split formulation the fused energy kernel inlines."""
    absx = jnp.abs(x)
    sgn = jnp.where(x < 0, -1.0, 1.0).astype(x.dtype)
    e = jnp.exp(-2.0 * absx)
    wre = (1.0 + e) * fast_cos(y)
    wim = (1.0 - e) * fast_sin(y) * sgn
    re = 0.5 * jnp.log(wre * wre + wim * wim) + (absx - _LN2)
    im = fast_atan2(wim, wre)
    return re, im


def _fmix32(h):
    """murmur3 finalizer: full-avalanche bijection on uint32."""
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h


def _hash_bits(seed_u32, t, shape):
    """Counter-based stateless PRNG over (seed, step, walker-lane): two
    chained murmur3 avalanches. Used in interpret mode, where the TPU
    hardware PRNG (pltpu.prng_random_bits) is unavailable and would return
    zero bits - an accept-all sampler that silently passes finiteness
    checks but is statistically wrong. This makes the interpreted kernel a
    faithful statistical model of the accept chain (chi^2-testable)."""
    lanes = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    x = _fmix32(lanes ^ (seed_u32 * jnp.uint32(0x9E3779B9)))
    return _fmix32(x + t.astype(jnp.uint32) * jnp.uint32(0x85EBCA77))


def _sweep_kernel(
    sched_ref,  # (n_sites,) int32, scalar-prefetched (SMEM) - ONE sweep's order
    seed_ref,  # (n_blocks,) int32, scalar-prefetched: per-block threefry-derived seeds
    wre_ref,
    wim_ref,  # (N, H) VMEM, full
    are_ref,
    aim_ref,  # (N, 1) VMEM (zeros when no visible bias)
    cre_ref,
    cim_ref,  # (1, H) VMEM (ones/zeros when c is None)
    beta_ref,  # (BK, 1) per-walker temperature (ones when n_beta == 1)
    spins_ref,  # (N, BK) in - TRANSPOSED: site selection must be on the
    # sublane dim (Mosaic forbids dynamic lane indexing)
    yre_ref,
    yim_ref,  # (BK, H) in
    sare_ref,
    saim_ref,  # (BK, 1) in
    *rest_refs,  # [c4, s4 when recur_cos] + outs + [cy, sy scratch when recur_cos]
    hash_prng: bool = False,
    has_c: bool = False,
    n_sweeps: int = 1,
    n_beta: int = 1,
    recur_cos: bool = False,
):
    if recur_cos:
        # c4/s4: per-(site, hidden) rotation constants cos/sin(4 w_im);
        # cy/sy: running cos/sin(2 y_im) VMEM scratch (refreshed per sweep)
        c4_ref, s4_ref = rest_refs[0], rest_refs[1]
        (ospins_ref, oyre_ref, oyim_ref, osare_ref, osaim_ref, olnre_ref,
         oacc_ref, cy_ref, sy_ref) = rest_refs[2:]
    else:
        (ospins_ref, oyre_ref, oyim_ref, osare_ref, osaim_ref, olnre_ref,
         oacc_ref) = rest_refs
    n_sites = sched_ref.shape[0]
    # bring state into the output refs; all updates happen in-place there
    ospins_ref[:] = spins_ref[:]
    oyre_ref[:] = yre_ref[:]
    oyim_ref[:] = yim_ref[:]
    osare_ref[:] = sare_ref[:]
    osaim_ref[:] = saim_ref[:]

    # per-block seed: an independent threefry-derived 31-bit value per grid
    # program (computed by the caller), NOT a linear offset of one seed -
    # adjacent linear seeds of a counter PRNG have no independence guarantee
    # (reference contract: TRNG4 block-splitting gives provably disjoint
    # streams, impl_mcmc_sampler.hpp:18-24)
    block_seed = seed_ref[pl.program_id(0)]
    if not hash_prng:
        pltpu.prng_seed(block_seed)
    cre = cre_ref[:]  # (1, H)
    cim = cim_ref[:]

    # Re ln psi_0 computed IN-KERNEL (not taken from the XLA lnpsi input) so
    # the whole accept chain ln1 - ln0 uses one logcosh implementation - the
    # TPU library-vs-polynomial transcendental difference would otherwise
    # accumulate over H without cancelling. (The accept chain needs only
    # Re ln psi; the final complex ln psi is recomputed outside the kernel.)
    if has_c:
        # FFNN family: Re(c * lncosh) = cre*Re - cim*Im needs both planes
        # (reference FFNN kernels, gpu/include/neural_quantum_state.cuh:261-373)
        l0re, l0im = _logcosh_both(yre_ref[:], yim_ref[:])
        olnre_ref[:] = jnp.sum(cre * l0re - cim * l0im, axis=1, keepdims=True) + sare_ref[:]
    else:
        olnre_ref[:] = (
            jnp.sum(cre * _logcosh_re(yre_ref[:], yim_ref[:]), axis=1, keepdims=True) + sare_ref[:]
        )

    beta = beta_ref[:]  # (BK, 1)

    def _uniform(t, shape):
        if hash_prng:
            bits = _hash_bits(block_seed.astype(jnp.uint32), t, shape)
        else:
            bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
        # top 24 bits -> [0,1): shift fits in int32 (Mosaic can't cast u32->f32)
        return pltpu.bitcast(bits >> 8, jnp.int32).astype(jnp.float32) * _INV24

    def body(t, acc):
        site = sched_ref[t % n_sites]
        srow = ospins_ref[pl.ds(site, 1), :]  # (1, BK)
        two_s = 2.0 * jnp.transpose(srow)  # (BK, 1) - one per-step relayout
        wr = wre_ref[pl.ds(site, 1), :]  # (1, H)
        wi = wim_ref[pl.ds(site, 1), :]
        y1re = oyre_ref[:] - two_s * wr
        if recur_cos:
            # candidate cos(2 y'_im) by angle addition against the running
            # cos/sin(2 y_im): cos(2y - 4 s w) = cy*cos(4w) + s*sy*sin(4w)
            # (s = +-1) - 4 FMAs replace the 12-op fast_cos polynomial of
            # _logcosh_re per (walker, hidden) element. mag2 is clamped:
            # rotation drift (refreshed each sweep) can push it epsilon
            # below 0 where the exact value is 0 (y_re ~ 0, cos2y ~ -1).
            sgn = 0.5 * two_s  # (BK, 1)
            c4 = c4_ref[pl.ds(site, 1), :]  # (1, H)
            s4 = s4_ref[pl.ds(site, 1), :]
            cy = cy_ref[:]
            sy = sy_ref[:]
            cos2y1 = cy * c4 + (sgn * sy) * s4
            absx = jnp.abs(y1re)
            e = jnp.exp(-2.0 * absx)
            mag2 = jnp.maximum(1.0 + e * e + 2.0 * e * cos2y1, 1e-37)
            lyre = 0.5 * jnp.log(mag2) + (absx - _LN2)
            ln1re = jnp.sum(cre * lyre, axis=1, keepdims=True)
        elif has_c:
            # complex output weights (FFNN family): Re(c * lncosh) needs
            # both planes of lncosh
            y1im = oyim_ref[:] - two_s * wi
            lyre, lyim = _logcosh_both(y1re, y1im)
            ln1re = jnp.sum(cre * lyre - cim * lyim, axis=1, keepdims=True)
        else:
            y1im = oyim_ref[:] - two_s * wi
            lyre = _logcosh_re(y1re, y1im)
            ln1re = jnp.sum(cre * lyre, axis=1, keepdims=True)
        ar = are_ref[pl.ds(site, 1), :]  # (1, 1)
        ln1re = ln1re + osare_ref[:] - two_s * ar

        dln = ln1re - olnre_ref[:]  # (BK, 1)
        u = _uniform(t, dln.shape)
        # tempered accept |exp(beta*dln)|^2 (impl_mcmc_sampler.hpp:150);
        # beta == 1 everywhere in the plain sampler
        accept = u < jnp.exp(2.0 * beta * jnp.minimum(dln, 0.0))
        mask = accept.astype(jnp.float32)  # (BK, 1)

        two_s_m = two_s * mask
        oyre_ref[:] = oyre_ref[:] - two_s_m * wr
        oyim_ref[:] = oyim_ref[:] - two_s_m * wi
        if recur_cos:
            # masked rotation of the running cos/sin(2 y_im) to the
            # accepted candidate (sin by the matching angle addition)
            sin2y1 = sy * c4 - (sgn * cy) * s4
            cy_ref[:] = cy + mask * (cos2y1 - cy)
            sy_ref[:] = sy + mask * (sin2y1 - sy)
        ai = aim_ref[pl.ds(site, 1), :]
        osare_ref[:] = osare_ref[:] - two_s_m * ar
        osaim_ref[:] = osaim_ref[:] - two_s_m * ai
        olnre_ref[:] = jnp.where(accept, ln1re, olnre_ref[:])
        mask_row = jnp.transpose(mask)  # (1, BK)
        ospins_ref[pl.ds(site, 1), :] = srow * (1.0 - 2.0 * mask_row)
        return acc + jnp.sum(mask)

    def refresh_cy_sy():
        # re-derive the running rotation state from the committed y_im -
        # bounds drift to one sweep's worth of masked FMA roundoff; costs
        # one fast_cos + fast_sin per sweep (amortized over n_sites
        # proposals). Also what makes the PT swap phases below correct
        # without exchanging cy/sy: each sweep starts from fresh values.
        cy_ref[:] = fast_cos(2.0 * oyim_ref[:])
        sy_ref[:] = fast_sin(2.0 * oyim_ref[:])

    if n_beta <= 1:
        if recur_cos:

            def sweep_only_body(s, acc):
                refresh_cy_sy()
                return jax.lax.fori_loop(s * n_sites, (s + 1) * n_sites, body, acc)

            acc = jax.lax.fori_loop(0, n_sweeps, sweep_only_body, jnp.float32(0.0))
        else:
            acc = jax.lax.fori_loop(0, n_sweeps * n_sites, body, jnp.float32(0.0))
    else:
        # replica-exchange: after each sweep, even then odd adjacent-pair
        # swaps (impl_mcmc_sampler.hpp:157-188). Replica-minor layout: the
        # replica id is walker_row % n_beta (block_k % n_beta == 0, enforced
        # by the caller), so the pair masks are static iota patterns and
        # the partner exchange is a +-1 roll along the walker axis - swaps
        # never leave the block (or the device, under sharding).
        bk = beta.shape[0]
        r_col = jax.lax.broadcasted_iota(jnp.int32, (bk, 1), 0) % n_beta
        dbeta = jnp.float32(1.0 / n_beta)

        def swap_phase(s, parity):
            # pairs (r, r+1) with r of this parity; row bk-1 has
            # r = n_beta-1 (never a lower member), so the circular
            # wraparound of roll never produces a spurious swap
            lower = ((r_col % 2) == parity) & (r_col + 1 < n_beta)
            ln = olnre_ref[:]
            ln_up = pltpu.roll(ln, bk - 1, 0)  # up-neighbor: roll by -1 == bk-1 (pltpu.roll needs shift >= 0)
            u = _uniform(jnp.int32(0x40000000) + s * 2 + parity, ln.shape)
            # accept prob min(1, exp(2*dbeta*(ln_up - ln))); u < 1 always,
            # so clamping the exponent at 0 covers the ratio >= 1 branch
            # f32 masks, not bools: Mosaic's rotate has no 1-bit lowering
            acc_low = (lower & (u < jnp.exp(2.0 * dbeta * jnp.minimum(ln_up - ln, 0.0)))).astype(
                jnp.float32
            )
            acc_up = pltpu.roll(acc_low, 1, 0)  # upper member mirrors its lower

            def exch_col(ref):  # (BK, cols): walker axis on sublanes
                x = ref[:]
                ref[:] = jnp.where(
                    acc_low > 0.5, pltpu.roll(x, bk - 1, 0), jnp.where(acc_up > 0.5, pltpu.roll(x, 1, 0), x)
                )

            exch_col(oyre_ref)
            exch_col(oyim_ref)
            exch_col(osare_ref)
            exch_col(osaim_ref)
            exch_col(olnre_ref)
            # spins are (N, BK): walker axis on lanes
            m_low = jnp.transpose(acc_low)  # (1, BK)
            m_up = pltpu.roll(m_low, 1, 1)
            sp = ospins_ref[:]
            ospins_ref[:] = jnp.where(
                m_low > 0.5, pltpu.roll(sp, bk - 1, 1), jnp.where(m_up > 0.5, pltpu.roll(sp, 1, 1), sp)
            )

        def sweep_body(s, acc):
            if recur_cos:
                refresh_cy_sy()
            acc = jax.lax.fori_loop(s * n_sites, (s + 1) * n_sites, body, acc)
            swap_phase(s, 0)
            swap_phase(s, 1)
            return acc

        acc = jax.lax.fori_loop(0, n_sweeps, sweep_body, jnp.float32(0.0))
    # full-array SMEM accumulator: one row per (sequential) grid program
    oacc_ref[pl.program_id(0), 0] = acc


@functools.partial(
    jax.jit, static_argnames=("n_sweeps", "block_k", "interpret", "n_beta", "recur_cos")
)
def pallas_sweeps(
    work: Work,
    cache: Cache,
    lnpsi: C,
    schedule: jnp.ndarray,
    seed: jnp.ndarray,
    n_sweeps: int,
    block_k: int | None = None,
    interpret: bool = False,
    n_beta: int = 1,
    recur_cos: bool = False,
):
    """Run n_sweeps fused sweeps; returns (cache, lnpsi, n_accepted).

    Supports every log-cosh machine: RBM family (c is None - the accept
    chain tracks only Re ln psi via the 3-transcendental magnitude form)
    and FFNN family (complex output weights c - both lncosh planes are
    computed in-kernel, Im via the polynomial fast_atan2, mirroring the
    reference's dedicated FFNN kernel set,
    gpu/include/neural_quantum_state.cuh:261-373).

    n_beta > 1 runs replica-exchange (parallel tempering) entirely
    in-kernel: tempered accepts plus even/odd adjacent-pair swap phases
    after every sweep (reference impl_mcmc_sampler.hpp:93-221, CPU-only
    there). Walkers must be replica-minor (sampler.tempering layout);
    swaps are +-1 rolls along the walker axis and never leave the block.

    recur_cos (RBM family only): A/B variant that tracks running
    cos/sin(2 y_im) in VMEM scratch and rotates them by per-site constants
    cos/sin(4 w_im) instead of evaluating the fast_cos polynomial per
    proposal (round-4 verdict item 2: one measured optimization attempt
    against the VPU roofline). Statistically identical sampler; bitwise
    different accept chain (see scripts/bench_sweep_recurcos_ab.py).
    """
    k, n = cache.spins.shape
    h = work.w.re.shape[1]
    assert cache.spins.dtype == jnp.float32, "pallas sweep is float32-only"
    has_c = work.c is not None
    # x64 mode (mixed-precision SR drivers) makes BlockSpec index maps emit
    # i64, which Mosaic cannot legalize ('failed to legalize func.func' with
    # i64 returns, observed on v5e); every value here is explicitly
    # f32/int32, so trace this whole call with x64 off.
    assert not (recur_cos and has_c), "recur_cos targets the RBM magnitude path"
    with jax.enable_x64(False):
        return _pallas_sweeps_body(
            work, cache, lnpsi, schedule, seed, n_sweeps, block_k, interpret, k, n, h, has_c,
            n_beta, recur_cos,
        )


def _pallas_sweeps_body(
    work, cache, lnpsi, schedule, seed, n_sweeps, block_k, interpret, k, n, h, has_c,
    n_beta=1, recur_cos=False,
):
    if block_k is None:
        # adaptive: keep each (BK, H) VMEM temporary around 1 MB so the
        # kernel's ~8 live (BK, H) arrays fit the 16 MB VMEM budget at any H.
        # With tempering, blocks must also hold whole replica groups
        # (non-power-of-two n_beta like 3 or 6 disqualifies the power-of-two
        # candidates; fall back to multiples of n_beta, then to k itself).
        # recur_cos adds two (BK, H) scratch planes -> shrink the cap.
        bk_cap = max(128, ((192 if recur_cos else 256) * 1024) // max(1, h))
        cands = [1024, 512, 256, 128]
        if n_beta > 1:
            cands = [b for b in cands if b % n_beta == 0]
            cands += [m * n_beta for m in (256, 128, 64, 32) if (m * n_beta) not in cands]
            cands.sort(reverse=True)
        block_k = next((b for b in cands if b <= bk_cap and k % b == 0), k)
    block_k = min(block_k, k)
    assert k % block_k == 0, (k, block_k)
    if n_beta > 1:
        assert block_k % n_beta == 0, (block_k, n_beta)  # replica groups stay whole
    n_blocks = k // block_k

    full_sched = jnp.asarray(schedule, jnp.int32)
    # independent per-block seeds via threefry (NOT seed + block*const): each
    # grid program gets a decorrelated stream, mirroring the reference's
    # TRNG4 jump-stream contract (impl_mcmc_sampler.hpp:18-24)
    block_seeds = jax.random.randint(
        jax.random.PRNGKey(jnp.asarray(seed, jnp.uint32)),
        (n_blocks,),
        0,
        2**31 - 1,
        jnp.int32,
    )

    a = work.a if work.a is not None else cplx.zeros((n,), jnp.float32)
    c = work.c if has_c else C(jnp.ones((h,), jnp.float32), jnp.zeros((h,), jnp.float32))
    if n_beta > 1:
        from neural_network_quantum_state_tpu.sampler.tempering import replica_betas

        beta = replica_betas(n_beta, k // n_beta, jnp.float32).reshape(k, 1)
    else:
        beta = jnp.ones((k, 1), jnp.float32)

    # index maps receive (grid index, *scalar_prefetch_refs)
    state_spec = lambda cols: pl.BlockSpec((block_k, cols), lambda i, *_: (i, 0), memory_space=pltpu.VMEM)
    spins_spec = pl.BlockSpec((n, block_k), lambda i, *_: (0, i), memory_space=pltpu.VMEM)
    fixed_spec = lambda rows, cols: pl.BlockSpec((rows, cols), lambda i, *_: (0, 0), memory_space=pltpu.VMEM)

    in_specs = [
        fixed_spec(n, h),  # wre
        fixed_spec(n, h),  # wim
        fixed_spec(n, 1),  # are
        fixed_spec(n, 1),  # aim
        fixed_spec(1, h),  # cre
        fixed_spec(1, h),  # cim
        state_spec(1),  # beta (replica-minor, blocked like the state)
        spins_spec,  # spins (N, BK), lane-blocked
        state_spec(h),  # yre
        state_spec(h),  # yim
        state_spec(1),  # sare
        state_spec(1),  # saim
    ]
    if recur_cos:
        in_specs += [fixed_spec(n, h), fixed_spec(n, h)]  # cos/sin(4 w_im)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=[
            spins_spec,
            state_spec(h),
            state_spec(h),
            state_spec(1),
            state_spec(1),
            state_spec(1),
            pl.BlockSpec((n_blocks, 1), lambda i, *_: (0, 0), memory_space=pltpu.SMEM),
        ],
        scratch_shapes=(
            [pltpu.VMEM((block_k, h), jnp.float32), pltpu.VMEM((block_k, h), jnp.float32)]
            if recur_cos
            else []
        ),
    )

    out_shape = [
        jax.ShapeDtypeStruct((n, k), jnp.float32),  # spins (transposed)
        jax.ShapeDtypeStruct((k, h), jnp.float32),  # yre
        jax.ShapeDtypeStruct((k, h), jnp.float32),  # yim
        jax.ShapeDtypeStruct((k, 1), jnp.float32),  # sare
        jax.ShapeDtypeStruct((k, 1), jnp.float32),  # saim
        jax.ShapeDtypeStruct((k, 1), jnp.float32),  # lnre
        jax.ShapeDtypeStruct((n_blocks, 1), jnp.float32),  # acc
    ]

    operands = [
        full_sched,
        block_seeds,
        work.w.re,
        work.w.im,
        a.re.reshape(n, 1),
        a.im.reshape(n, 1),
        c.re.reshape(1, h),
        c.im.reshape(1, h),
        beta,
        cache.spins.T,
        cache.y.re,
        cache.y.im,
        cache.sa.re.reshape(k, 1),
        cache.sa.im.reshape(k, 1),
    ]
    if recur_cos:
        # full-precision XLA cos/sin outside the kernel (once per call)
        operands += [jnp.cos(4.0 * work.w.im), jnp.sin(4.0 * work.w.im)]
    outs = pl.pallas_call(
        # interpret mode swaps the HW PRNG for a counter-hash PRNG so the
        # interpreted kernel is statistically faithful (chi^2-testable)
        functools.partial(
            _sweep_kernel, hash_prng=interpret, has_c=has_c, n_sweeps=n_sweeps,
            n_beta=n_beta, recur_cos=recur_cos,
        ),
        grid_spec=grid_spec,
        out_shape=out_shape,
        # TPU-emulating interpreter (needed for pltpu.prng_* off-TPU)
        interpret=pltpu.InterpretParams() if interpret else False,
    )(*operands)
    spins_t, yre, yim, sare, saim, _lnre, acc = outs
    new_cache = Cache(spins=spins_t.T, y=C(yre, yim), sa=C(sare[:, 0], saim[:, 0]))
    # Full ln psi recomputed from the final cache with the XLA logcosh (one
    # fused elementwise pass): downstream consumers (local energy, SR) mix
    # it with XLA-computed lnpsi1 values, so it must be XLA-flavored; the
    # kernel's running Re-ln-psi is internal to the accept chain.
    from neural_network_quantum_state_tpu.ops.engine import _hidden_sum

    ly = cplx.clogcosh(new_cache.y)
    new_lnpsi = _hidden_sum(work, ly) + new_cache.sa
    return new_cache, new_lnpsi, jnp.sum(acc)
