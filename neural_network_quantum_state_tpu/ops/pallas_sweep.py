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

RNG note: accept draws come from the Pallas per-core PRNG seeded with
(seed, program_id) rather than the host threefry stream - statistically
equivalent, bitwise different from the XLA path.
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
from neural_network_quantum_state_tpu.ops.fastmath import fast_cos

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


def _sweep_kernel(
    sched_ref,  # (n_steps,) int32, scalar-prefetched (SMEM)
    seed_ref,  # (1,) int32, scalar-prefetched
    wre_ref,
    wim_ref,  # (N, H) VMEM, full
    are_ref,
    aim_ref,  # (N, 1) VMEM (zeros when no visible bias)
    cre_ref,
    cim_ref,  # (1, H) VMEM (ones/zeros when c is None)
    spins_ref,  # (N, BK) in - TRANSPOSED: site selection must be on the
    # sublane dim (Mosaic forbids dynamic lane indexing)
    yre_ref,
    yim_ref,  # (BK, H) in
    sare_ref,
    saim_ref,  # (BK, 1) in
    ospins_ref,
    oyre_ref,
    oyim_ref,
    osare_ref,
    osaim_ref,
    olnre_ref,  # outs (aliased shapes)
    oacc_ref,  # (n_blocks, 1) accept counts
):
    n_steps = sched_ref.shape[0]
    # bring state into the output refs; all updates happen in-place there
    ospins_ref[:] = spins_ref[:]
    oyre_ref[:] = yre_ref[:]
    oyim_ref[:] = yim_ref[:]
    osare_ref[:] = sare_ref[:]
    osaim_ref[:] = saim_ref[:]

    pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * 99991)
    cre = cre_ref[:]  # (1, H)
    cim = cim_ref[:]

    # Re ln psi_0 computed IN-KERNEL (not taken from the XLA lnpsi input) so
    # the whole accept chain ln1 - ln0 uses one logcosh implementation - the
    # TPU library-vs-polynomial transcendental difference would otherwise
    # accumulate over H without cancelling. (The accept chain needs only Re;
    # Mosaic has no atan2, so Im ln psi is recomputed outside the kernel.)
    olnre_ref[:] = (
        jnp.sum(cre * _logcosh_re(yre_ref[:], yim_ref[:]), axis=1, keepdims=True) + sare_ref[:]
    )

    def body(t, acc):
        site = sched_ref[t]
        srow = ospins_ref[pl.ds(site, 1), :]  # (1, BK)
        two_s = 2.0 * jnp.transpose(srow)  # (BK, 1) - one per-step relayout
        wr = wre_ref[pl.ds(site, 1), :]  # (1, H)
        wi = wim_ref[pl.ds(site, 1), :]
        y1re = oyre_ref[:] - two_s * wr
        y1im = oyim_ref[:] - two_s * wi
        lyre = _logcosh_re(y1re, y1im)
        # Re of the c-weighted hidden reduction; machines with complex
        # output weights (FFNN) contribute cim * Im(logcosh), computed via
        # the atan-free identity Im lncosh(x+iy) = atan(tanh x * tan y)
        # with quadrant correction folded into a second Re-style term only
        # when cim is nonzero (flagged statically by the caller).
        ln1re = jnp.sum(cre * lyre, axis=1, keepdims=True)
        ar = are_ref[pl.ds(site, 1), :]  # (1, 1)
        ln1re = ln1re + osare_ref[:] - two_s * ar

        dln = ln1re - olnre_ref[:]  # (BK, 1)
        bits = pltpu.bitcast(pltpu.prng_random_bits(dln.shape), jnp.uint32)
        # top 24 bits -> [0,1): shift fits in int32 (Mosaic can't cast u32->f32)
        u = pltpu.bitcast(bits >> 8, jnp.int32).astype(jnp.float32) * _INV24
        accept = u < jnp.exp(2.0 * jnp.minimum(dln, 0.0))
        mask = accept.astype(jnp.float32)  # (BK, 1)

        two_s_m = two_s * mask
        oyre_ref[:] = oyre_ref[:] - two_s_m * wr
        oyim_ref[:] = oyim_ref[:] - two_s_m * wi
        ai = aim_ref[pl.ds(site, 1), :]
        osare_ref[:] = osare_ref[:] - two_s_m * ar
        osaim_ref[:] = osaim_ref[:] - two_s_m * ai
        olnre_ref[:] = jnp.where(accept, ln1re, olnre_ref[:])
        mask_row = jnp.transpose(mask)  # (1, BK)
        ospins_ref[pl.ds(site, 1), :] = srow * (1.0 - 2.0 * mask_row)
        return acc + jnp.sum(mask)

    acc = jax.lax.fori_loop(0, n_steps, body, jnp.float32(0.0))
    # full-array SMEM accumulator: one row per (sequential) grid program
    oacc_ref[pl.program_id(0), 0] = acc


@functools.partial(jax.jit, static_argnames=("n_sweeps", "block_k", "interpret"))
def pallas_sweeps(
    work: Work,
    cache: Cache,
    lnpsi: C,
    schedule: jnp.ndarray,
    seed: jnp.ndarray,
    n_sweeps: int,
    block_k: int | None = None,
    interpret: bool = False,
):
    """Run n_sweeps fused sweeps; returns (cache, lnpsi, n_accepted).

    Supports machines whose hidden reduction is real-weighted (c is None -
    the whole RBM family); FFNN-family machines (complex output weights
    need Im log-cosh in-kernel, which Mosaic's op set can't express without
    atan2) use the XLA sweep instead.
    """
    k, n = cache.spins.shape
    h = work.w.re.shape[1]
    assert cache.spins.dtype == jnp.float32, "pallas sweep is float32-only"
    assert work.c is None, "fused sweep supports c=None (RBM-family) machines"
    if block_k is None:
        # adaptive: keep each (BK, H) VMEM temporary around 1 MB so the
        # kernel's ~8 live (BK, H) arrays fit the 16 MB VMEM budget at any H
        bk_cap = max(128, (256 * 1024) // max(1, h))
        block_k = next((b for b in (1024, 512, 256, 128) if b <= bk_cap and k % b == 0), k)
    block_k = min(block_k, k)
    assert k % block_k == 0, (k, block_k)
    n_blocks = k // block_k

    full_sched = jnp.tile(jnp.asarray(schedule, jnp.int32), n_sweeps)

    a = work.a if work.a is not None else cplx.zeros((n,), jnp.float32)
    c = C(jnp.ones((h,), jnp.float32), jnp.zeros((h,), jnp.float32))

    # index maps receive (grid index, *scalar_prefetch_refs)
    state_spec = lambda cols: pl.BlockSpec((block_k, cols), lambda i, *_: (i, 0), memory_space=pltpu.VMEM)
    spins_spec = pl.BlockSpec((n, block_k), lambda i, *_: (0, i), memory_space=pltpu.VMEM)
    fixed_spec = lambda rows, cols: pl.BlockSpec((rows, cols), lambda i, *_: (0, 0), memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_blocks,),
        in_specs=[
            fixed_spec(n, h),  # wre
            fixed_spec(n, h),  # wim
            fixed_spec(n, 1),  # are
            fixed_spec(n, 1),  # aim
            fixed_spec(1, h),  # cre
            fixed_spec(1, h),  # cim
            spins_spec,  # spins (N, BK), lane-blocked
            state_spec(h),  # yre
            state_spec(h),  # yim
            state_spec(1),  # sare
            state_spec(1),  # saim
        ],
        out_specs=[
            spins_spec,
            state_spec(h),
            state_spec(h),
            state_spec(1),
            state_spec(1),
            state_spec(1),
            pl.BlockSpec((n_blocks, 1), lambda i, *_: (0, 0), memory_space=pltpu.SMEM),
        ],
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

    outs = pl.pallas_call(
        _sweep_kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        # TPU-emulating interpreter (needed for pltpu.prng_* off-TPU)
        interpret=pltpu.InterpretParams() if interpret else False,
    )(
        full_sched,
        jnp.asarray(seed, jnp.int32).reshape((1,)),
        work.w.re,
        work.w.im,
        a.re.reshape(n, 1),
        a.im.reshape(n, 1),
        c.re.reshape(1, h),
        c.im.reshape(1, h),
        cache.spins.T,
        cache.y.re,
        cache.y.im,
        cache.sa.re.reshape(k, 1),
        cache.sa.im.reshape(k, 1),
    )
    spins_t, yre, yim, sare, saim, _lnre, acc = outs
    new_cache = Cache(spins=spins_t.T, y=C(yre, yim), sa=C(sare[:, 0], saim[:, 0]))
    # Full ln psi recomputed from the final cache with the XLA logcosh (one
    # fused elementwise pass): downstream consumers (local energy, SR) mix
    # it with XLA-computed lnpsi1 values, so it must be XLA-flavored; the
    # kernel's running Re-ln-psi is internal to the accept chain.
    ly = cplx.clogcosh(new_cache.y)
    new_lnpsi = C(
        jnp.sum(ly.re, axis=-1) + new_cache.sa.re,
        jnp.sum(ly.im, axis=-1) + new_cache.sa.im,
    )
    return new_cache, new_lnpsi, jnp.sum(acc)
