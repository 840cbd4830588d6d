"""Fused local-energy off-diagonal kernel (Pallas TPU).

The transverse-field term sum_i exp(lnpsi(flip_i s) - lnpsi(s)) is the
reference's per-estimate hot loop (N machine forwards,
gpu impl_hamiltonians.cuh:234-238). This kernel keeps each walker block's
y/spins/sa/lnpsi resident in VMEM and loops the N sites on-chip; Mosaic has
no atan/atan2, so Im ln cosh uses a range-reduced minimax polynomial atan
(|err| ~1e-6 rad). Supports every log-cosh machine: RBM family (c = None)
and FFNN family (complex output weights c, mirroring the reference's
dedicated FFNN kernels, gpu/include/neural_quantum_state.cuh:261-373);
both Re and Im of the ratios are produced (the local energy is complex).

Measured on v5e at N=64/H=256/K=8192: 5.84 ms vs 7.10 ms for the XLA
chunked path (hamiltonians.ising._offdiag_sum) - the default f32-RBM
path. History: the first VMEM-resident version lost to XLA (8.5 vs 6.8 ms,
library cos/sin); polynomial fast_cos/fast_sin made it win (6.5 ms); the
angle-addition identity (see _energy_kernel) shaved it to 5.84 ms.
Validated to ~3e-6 relative against the XLA path.
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
from neural_network_quantum_state_tpu.ops.fastmath import fast_atan2 as _atan2
from neural_network_quantum_state_tpu.ops.fastmath import fast_cos, fast_sin

_LN2 = 0.6931471805599453


def _unit_phase_prod(zre, zim):
    """exp(i * sum_h arg(z_h)) as the product of the normalized z's.

    (BK, H) -> ((BK, 1), (BK, 1)) unit complex, H a power of two. The
    angles themselves are never computed: exp(i*sum arg z) = prod z/|z|
    EXACTLY (the mod-2pi ambiguity of the angle sum is irrelevant because
    the phase only ever enters the local energy through exp(i*...)).
    One native rsqrt per element + a log2(H)-level pairwise complex
    product tree replaces one polynomial atan2 per element.
    """
    inv = jax.lax.rsqrt(zre * zre + zim * zim)
    pre, pim = zre * inv, zim * inv
    h = pre.shape[1]
    while h > 1:
        h //= 2
        ar, ai = pre[:, :h], pim[:, :h]
        br, bi = pre[:, h:], pim[:, h:]
        pre = ar * br - ai * bi
        pim = ar * bi + ai * br
    return pre, pim


def _energy_kernel(
    sched_ref,  # (n_sites,) int32 scalar-prefetch (site list)
    wre_ref,  # (N, H); w_im enters only via the precomputed cos/sin(2 w_im)
    c2w_ref,
    s2w_ref,  # (N, H): cos(2*w_im), sin(2*w_im) precomputed by XLA
    are_ref,
    aim_ref,  # (N, 1)
    c2a_ref,
    s2a_ref,  # (N, 1): cos(2*a_im), sin(2*a_im) precomputed (phase_product)
    cre_ref,
    cim_ref,  # (1, H): output weights (ones/zeros when c is None)
    spins_ref,  # (N, BK) transposed
    yre_ref,
    yim_ref,  # (BK, H)
    sare_ref,
    saim_ref,  # (BK, 1)
    ore_ref,
    oim_ref,  # (BK, 1) outputs: sum_i exp(ln1_i - ln0)
    *,
    has_c: bool = False,
    unroll: int = 1,
    phase_product: bool = False,
):
    n_sites = sched_ref.shape[0]
    ore_ref[:] = jnp.zeros_like(ore_ref)
    oim_ref[:] = jnp.zeros_like(oim_ref)
    # ln psi_0 recomputed IN-KERNEL (one amortized (BK,H) pass) rather than
    # taken from the XLA-computed lnpsi input: the ratio ln1 - ln0 must mix
    # a single logcosh implementation, else the TPU library-vs-polynomial
    # transcendental difference accumulates over H without cancelling
    # (observed 7e-4 -> 4e-5 relative on the N=64 off-diagonal sum).
    #
    # cos/sin of the candidate phase come from the angle-addition identity
    # cos(y - 2sw) = cos y cos 2w + s sin y sin 2w (s = +-1), so the only
    # per-site transcendentals are exp/log/atan2: cy/sy are computed ONCE
    # per walker block and cos(2w)/sin(2w) once per estimate in XLA.
    # Measured 6.24 -> 5.84 ms on v5e (N=64/H=256/K=8192): the win is
    # modest because the loop is not purely transcendental-throughput
    # bound at these shapes; accuracy unchanged (~3e-6 vs the XLA path).
    #
    # FFNN family (has_c): complex output weights rotate both lncosh planes
    # into each of Re/Im ln psi - Re(c*l) = cre*lre - cim*lim,
    # Im(c*l) = cre*lim + cim*lre (reference FFNN local-energy kernel set,
    # gpu/include/neural_quantum_state.cuh:261-373). Both planes are already
    # computed; the extra cost is two fused multiply-adds per hidden unit.
    cre = cre_ref[:]  # (1, H)
    cim = cim_ref[:]

    def _csum(lre, lim):
        """(Re, Im) of sum_j c_j * lncosh_j."""
        if has_c:
            return (
                jnp.sum(cre * lre - cim * lim, axis=1, keepdims=True),
                jnp.sum(cre * lim + cim * lre, axis=1, keepdims=True),
            )
        return (
            jnp.sum(lre, axis=1, keepdims=True),
            jnp.sum(lim, axis=1, keepdims=True),
        )

    x0 = yre_ref[:]
    cy = fast_cos(yim_ref[:])
    sy = fast_sin(yim_ref[:])
    absx0 = jnp.abs(x0)
    sgn0 = jnp.where(x0 < 0, -1.0, 1.0).astype(x0.dtype)
    e0 = jnp.exp(-2.0 * absx0)
    wre0 = (1.0 + e0) * cy
    wim0 = (1.0 - e0) * sy * sgn0
    l0re = 0.5 * jnp.log(wre0 * wre0 + wim0 * wim0) + (absx0 - _LN2)
    if phase_product:
        # phase-accumulator mode (RBM family only): the sa_im / angle sums
        # never materialize - exp(i*dim) is assembled from unit-complex
        # products, so the per-hidden atan2 AND the per-site final cos/sin
        # both disappear. sa terms cancel exactly between ln1 and ln0.
        ln0re = jnp.sum(l0re, axis=1, keepdims=True)
        p0re, p0im = _unit_phase_prod(wre0, wim0)
    else:
        l0im = _atan2(wim0, wre0)
        ln0re, ln0im = _csum(l0re, l0im)
        ln0re = ln0re + sare_ref[:]
        ln0im = ln0im + saim_ref[:]

    def _site_terms(site):
        """(Re, Im) contribution exp(ln1 - ln0) of flipping `site`."""
        srow = spins_ref[pl.ds(site, 1), :]  # (1, BK)
        s_col = jnp.transpose(srow)  # (BK, 1), +-1
        two_s = 2.0 * s_col
        wr = wre_ref[pl.ds(site, 1), :]  # (1, H)
        c2 = c2w_ref[pl.ds(site, 1), :]
        s2 = s2w_ref[pl.ds(site, 1), :]
        y1re = yre_ref[:] - two_s * wr
        # cos/sin(y_im - 2 s w_im) via angle addition (no trig in the loop)
        ss2 = s_col * s2  # (BK, H)
        c1 = cy * c2 + sy * ss2
        s1 = sy * c2 - cy * ss2
        absx1 = jnp.abs(y1re)
        sgn1 = jnp.where(y1re < 0, -1.0, 1.0).astype(y1re.dtype)
        e1 = jnp.exp(-2.0 * absx1)
        wre1 = (1.0 + e1) * c1
        wim1 = (1.0 - e1) * s1 * sgn1
        lyre = 0.5 * jnp.log(wre1 * wre1 + wim1 * wim1) + (absx1 - _LN2)
        ar = are_ref[pl.ds(site, 1), :]
        if phase_product:
            dre = jnp.sum(lyre, axis=1, keepdims=True) - two_s * ar - ln0re
            mag = jnp.exp(dre)
            p1re, p1im = _unit_phase_prod(wre1, wim1)
            # exp(i*dim) = p1 * conj(p0) * exp(-i*2*s*a_im); with s = +-1,
            # cos(2 s a_im) = cos(2 a_im) and sin(2 s a_im) = s*sin(2 a_im)
            xre = p1re * p0re + p1im * p0im
            xim = p1im * p0re - p1re * p0im
            ca = c2a_ref[pl.ds(site, 1), :]  # (1,1) broadcast
            sa = s_col * s2a_ref[pl.ds(site, 1), :]  # (BK,1)
            fre = xre * ca + xim * sa
            fim = xim * ca - xre * sa
            return mag * fre, mag * fim
        lyim = _atan2(wim1, wre1)
        ln1re, ln1im = _csum(lyre, lyim)
        ai = aim_ref[pl.ds(site, 1), :]
        dre = ln1re + sare_ref[:] - two_s * ar - ln0re
        dim = ln1im + saim_ref[:] - two_s * ai - ln0im
        mag = jnp.exp(dre)
        return mag * jnp.cos(dim), mag * jnp.sin(dim)

    # `unroll` independent site flips per loop iteration: unlike the sweep
    # kernel's serial Metropolis chain, every flip evaluates against the SAME
    # base state, so the unrolled chains have no data dependence and Mosaic
    # can software-pipeline their transcendentals (ILP). n_sites % unroll == 0
    # is asserted by the caller.
    def body(t, _):
        acc_re, acc_im = ore_ref[:], oim_ref[:]
        for u in range(unroll):
            tre, tim = _site_terms(sched_ref[t * unroll + u])
            acc_re = acc_re + tre
            acc_im = acc_im + tim
        ore_ref[:] = acc_re
        oim_ref[:] = acc_im
        return 0

    jax.lax.fori_loop(0, n_sites // unroll, body, 0)


@functools.partial(jax.jit, static_argnames=("block_k", "interpret", "unroll", "phase_product"))
def pallas_offdiag_sum(
    work: Work,
    cache: Cache,
    lnpsi: C,
    sites: jnp.ndarray,
    block_k: int = 1024,
    interpret: bool = False,
    unroll: int = 1,
    phase_product: bool = False,
) -> C:
    """sum_i exp(lnpsi(flip_i s) - lnpsi(s)) over `sites` -> C (K,).

    Drop-in fused replacement for the XLA chunked path in
    hamiltonians.ising._offdiag_sum (any log-cosh machine, float32).
    ``lnpsi`` is accepted for signature parity but the reference value is
    recomputed in-kernel (see _energy_kernel) so both sides of the ratio
    use one logcosh implementation. ``unroll`` > 1 evaluates that many
    independent site flips per loop iteration (ILP); the site count must be
    divisible by it. ``phase_product`` replaces the per-hidden polynomial
    atan2 (and the per-site final cos/sin) with a normalized complex
    product tree (see _unit_phase_prod); RBM family (c is None) with a
    power-of-two hidden count only - silently falls back otherwise.
    """
    del lnpsi
    k, n = cache.spins.shape
    h = work.w.re.shape[1]
    assert cache.spins.dtype == jnp.float32, "pallas energy kernel is float32-only"
    assert sites.shape[0] % unroll == 0, (sites.shape[0], unroll)
    has_c = work.c is not None
    if has_c or h & (h - 1) != 0:
        phase_product = False  # angles needed per hidden unit (c rotates
        # both lncosh planes) / product tree needs power-of-two H
    # x64 mode makes BlockSpec index maps emit i64, which Mosaic cannot
    # legalize (see ops.pallas_sweep); all values here are explicit f32/int32
    with jax.enable_x64(False):
        return _pallas_offdiag_body(
            work, cache, sites, block_k, interpret, k, n, h, has_c, unroll,
            phase_product,
        )


def _auto_block_k(block_k: int, k: int, h: int, has_c: bool, unroll: int) -> int:
    """Scoped-VMEM guard on the walker block size.

    The kernel's per-iteration temporaries are ~(block_k, h) f32 arrays;
    complex output weights (has_c: the FFNN family's extra product/atan2
    planes) and ``unroll`` (independent site flips pipelined per iteration)
    multiply how many coexist. Measured on v5e: block 1024 x h=256 fits the
    16 MB scoped-VMEM limit for the RBM case but OOMs with has_c (17.25 MB
    requested). Budget halves per doubling factor; block_k halving keeps
    k % block_k == 0 for power-of-two divisors.
    """
    budget = 1024 * 256  # block_k*h elements that fit with unroll=1, no c
    budget //= (2 if has_c else 1) * max(1, unroll)
    while block_k > 128 and block_k * h > budget and k % (block_k // 2) == 0:
        block_k //= 2
    return block_k


def _pallas_offdiag_body(work, cache, sites, block_k, interpret, k, n, h, has_c=False, unroll=1, phase_product=False):
    block_k = _auto_block_k(min(block_k, k), k, h, has_c, unroll)
    assert k % block_k == 0
    n_blocks = k // block_k

    a = work.a if work.a is not None else cplx.zeros((n,), jnp.float32)
    c = work.c if has_c else C(jnp.ones((h,), jnp.float32), jnp.zeros((h,), jnp.float32))

    state_spec = lambda cols: pl.BlockSpec((block_k, cols), lambda i, *_: (i, 0), memory_space=pltpu.VMEM)
    spins_spec = pl.BlockSpec((n, block_k), lambda i, *_: (0, i), memory_space=pltpu.VMEM)
    fixed_spec = lambda rows, cols: pl.BlockSpec((rows, cols), lambda i, *_: (0, 0), memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            fixed_spec(n, h),
            fixed_spec(n, h),
            fixed_spec(n, h),
            fixed_spec(n, 1),
            fixed_spec(n, 1),
            fixed_spec(n, 1),
            fixed_spec(n, 1),
            fixed_spec(1, h),
            fixed_spec(1, h),
            spins_spec,
            state_spec(h),
            state_spec(h),
            state_spec(1),
            state_spec(1),
        ],
        out_specs=[state_spec(1), state_spec(1)],
    )

    # angle-addition inputs: cos/sin(2 w_im) once per estimate (XLA, native
    # trig; the identity is exact so no logcosh-implementation mixing);
    # cos/sin(2 a_im) likewise for the phase-product visible-bias factor
    c2w, s2w = jnp.cos(2.0 * work.w.im), jnp.sin(2.0 * work.w.im)
    c2a, s2a = jnp.cos(2.0 * a.im), jnp.sin(2.0 * a.im)

    ore, oim = pl.pallas_call(
        functools.partial(
            _energy_kernel, has_c=has_c, unroll=unroll, phase_product=phase_product
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((k, 1), jnp.float32),
            jax.ShapeDtypeStruct((k, 1), jnp.float32),
        ],
        interpret=pltpu.InterpretParams() if interpret else False,
    )(
        jnp.asarray(sites, jnp.int32),
        work.w.re,
        c2w,
        s2w,
        a.re.reshape(n, 1),
        a.im.reshape(n, 1),
        c2a.reshape(n, 1),
        s2a.reshape(n, 1),
        c.re.reshape(1, h),
        c.im.reshape(1, h),
        cache.spins.T,
        cache.y.re,
        cache.y.im,
        cache.sa.re.reshape(k, 1),
        cache.sa.im.reshape(k, 1),
    )
    return C(ore[:, 0], oim[:, 0])
