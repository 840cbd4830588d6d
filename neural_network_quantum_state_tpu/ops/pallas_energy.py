"""Fused local-energy off-diagonal kernel (Pallas TPU).

The transverse-field term sum_i exp(lnpsi(flip_i s) - lnpsi(s)) is the
reference's per-estimate hot loop (N machine forwards,
gpu impl_hamiltonians.cuh:234-238). This kernel keeps each walker block's
y/spins/sa/lnpsi resident in VMEM and loops the N sites on-chip; Mosaic has
no atan/atan2, so Im ln cosh uses a range-reduced minimax polynomial atan
(|err| ~1e-6 rad). RBM-family machines (c = None); both Re and Im of the
ratios are produced (the local energy is complex).

Measured on v5e at N=64/H=256/K=8192: 8.5 ms vs 6.8 ms for the XLA chunked
path (hamiltonians.ising._offdiag_sum) - the computation is VPU
*transcendental*-bound (exp/log/cos/sin/atan per element), not
HBM-bandwidth-bound, so VMEM residency does not pay at these shapes and the
XLA path stays the default. The kernel is kept (validated to 5e-7 relative)
for bandwidth-bound regimes (very large H) and as the basis for a future
fused sweep+energy kernel.
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


def _logcosh_both(x, y):
    """(Re, Im) of ln cosh(x+iy), stable, atan2-free Mosaic ops only.

    cos/sin are the polynomial ops.fastmath versions (TPU's library
    versions pay full Payne-Hanek range reduction; measured 2.1x on the
    analogous sweep kernel); exp/log stay native - the VPU lowers them
    near-free and polynomial replacements measured slower."""
    absx = jnp.abs(x)
    sgn = jnp.where(x < 0, -1.0, 1.0).astype(x.dtype)
    e = jnp.exp(-2.0 * absx)
    wre = (1.0 + e) * fast_cos(y)
    wim = (1.0 - e) * fast_sin(y) * sgn
    re = 0.5 * jnp.log(wre * wre + wim * wim) + (absx - _LN2)
    im = _atan2(wim, wre)
    return re, im


def _energy_kernel(
    sched_ref,  # (n_sites,) int32 scalar-prefetch (site list)
    wre_ref,
    wim_ref,  # (N, H)
    are_ref,
    aim_ref,  # (N, 1)
    spins_ref,  # (N, BK) transposed
    yre_ref,
    yim_ref,  # (BK, H)
    sare_ref,
    saim_ref,  # (BK, 1)
    ore_ref,
    oim_ref,  # (BK, 1) outputs: sum_i exp(ln1_i - ln0)
):
    n_sites = sched_ref.shape[0]
    ore_ref[:] = jnp.zeros_like(ore_ref)
    oim_ref[:] = jnp.zeros_like(oim_ref)
    # ln psi_0 recomputed IN-KERNEL (one amortized (BK,H) pass) rather than
    # taken from the XLA-computed lnpsi input: the ratio ln1 - ln0 must mix
    # a single logcosh implementation, else the TPU library-vs-polynomial
    # transcendental difference accumulates over H without cancelling
    # (observed 7e-4 -> 4e-5 relative on the N=64 off-diagonal sum).
    l0re, l0im = _logcosh_both(yre_ref[:], yim_ref[:])
    ln0re = jnp.sum(l0re, axis=1, keepdims=True) + sare_ref[:]
    ln0im = jnp.sum(l0im, axis=1, keepdims=True) + saim_ref[:]

    def body(t, _):
        site = sched_ref[t]
        srow = spins_ref[pl.ds(site, 1), :]  # (1, BK)
        two_s = 2.0 * jnp.transpose(srow)  # (BK, 1)
        wr = wre_ref[pl.ds(site, 1), :]  # (1, H)
        wi = wim_ref[pl.ds(site, 1), :]
        y1re = yre_ref[:] - two_s * wr
        y1im = yim_ref[:] - two_s * wi
        lyre, lyim = _logcosh_both(y1re, y1im)
        ln1re = jnp.sum(lyre, axis=1, keepdims=True)
        ln1im = jnp.sum(lyim, axis=1, keepdims=True)
        ar = are_ref[pl.ds(site, 1), :]
        ai = aim_ref[pl.ds(site, 1), :]
        dre = ln1re + sare_ref[:] - two_s * ar - ln0re
        dim = ln1im + saim_ref[:] - two_s * ai - ln0im
        mag = jnp.exp(dre)
        ore_ref[:] = ore_ref[:] + mag * jnp.cos(dim)
        oim_ref[:] = oim_ref[:] + mag * jnp.sin(dim)
        return 0

    jax.lax.fori_loop(0, n_sites, body, 0)


@functools.partial(jax.jit, static_argnames=("block_k", "interpret"))
def pallas_offdiag_sum(
    work: Work,
    cache: Cache,
    lnpsi: C,
    sites: jnp.ndarray,
    block_k: int = 1024,
    interpret: bool = False,
) -> C:
    """sum_i exp(lnpsi(flip_i s) - lnpsi(s)) over `sites` -> C (K,).

    Drop-in fused replacement for the XLA chunked path in
    hamiltonians.ising._offdiag_sum (RBM-family machines, float32).
    ``lnpsi`` is accepted for signature parity but the reference value is
    recomputed in-kernel (see _energy_kernel) so both sides of the ratio
    use one logcosh implementation.
    """
    del lnpsi
    k, n = cache.spins.shape
    h = work.w.re.shape[1]
    assert cache.spins.dtype == jnp.float32, "pallas energy kernel is float32-only"
    assert work.c is None, "pallas energy kernel supports c=None (RBM-family) machines"
    # x64 mode makes BlockSpec index maps emit i64, which Mosaic cannot
    # legalize (see ops.pallas_sweep); all values here are explicit f32/int32
    with jax.enable_x64(False):
        return _pallas_offdiag_body(work, cache, sites, block_k, interpret, k, n, h)


def _pallas_offdiag_body(work, cache, sites, block_k, interpret, k, n, h):
    block_k = min(block_k, k)
    assert k % block_k == 0
    n_blocks = k // block_k

    a = work.a if work.a is not None else cplx.zeros((n,), jnp.float32)

    state_spec = lambda cols: pl.BlockSpec((block_k, cols), lambda i, *_: (i, 0), memory_space=pltpu.VMEM)
    spins_spec = pl.BlockSpec((n, block_k), lambda i, *_: (0, i), memory_space=pltpu.VMEM)
    fixed_spec = lambda rows, cols: pl.BlockSpec((rows, cols), lambda i, *_: (0, 0), memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            fixed_spec(n, h),
            fixed_spec(n, h),
            fixed_spec(n, 1),
            fixed_spec(n, 1),
            spins_spec,
            state_spec(h),
            state_spec(h),
            state_spec(1),
            state_spec(1),
        ],
        out_specs=[state_spec(1), state_spec(1)],
    )

    ore, oim = pl.pallas_call(
        _energy_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((k, 1), jnp.float32),
            jax.ShapeDtypeStruct((k, 1), jnp.float32),
        ],
        interpret=pltpu.InterpretParams() if interpret else False,
    )(
        jnp.asarray(sites, jnp.int32),
        work.w.re,
        work.w.im,
        a.re.reshape(n, 1),
        a.im.reshape(n, 1),
        cache.spins.T,
        cache.y.re,
        cache.y.im,
        cache.sa.re.reshape(k, 1),
        cache.sa.im.reshape(k, 1),
    )
    return C(ore[:, 0], oim[:, 0])
