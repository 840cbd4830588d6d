"""Fused Kawasaki pair-exchange sweep as a single Pallas TPU kernel.

The XLA-scan exchange sampler (sampler.kawasaki) pays per-proposal
per-walker dynamic gathers (spins[k, i_k], W[i_k, :]) that XLA lowers to
slow scatter/gather sequences and round-trips the (K,H) hidden
pre-activations through HBM every step - the one remaining XLA-scan-only
hot loop after round 2 (~25 ms/iter at L=8; the reference gives Kawasaki a
dedicated 3-kernel CUDA set, gpu/include/impl_kawasaki_updater.cuh:7-130).

TPU-native redesign - NO dynamic indexing at all. Every per-walker dynamic
choice becomes a small MXU matmul against a static matrix:

- active-bond mask   act  = (P0 s) * (P1 s) < 0          (P0/P1: static
  one-hot bond-endpoint selectors, (B, N))
- inverse-CDF select cs   = LT @ act                      (LT: static
  lower-triangular ones, (B, B) - the running sum as a matmul)
- chosen-bond onehot oh   = act * [cs == target+1]        (elementwise)
- pair flip mask     flip = Fm @ oh                       (Fm = (P0+P1)^T,
  (N, B) - scatters the bond back onto its two sites)
- amplitude update   dy   = -2 * (flip*s)^T @ W           ((BK,N)x(N,H)
  MXU contraction: each walker picks up exactly its two W rows)

The whole multi-sweep proposal loop runs on-chip with y/spins/sa/lnre
resident in VMEM, like ops.pallas_sweep (the single-flip kernel); accept
draws come from the per-core hardware PRNG (counter-hash in interpret
mode). Proposal/accept maths mirrors sampler.kawasaki exactly
(get_indexes_of_spin_pairs inverse CDF, kawasaki_updater.hpp:63-71; accept
prob min(1, exp(2 Re dln)) with no-active-bond proposals auto-rejected).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from neural_network_quantum_state_tpu.ops import cplx
from neural_network_quantum_state_tpu.ops.cplx import C
from neural_network_quantum_state_tpu.ops.engine import Cache, Work
from neural_network_quantum_state_tpu.ops.pallas_sweep import (
    _INV24,
    _hash_bits,
    _logcosh_both,
    _logcosh_re,
)


def _bond_matrices(bonds: np.ndarray, n: int):
    """Static selector matrices from the (B, 2) bond table."""
    bonds = np.asarray(bonds)
    b = bonds.shape[0]
    p0 = np.zeros((b, n), np.float32)
    p1 = np.zeros((b, n), np.float32)
    p0[np.arange(b), bonds[:, 0]] = 1.0
    p1[np.arange(b), bonds[:, 1]] = 1.0
    lt = np.tril(np.ones((b, b), np.float32))  # inclusive running sum
    fm = (p0 + p1).T.copy()  # (N, B)
    return p0, p1, lt, fm


def _exchange_kernel(
    seed_ref,  # (n_blocks,) int32, scalar-prefetched per-block seeds
    p0_ref,  # (B, N) static one-hot: first bond endpoint
    p1_ref,  # (B, N) static one-hot: second endpoint
    lt_ref,  # (B, B) static lower-triangular ones
    fm_ref,  # (N, B) static (P0+P1)^T
    wre_ref,
    wim_ref,  # (N, H)
    are_ref,
    aim_ref,  # (N, 1) (zeros when no visible bias)
    cre_ref,
    cim_ref,  # (1, H) (ones/zeros when c is None)
    spins_ref,  # (N, BK) in - transposed (walkers on lanes)
    yre_ref,
    yim_ref,  # (BK, H) in
    sare_ref,
    saim_ref,  # (BK, 1) in
    ospins_ref,
    oyre_ref,
    oyim_ref,
    osare_ref,
    osaim_ref,
    olnre_ref,
    oacc_ref,  # (n_blocks, 1) accept counts
    *,
    hash_prng: bool = False,
    has_c: bool = False,
    n_steps: int = 1,
):
    ospins_ref[:] = spins_ref[:]
    oyre_ref[:] = yre_ref[:]
    oyim_ref[:] = yim_ref[:]
    osare_ref[:] = sare_ref[:]
    osaim_ref[:] = saim_ref[:]

    block_seed = seed_ref[pl.program_id(0)]
    if not hash_prng:
        pltpu.prng_seed(block_seed)

    p0 = p0_ref[:]
    p1 = p1_ref[:]
    lt = lt_ref[:]
    fm = fm_ref[:]
    wre = wre_ref[:]
    wim = wim_ref[:]
    are = are_ref[:]
    aim = aim_ref[:]
    cre = cre_ref[:]
    cim = cim_ref[:]
    ones_b = jnp.ones((lt.shape[0], 1), jnp.float32)

    # in-kernel Re ln psi_0: one logcosh flavor across the whole accept
    # chain (see pallas_sweep._sweep_kernel for why)
    if has_c:
        l0re, l0im = _logcosh_both(yre_ref[:], yim_ref[:])
        olnre_ref[:] = jnp.sum(cre * l0re - cim * l0im, axis=1, keepdims=True) + sare_ref[:]
    else:
        olnre_ref[:] = (
            jnp.sum(cre * _logcosh_re(yre_ref[:], yim_ref[:]), axis=1, keepdims=True) + sare_ref[:]
        )

    f32 = jnp.float32
    dot = functools.partial(jax.lax.dot_general, preferred_element_type=f32)
    mm = lambda a, b: dot(a, b, (((1,), (0,)), ((), ())))  # plain (M,K)x(K,N)
    mmT = lambda a, b: dot(a, b, (((0,), (0,)), ((), ())))  # (K,M)^T x (K,N)

    def _uniform(t, shape):
        if hash_prng:
            bits = _hash_bits(block_seed.astype(jnp.uint32), t, shape)
        else:
            bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
        return pltpu.bitcast(bits >> 8, jnp.int32).astype(f32) * _INV24

    def body(t, acc):
        s = ospins_ref[:]  # (N, BK)
        s0 = mm(p0, s)  # (B, BK) spin at first endpoint
        s1 = mm(p1, s)
        act = (s0 * s1 < 0.0).astype(f32)  # anti-aligned = active
        cs = mm(lt, act)  # (B, BK) inclusive running count
        nb = mmT(act, ones_b)  # (BK, 1) active-bond totals
        # inverse-CDF bond choice (get_indexes_of_spin_pairs,
        # kawasaki_updater.hpp:63-71): target = floor(u * nb) in [0, nb-1]
        u_sel = _uniform(2 * t, nb.shape)
        target = jnp.minimum(jnp.floor(u_sel * nb), jnp.maximum(nb - 1.0, 0.0))
        t_row = jnp.transpose(target)  # (1, BK)
        # the (target+1)-th active bond: counts are exact small integers in
        # f32, so the equality test is a +-0.5 window
        oh = act * (jnp.abs(cs - (t_row + 1.0)) < 0.5).astype(f32)  # (B, BK)
        flip = mm(fm, oh)  # (N, BK): 1 on the two chosen sites
        u = flip * s  # (N, BK) signed flip pattern
        dyre = -2.0 * mmT(u, wre)  # (BK, H): each walker's two W rows
        dyim = -2.0 * mmT(u, wim)
        dare = -2.0 * mmT(u, are)  # (BK, 1)
        daim = -2.0 * mmT(u, aim)

        y1re = oyre_ref[:] + dyre
        y1im = oyim_ref[:] + dyim
        if has_c:
            lyre, lyim = _logcosh_both(y1re, y1im)
            ln1re = jnp.sum(cre * lyre - cim * lyim, axis=1, keepdims=True)
        else:
            ln1re = jnp.sum(cre * _logcosh_re(y1re, y1im), axis=1, keepdims=True)
        ln1re = ln1re + osare_ref[:] + dare

        dln = ln1re - olnre_ref[:]  # (BK, 1)
        u_acc = _uniform(2 * t + 1, dln.shape)
        accept = (u_acc < jnp.exp(2.0 * jnp.minimum(dln, 0.0))) & (nb > 0.5)
        mask = accept.astype(f32)  # (BK, 1)

        oyre_ref[:] = oyre_ref[:] + mask * dyre
        oyim_ref[:] = oyim_ref[:] + mask * dyim
        osare_ref[:] = osare_ref[:] + mask * dare
        osaim_ref[:] = osaim_ref[:] + mask * daim
        olnre_ref[:] = jnp.where(accept, ln1re, olnre_ref[:])
        mask_row = jnp.transpose(mask)  # (1, BK)
        ospins_ref[:] = s * (1.0 - 2.0 * flip * mask_row)
        return acc + jnp.sum(mask)

    acc = jax.lax.fori_loop(0, n_steps, body, jnp.float32(0.0))
    oacc_ref[pl.program_id(0), 0] = acc


@functools.partial(
    jax.jit, static_argnames=("bonds_tuple", "n_steps", "block_k", "interpret")
)
def pallas_exchange_sweeps(
    work: Work,
    cache: Cache,
    lnpsi: C,
    bonds_tuple: tuple,
    seed: jnp.ndarray,
    n_steps: int,
    block_k: int | None = None,
    interpret: bool = False,
):
    """Run n_steps fused pair-exchange proposals; returns (cache, lnpsi,
    n_accepted). bonds_tuple is the hashable ((i, j), ...) bond table
    (static - it parameterizes the kernel's selector matrices)."""
    k, n = cache.spins.shape
    h = work.w.re.shape[1]
    assert cache.spins.dtype == jnp.float32, "pallas exchange sweep is float32-only"
    has_c = work.c is not None
    # x64-proof: trace with x64 off (Mosaic cannot legalize i64 index maps)
    with jax.enable_x64(False):
        return _pallas_exchange_body(
            work, cache, lnpsi, bonds_tuple, seed, n_steps, block_k, interpret, k, n, h, has_c
        )


def _pallas_exchange_body(work, cache, lnpsi, bonds_tuple, seed, n_steps, block_k, interpret, k, n, h, has_c):
    bonds = np.asarray(bonds_tuple, np.int32)
    b = bonds.shape[0]
    p0, p1, lt, fm = _bond_matrices(bonds, n)
    if block_k is None:
        # keep each (BK, H) temporary ~1 MB (see pallas_sweep's sizing)
        bk_cap = max(128, (256 * 1024) // max(1, h))
        block_k = next((c for c in (1024, 512, 256, 128) if c <= bk_cap and k % c == 0), k)
    block_k = min(block_k, k)
    assert k % block_k == 0, (k, block_k)
    n_blocks = k // block_k

    block_seeds = jax.random.randint(
        jax.random.PRNGKey(jnp.asarray(seed, jnp.uint32)), (n_blocks,), 0, 2**31 - 1, jnp.int32
    )

    a = work.a if work.a is not None else cplx.zeros((n,), jnp.float32)
    c = work.c if has_c else C(jnp.ones((h,), jnp.float32), jnp.zeros((h,), jnp.float32))

    state_spec = lambda cols: pl.BlockSpec((block_k, cols), lambda i, *_: (i, 0), memory_space=pltpu.VMEM)
    spins_spec = pl.BlockSpec((n, block_k), lambda i, *_: (0, i), memory_space=pltpu.VMEM)
    fixed_spec = lambda rows, cols: pl.BlockSpec((rows, cols), lambda i, *_: (0, 0), memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            fixed_spec(b, n),  # p0
            fixed_spec(b, n),  # p1
            fixed_spec(b, b),  # lt
            fixed_spec(n, b),  # fm
            fixed_spec(n, h),  # wre
            fixed_spec(n, h),  # wim
            fixed_spec(n, 1),  # are
            fixed_spec(n, 1),  # aim
            fixed_spec(1, h),  # cre
            fixed_spec(1, h),  # cim
            spins_spec,
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
        jax.ShapeDtypeStruct((n, k), jnp.float32),
        jax.ShapeDtypeStruct((k, h), jnp.float32),
        jax.ShapeDtypeStruct((k, h), jnp.float32),
        jax.ShapeDtypeStruct((k, 1), jnp.float32),
        jax.ShapeDtypeStruct((k, 1), jnp.float32),
        jax.ShapeDtypeStruct((k, 1), jnp.float32),
        jax.ShapeDtypeStruct((n_blocks, 1), jnp.float32),
    ]

    outs = pl.pallas_call(
        functools.partial(_exchange_kernel, hash_prng=interpret, has_c=has_c, n_steps=n_steps),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=pltpu.InterpretParams() if interpret else False,
    )(
        block_seeds,
        jnp.asarray(p0),
        jnp.asarray(p1),
        jnp.asarray(lt),
        jnp.asarray(fm),
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
    # recompute the full complex ln psi with the XLA logcosh (see
    # pallas_sweep: downstream consumers mix it with XLA-computed values)
    from neural_network_quantum_state_tpu.ops.engine import _hidden_sum

    ly = cplx.clogcosh(new_cache.y)
    new_lnpsi = _hidden_sum(work, ly) + new_cache.sa
    return new_cache, new_lnpsi, jnp.sum(acc)
