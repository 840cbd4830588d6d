"""Generic batched log-cosh machine engine (split-complex, TPU-native).

Every ansatz in the reference (RBM, RBMTrSymm, RBMSfSymm, RBMZ2PrSymm, FFNN,
FFNNTrSymm, FFNNSfSymm - cpu/include/neural_quantum_state.hpp:24-247) has the
common functional form

    ln psi(s) = sum_j c_j * logcosh( b_j + sum_i W_ij s_i ) + sum_i a_i s_i

over effective (possibly symmetry-constructed) weights W (N,H), hidden bias
b (H,), visible bias a (N,) and output weights c (H,). RBM-family machines
have c = 1; FFNN-family machines have a = 0 and trainable c = w1o.

This module implements that form *batched over walkers* (leading axis K) on
split real/imag planes (ops.cplx.C - TPU has no complex registers) with the
O(H)-per-proposal incremental update of the hidden pre-activations

    y'_kj = y_kj - 2 s_ki W_ij          (candidate: flip spin i)

mirroring cpu/include/impl_neural_quantum_state.hpp:137-146 / 329-357. The
walker axis is the only axis that shards across a TPU mesh; N and H stay
on-chip. Spins are real {-1,+1}, so every forward GEMM is a cheap
real @ split-complex contraction (2 real MXU matmuls).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax.numpy as jnp

from neural_network_quantum_state_tpu.ops import cplx
from neural_network_quantum_state_tpu.ops.cplx import C


class Work(NamedTuple):
    """Effective dense weights of a log-cosh machine (symmetry-expanded)."""

    w: C  # (N, H)
    b: C  # (H,)
    a: Optional[C] = None  # (N,) or None (no visible bias)
    c: Optional[C] = None  # (H,) or None (c_j = 1)


class Cache(NamedTuple):
    """Per-walker machine state threaded through the sampler."""

    spins: jnp.ndarray  # (K, N) real, entries in {-1, +1}
    y: C  # (K, H) pre-activations
    sa: C  # (K,) visible-bias term


def _hidden_sum(work: Work, ly: C) -> C:
    """sum_j c_j * ly_kj over the hidden axis."""
    if work.c is None:
        return cplx.csum(ly, axis=-1)
    return cplx.cdot(ly, work.c)


def full_forward(work: Work, spins: jnp.ndarray) -> tuple[Cache, C]:
    """From-scratch forward: build the cache and ln psi for all walkers.

    Mirrors RBM::initialize (impl_neural_quantum_state.hpp:107-132): one
    real (K,N)x(N,H) GEMM pair plus the fused log-cosh reduction.
    """
    s = spins.astype(work.w.dtype)
    y = cplx.matmul_rc(s, work.w) + work.b
    if work.a is not None:
        sa = C(s @ work.a.re, s @ work.a.im)
    else:
        sa = cplx.zeros(s.shape[0], s.dtype)
    lnpsi = _hidden_sum(work, cplx.clogcosh(y)) + sa
    return Cache(spins=s, y=y, sa=sa), lnpsi


def log_psi(work: Work, spins: jnp.ndarray) -> C:
    """Pure fixed-spin ln psi (the GPU 'forward(spinStates, lnpsi)' overload,
    gpu/include/neural_quantum_state.cuh:27 - used by measurements and the
    pynqs-style Python API)."""
    _, lnpsi = full_forward(work, spins)
    return lnpsi


def flip_log_psi(work: Work, cache: Cache, site) -> C:
    """ln psi of the candidate state with `site` flipped in every walker.

    O(K*H) incremental update (impl_neural_quantum_state.hpp:134-146): no
    state mutation. `site` is a (traced) scalar index shared by all walkers.
    """
    two_s = 2.0 * cache.spins[:, site]  # (K,) real
    wrow = work.w[site, :]  # C (H,)
    y1 = C(
        cache.y.re - two_s[:, None] * wrow.re,
        cache.y.im - two_s[:, None] * wrow.im,
    )
    lnpsi = _hidden_sum(work, cplx.clogcosh(y1))
    if work.a is not None:
        arow = work.a[site]
        return lnpsi + cache.sa + C(-two_s * arow.re, -two_s * arow.im)
    return lnpsi + cache.sa


def flip_log_psi_per_walker(work: Work, cache: Cache, sites: jnp.ndarray) -> C:
    """ln psi with a *per-walker* flip site (K,) (reference multi-chain
    flip-list overload, impl_neural_quantum_state.hpp:168-186)."""
    k = jnp.arange(cache.spins.shape[0])
    two_s = 2.0 * cache.spins[k, sites]  # (K,)
    wrows = work.w[sites, :]  # C (K, H)
    y1 = C(cache.y.re - two_s[:, None] * wrows.re, cache.y.im - two_s[:, None] * wrows.im)
    lnpsi = _hidden_sum(work, cplx.clogcosh(y1))
    if work.a is not None:
        arows = work.a[sites]
        return lnpsi + cache.sa + C(-two_s * arows.re, -two_s * arows.im)
    return lnpsi + cache.sa


def flip2_log_psi_per_walker(work: Work, cache: Cache, sites1: jnp.ndarray, sites2: jnp.ndarray) -> C:
    """ln psi with two per-walker flips (K,) each (pair-exchange proposals of
    the Kawasaki/Hubbard path and sigma^x sigma^x estimators)."""
    k = jnp.arange(cache.spins.shape[0])
    t1 = 2.0 * cache.spins[k, sites1]
    t2 = 2.0 * cache.spins[k, sites2]
    w1, w2 = work.w[sites1, :], work.w[sites2, :]
    y1 = C(
        cache.y.re - t1[:, None] * w1.re - t2[:, None] * w2.re,
        cache.y.im - t1[:, None] * w1.im - t2[:, None] * w2.im,
    )
    lnpsi = _hidden_sum(work, cplx.clogcosh(y1))
    if work.a is not None:
        a1, a2 = work.a[sites1], work.a[sites2]
        return lnpsi + cache.sa + C(-t1 * a1.re - t2 * a2.re, -t1 * a1.im - t2 * a2.im)
    return lnpsi + cache.sa


def commit_flip(work: Work, cache: Cache, site, accept: jnp.ndarray) -> Cache:
    """Commit the single-site flip on walkers where `accept` is True.

    Branchless masked update of y/sa/spins, matching the in-place update
    order of RBM::spin_flip (impl_neural_quantum_state.hpp:329-357): y and sa
    are updated from the *pre-flip* spin value, then the spin is negated.
    """
    rdtype = cache.spins.dtype
    acc = accept.astype(rdtype)  # (K,)
    two_s = (2.0 * cache.spins[:, site]) * acc  # 0 where rejected
    wrow = work.w[site, :]
    y = C(cache.y.re - two_s[:, None] * wrow.re, cache.y.im - two_s[:, None] * wrow.im)
    sa = cache.sa
    if work.a is not None:
        arow = work.a[site]
        sa = C(sa.re - two_s * arow.re, sa.im - two_s * arow.im)
    spins = cache.spins.at[:, site].multiply(1.0 - 2.0 * acc)
    return Cache(spins=spins, y=y, sa=sa)


def commit_flip2_per_walker(
    work: Work, cache: Cache, sites1: jnp.ndarray, sites2: jnp.ndarray, accept: jnp.ndarray
) -> Cache:
    """Commit per-walker pair flips where accepted (Kawasaki exchange)."""
    rdtype = cache.spins.dtype
    k = jnp.arange(cache.spins.shape[0])
    acc = accept.astype(rdtype)
    t1 = (2.0 * cache.spins[k, sites1]) * acc
    t2 = (2.0 * cache.spins[k, sites2]) * acc
    w1, w2 = work.w[sites1, :], work.w[sites2, :]
    y = C(
        cache.y.re - t1[:, None] * w1.re - t2[:, None] * w2.re,
        cache.y.im - t1[:, None] * w1.im - t2[:, None] * w2.im,
    )
    sa = cache.sa
    if work.a is not None:
        a1, a2 = work.a[sites1], work.a[sites2]
        sa = C(sa.re - t1 * a1.re - t2 * a2.re, sa.im - t1 * a1.im - t2 * a2.im)
    spins = cache.spins.at[k, sites1].multiply(1.0 - 2.0 * acc)
    spins = spins.at[k, sites2].multiply(1.0 - 2.0 * acc)
    return Cache(spins=spins, y=y, sa=sa)


def all_flip2_log_psi(work: Work, cache: Cache, sites_a: jnp.ndarray, sites_b: jnp.ndarray) -> C:
    """ln psi for a list of T pair-flips shared across walkers: (K, T).

    The Hubbard hopping estimator's 2(L-1)+1 sequential pair-forwards per
    flavor (gpu impl_hamiltonians.cuh:637-670) collapsed into one batched
    op: y1[k,t,j] = y[k,j] - 2 s[k,a_t] W[a_t,j] - 2 s[k,b_t] W[b_t,j].
    """
    ta = 2.0 * cache.spins[:, sites_a]  # (K, T)
    tb = 2.0 * cache.spins[:, sites_b]
    wa_re, wa_im = work.w.re[sites_a, :], work.w.im[sites_a, :]  # (T, H)
    wb_re, wb_im = work.w.re[sites_b, :], work.w.im[sites_b, :]
    y1 = C(
        cache.y.re[:, None, :] - ta[:, :, None] * wa_re[None] - tb[:, :, None] * wb_re[None],
        cache.y.im[:, None, :] - ta[:, :, None] * wa_im[None] - tb[:, :, None] * wb_im[None],
    )
    ly = cplx.clogcosh(y1)  # (K, T, H)
    if work.c is None:
        lnpsi = cplx.csum(ly, axis=-1)
    else:
        lnpsi = cplx.cdot(ly, work.c)
    lnpsi = lnpsi + C(cache.sa.re[:, None], cache.sa.im[:, None])
    if work.a is not None:
        aa, ab = work.a[sites_a], work.a[sites_b]
        lnpsi = lnpsi + C(
            -ta * aa.re[None, :] - tb * ab.re[None, :],
            -ta * aa.im[None, :] - tb * ab.im[None, :],
        )
    return lnpsi


def all_flip_delta_log_psi(work: Work, cache: Cache, sites: jnp.ndarray, accum_dtype=None) -> C:
    """ln psi(flip_i s) - ln psi(s) for every site in `sites`: (K, n).

    The COMPENSATED form of the flip ratio (round-4 verdict item 6): instead
    of materializing both O(|lnpsi|) ~ O(N) totals and subtracting (a
    catastrophic f32 cancellation - eps * |lnpsi| lands at ~1e-5 absolute
    per term at N=64), the per-hidden-unit differences
    lncosh(y') - lncosh(y) are formed FIRST (each O(|2 s w|), exact to
    f32 eps of a small number) and only then summed - in `accum_dtype`
    (f64) when given. The transcendentals stay f32 (TPU-native); the f64
    work is adds only, so cost is ~2x the plain path's sum stage, nowhere
    near the ~70x of f64-emulated transcendentals. The sa term cancels
    identically and never appears.
    """
    adt = cache.y.re.dtype if accum_dtype is None else jnp.dtype(accum_dtype)
    # transcendentals always evaluate in f32 (TPU-native); when the cache is
    # f64 (widened forward) the linear algebra below stays exact in f64 and
    # ONLY the O(1)-bounded log/atan2 parts round through f32
    rdt = jnp.dtype(jnp.float32)
    two_s = 2.0 * cache.spins[:, sites]  # (K, n) real
    wr = work.w.re[sites, :][None, :, :]
    wi = work.w.im[sites, :][None, :, :]
    t_re = two_s[:, :, None] * wr  # rounding ~ eps * |2w| (small numbers)
    t_im = two_s[:, :, None] * wi
    x0 = cache.y.re[:, None, :].astype(adt)
    v0 = cache.y.im[:, None, :].astype(adt)
    # exact in adt=f64: difference of two f32 values carries no new rounding
    x1 = x0 - t_re.astype(adt)
    v1 = v0 - t_im.astype(adt)
    # |x1| - |x0| exactly in adt - this is the O(|y|) part of
    # lncosh_re = 0.5 log(1 + e^2 + 2 e cos 2y) + |x| - ln2, whose f32
    # REPRESENTATION error (eps * |y| per hidden unit) is what dominates
    # the plain path; it must never be rounded through rdt
    dabs = jnp.abs(x1) - jnp.abs(x0)
    # fold angles into (-pi, pi] in the accumulation dtype BEFORE the f32
    # trig: otherwise the f32 rounding of a large y_im costs eps * |y_im|
    # through cos/sin - the same term the plain path pays. cos/sin are
    # 2pi-periodic and atan2 already returns the principal value, so the
    # fold changes nothing mathematically.
    two_pi = 2.0 * math.pi
    v0_f = v0 - two_pi * jnp.round(v0 * (1.0 / two_pi))
    v1_f = v1 - two_pi * jnp.round(v1 * (1.0 / two_pi))
    x0_r, x1_r = x0.astype(rdt), x1.astype(rdt)
    v0_r, v1_r = v0_f.astype(rdt), v1_f.astype(rdt)

    def _bounded_parts(x, v):
        """(log-magnitude residual, phase) of ln cosh - both O(1)-bounded,
        so rdt evaluation carries only ~eps ABSOLUTE error."""
        absx = jnp.abs(x)
        sgn = jnp.where(x < 0, -1.0, 1.0).astype(x.dtype)
        e = jnp.exp(-2.0 * absx)
        pre = (1.0 + e) * jnp.cos(v)
        pim = (1.0 - e) * jnp.sin(v) * sgn
        lr = 0.5 * jnp.log(pre * pre + pim * pim)
        li = jnp.arctan2(pim, pre)
        return lr, li

    lr1, li1 = _bounded_parts(x1_r, v1_r)
    lr0, li0 = _bounded_parts(x0_r, v0_r)
    dly = C(
        (lr1.astype(adt) - lr0.astype(adt)) + dabs,
        li1.astype(adt) - li0.astype(adt),
    )
    if work.c is None:
        d = cplx.csum(dly, axis=-1)
    else:
        c = C(work.c.re[None, None, :].astype(adt), work.c.im[None, None, :].astype(adt))
        d = cplx.csum(cplx.cmul(dly, c), axis=-1)
    if work.a is not None:
        asel = work.a[sites]
        d = d + C(
            -two_s.astype(adt) * asel.re[None, :].astype(adt),
            -two_s.astype(adt) * asel.im[None, :].astype(adt),
        )
    return d


def all_flip_log_psi(work: Work, cache: Cache, sites: jnp.ndarray) -> C:
    """ln psi of *every* single-site flip in `sites` for every walker: (K, n).

    The local-energy hot loop (N machine forwards per estimate,
    gpu impl_hamiltonians.cuh:234-238) collapsed into one batched op:
    y1[k,i,j] = y[k,j] - 2 s[k,i] W[i,j], then fused logcosh + reduction.
    Memory O(K * n * H); callers chunk over `sites` if needed.
    """
    two_s = 2.0 * cache.spins[:, sites]  # (K, n) real
    wr = work.w.re[sites, :][None, :, :]
    wi = work.w.im[sites, :][None, :, :]
    y1 = C(
        cache.y.re[:, None, :] - two_s[:, :, None] * wr,
        cache.y.im[:, None, :] - two_s[:, :, None] * wi,
    )
    ly = cplx.clogcosh(y1)  # (K, n, H)
    if work.c is None:
        lnpsi = cplx.csum(ly, axis=-1)
    else:
        lnpsi = cplx.cdot(ly, work.c)
    lnpsi = lnpsi + C(cache.sa.re[:, None], cache.sa.im[:, None])
    if work.a is not None:
        asel = work.a[sites]
        lnpsi = lnpsi + C(-two_s * asel.re[None, :], -two_s * asel.im[None, :])
    return lnpsi
