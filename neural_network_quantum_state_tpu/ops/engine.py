"""Generic batched log-cosh machine engine.

Every ansatz in the reference (RBM, RBMTrSymm, RBMSfSymm, RBMZ2PrSymm, FFNN,
FFNNTrSymm, FFNNSfSymm - cpu/include/neural_quantum_state.hpp:24-247) has the
common functional form

    ln psi(s) = sum_j c_j * logcosh( b_j + sum_i W_ij s_i ) + sum_i a_i s_i

over effective (possibly symmetry-constructed) weights W (N,H), hidden bias
b (H,), visible bias a (N,) and output weights c (H,). RBM-family machines
have c = 1; FFNN-family machines have a = 0 and trainable c = w1o.

This module implements that form *batched over walkers* (leading axis K) with
the O(H)-per-proposal incremental update of the hidden pre-activations

    y'_kj = y_kj - 2 s_ki W_ij          (candidate: flip spin i)

mirroring cpu/include/impl_neural_quantum_state.hpp:137-146 / 329-357. The
walker axis is the only axis that shards across a TPU mesh; N and H stay
on-chip.

State carried through the Metropolis scan (a `Cache`): spins (K,N) real in
{-1,+1}, y (K,H) complex, sa (K,) complex (the visible-bias dot product).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from neural_network_quantum_state_tpu.ops.logcosh import logcosh


class Work(NamedTuple):
    """Effective dense weights of a log-cosh machine (symmetry-expanded)."""

    w: jnp.ndarray  # (N, H) complex
    b: jnp.ndarray  # (H,)  complex
    a: Optional[jnp.ndarray] = None  # (N,) complex, or None (no visible bias)
    c: Optional[jnp.ndarray] = None  # (H,) complex, or None (c_j = 1)


class Cache(NamedTuple):
    """Per-walker machine state threaded through the sampler."""

    spins: jnp.ndarray  # (K, N) real, entries in {-1, +1}
    y: jnp.ndarray  # (K, H) complex pre-activations
    sa: jnp.ndarray  # (K,) complex visible-bias term


def _hidden_sum(work: Work, ly: jnp.ndarray) -> jnp.ndarray:
    """sum_j c_j * ly_kj over the hidden axis."""
    if work.c is None:
        return jnp.sum(ly, axis=-1)
    return ly @ work.c


def full_forward(work: Work, spins: jnp.ndarray) -> tuple[Cache, jnp.ndarray]:
    """From-scratch forward: build the cache and ln psi for all walkers.

    Mirrors RBM::initialize (impl_neural_quantum_state.hpp:107-132): one
    (K,N)x(N,H) GEMM plus the fused log-cosh reduction.
    """
    cdtype = work.w.dtype
    s = spins.astype(work.w.real.dtype)
    y = s.astype(cdtype) @ work.w + work.b
    if work.a is not None:
        sa = s.astype(cdtype) @ work.a
    else:
        sa = jnp.zeros(s.shape[0], cdtype)
    lnpsi = _hidden_sum(work, logcosh(y)) + sa
    return Cache(spins=s, y=y, sa=sa), lnpsi


def log_psi(work: Work, spins: jnp.ndarray) -> jnp.ndarray:
    """Pure fixed-spin ln psi (the GPU 'forward(spinStates, lnpsi)' overload,

    gpu/include/neural_quantum_state.cuh:27 - used by measurements and the
    pynqs-style Python API)."""
    _, lnpsi = full_forward(work, spins)
    return lnpsi


def flip_log_psi(work: Work, cache: Cache, site) -> jnp.ndarray:
    """ln psi of the candidate state with `site` flipped in every walker.

    O(K*H) incremental update (impl_neural_quantum_state.hpp:134-146): no
    state mutation. `site` is a (traced) scalar index shared by all walkers.
    """
    two_s = (2.0 * cache.spins[:, site]).astype(work.w.dtype)  # (K,)
    y1 = cache.y - two_s[:, None] * work.w[site, :]
    lnpsi = _hidden_sum(work, logcosh(y1))
    if work.a is not None:
        return lnpsi + cache.sa - two_s * work.a[site]
    return lnpsi


def flip_log_psi_per_walker(work: Work, cache: Cache, sites: jnp.ndarray) -> jnp.ndarray:
    """ln psi with a *per-walker* flip site (K,) (reference multi-chain
    flip-list overload, impl_neural_quantum_state.hpp:168-186)."""
    k = jnp.arange(cache.spins.shape[0])
    two_s = (2.0 * cache.spins[k, sites]).astype(work.w.dtype)  # (K,)
    y1 = cache.y - two_s[:, None] * work.w[sites, :]
    lnpsi = _hidden_sum(work, logcosh(y1))
    if work.a is not None:
        return lnpsi + cache.sa - two_s * work.a[sites]
    return lnpsi


def flip2_log_psi_per_walker(
    work: Work, cache: Cache, sites1: jnp.ndarray, sites2: jnp.ndarray
) -> jnp.ndarray:
    """ln psi with two per-walker flips (K,) each (pair-exchange proposals of
    the Kawasaki/Hubbard path and sigma^x sigma^x estimators)."""
    k = jnp.arange(cache.spins.shape[0])
    two_s1 = (2.0 * cache.spins[k, sites1]).astype(work.w.dtype)
    two_s2 = (2.0 * cache.spins[k, sites2]).astype(work.w.dtype)
    y1 = cache.y - two_s1[:, None] * work.w[sites1, :] - two_s2[:, None] * work.w[sites2, :]
    lnpsi = _hidden_sum(work, logcosh(y1))
    if work.a is not None:
        return lnpsi + cache.sa - two_s1 * work.a[sites1] - two_s2 * work.a[sites2]
    return lnpsi


def commit_flip(work: Work, cache: Cache, site, accept: jnp.ndarray) -> Cache:
    """Commit the single-site flip on walkers where `accept` is True.

    Branchless masked update of y/sa/spins, matching the in-place update
    order of RBM::spin_flip (impl_neural_quantum_state.hpp:329-357): y and sa
    are updated from the *pre-flip* spin value, then the spin is negated.
    """
    rdtype = cache.spins.dtype
    acc = accept.astype(rdtype)  # (K,)
    two_s = (2.0 * cache.spins[:, site]) * acc  # 0 where rejected
    two_sc = two_s.astype(work.w.dtype)
    y = cache.y - two_sc[:, None] * work.w[site, :]
    sa = cache.sa
    if work.a is not None:
        sa = sa - two_sc * work.a[site]
    spins = cache.spins.at[:, site].multiply(1.0 - 2.0 * acc)
    return Cache(spins=spins, y=y, sa=sa)


def commit_flip2_per_walker(
    work: Work,
    cache: Cache,
    sites1: jnp.ndarray,
    sites2: jnp.ndarray,
    accept: jnp.ndarray,
) -> Cache:
    """Commit per-walker pair flips where accepted (Kawasaki exchange)."""
    rdtype = cache.spins.dtype
    k = jnp.arange(cache.spins.shape[0])
    acc = accept.astype(rdtype)
    two_s1 = (2.0 * cache.spins[k, sites1]) * acc
    two_s2 = (2.0 * cache.spins[k, sites2]) * acc
    c1, c2 = two_s1.astype(work.w.dtype), two_s2.astype(work.w.dtype)
    y = cache.y - c1[:, None] * work.w[sites1, :] - c2[:, None] * work.w[sites2, :]
    sa = cache.sa
    if work.a is not None:
        sa = sa - c1 * work.a[sites1] - c2 * work.a[sites2]
    spins = cache.spins.at[k, sites1].multiply(1.0 - 2.0 * acc)
    spins = spins.at[k, sites2].multiply(1.0 - 2.0 * acc)
    return Cache(spins=spins, y=y, sa=sa)


def all_flip_log_psi(work: Work, cache: Cache, sites: jnp.ndarray) -> jnp.ndarray:
    """ln psi of *every* single-site flip in `sites` for every walker: (K, n).

    The local-energy hot loop (N machine forwards per estimate,
    gpu impl_hamiltonians.cuh:234-238) collapsed into one batched op:
    y1[k,i,j] = y[k,j] - 2 s[k,i] W[i,j], then fused logcosh + reduction.
    Memory O(K * n * H); callers chunk over `sites` if needed.
    """
    two_s = (2.0 * cache.spins[:, sites]).astype(work.w.dtype)  # (K, n)
    y1 = cache.y[:, None, :] - two_s[:, :, None] * work.w[sites, :][None, :, :]
    ly = logcosh(y1)  # (K, n, H)
    if work.c is None:
        lnpsi = jnp.sum(ly, axis=-1)
    else:
        lnpsi = ly @ work.c
    if work.a is not None:
        lnpsi = lnpsi + cache.sa[:, None] - two_s * work.a[sites][None, :]
    else:
        lnpsi = lnpsi + cache.sa[:, None]
    return lnpsi
