"""Counter-based parallel RNG utilities.

The reference gives each Markov chain an independent TRNG4 yarn2 stream via
block splitting: ``seed(n); jump(2*seedDistance*k)`` per chain k
(cpu/include/impl_mcmc_sampler.hpp:18-24, gpu trng4cuda.cuh:40-53).

JAX's threefry is already counter-based: a single key plus shape produces
decorrelated streams, and sampling a (steps, K) block gives every chain an
independent sequence - the same contract with no jump bookkeeping. These
helpers centralize key handling so samplers stay pure.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def uniform_block(key: jax.Array, shape: tuple[int, ...], dtype=jnp.float32) -> jax.Array:
    """U[0,1) block, e.g. (n_steps, K) accept draws for a sweep."""
    return jax.random.uniform(key, shape, dtype=dtype)


def random_spins(key: jax.Array, n_walkers: int, n_sites: int, dtype=jnp.float32) -> jax.Array:
    """Random {-1,+1} spin states (GPU generate_random_binary_dist analogue)."""
    bits = jax.random.bernoulli(key, 0.5, (n_walkers, n_sites))
    return jnp.where(bits, 1.0, -1.0).astype(dtype)


def split_for_step(key: jax.Array, step: jax.Array | int) -> jax.Array:
    """Derive a per-step key without threading splits through host code."""
    return jax.random.fold_in(key, step)
