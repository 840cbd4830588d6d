"""Device-mesh utilities: walker-axis data parallelism.

The reference's only scaling axis is walker parallelism (OpenMP threads /
CUDA blocks on one device - SURVEY.md 2.7; it has no multi-device layer).
Here the walker axis shards over a 1D ``jax.sharding.Mesh``; parameters and
SR vectors stay replicated. Inside jit, XLA turns the walker-axis
contractions (energy mean, aO, F, CG matvec partial sums) into psum-style
collectives over ICI - O(V) traffic per CG iteration, nothing else crosses
devices.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

WALKER_AXIS = "walkers"


def make_mesh(n_devices: int | None = None, axis_name: str = WALKER_AXIS) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def walker_sharding(mesh: Mesh, axis_name: str = WALKER_AXIS) -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_walker_tree(tree: Any, mesh: Mesh, n_walkers: int, axis_name: str = WALKER_AXIS) -> Any:
    """device_put a pytree: leaves with leading dim == n_walkers shard on the
    walker axis, everything else replicates."""
    shard = walker_sharding(mesh, axis_name)
    repl = replicated(mesh)

    def place(x):
        x = jnp.asarray(x)
        if x.ndim >= 1 and x.shape[0] == n_walkers:
            return jax.device_put(x, shard)
        return jax.device_put(x, repl)

    return jax.tree_util.tree_map(place, tree)


def replicate_tree(tree: Any, mesh: Mesh) -> Any:
    """device_put every leaf with the replicated sharding. Use this for
    parameters: shard_walker_tree pattern-matches on leading dim ==
    n_walkers, which silently shards a (N, H) weight matrix over its SITE
    axis whenever N happens to equal the walker count (e.g. the N=64
    flagship measured with 64 walkers)."""
    repl = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(jnp.asarray(x), repl), tree)


def constrain_walkers(x: Any, mesh: Mesh | None, axis_name: str = WALKER_AXIS):
    """with_sharding_constraint on the leading (walker) axis of every array
    leaf (pytrees like split-complex C pairs recurse); no-op if mesh is None."""
    if mesh is None:
        return x

    def one(leaf):
        spec = P(axis_name, *([None] * (leaf.ndim - 1)))
        return jax.lax.with_sharding_constraint(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(one, x)
