"""Device-mesh utilities: walker-axis data parallelism.

The reference's only scaling axis is walker parallelism (OpenMP threads /
CUDA blocks on one device - SURVEY.md 2.7; it has no multi-device layer).
Here the walker axis shards over a ``jax.sharding.Mesh``; parameters and
SR vectors stay replicated. Inside jit, XLA turns the walker-axis
contractions (energy mean, aO, F, CG matvec partial sums) into psum-style
collectives over ICI - O(V) traffic per CG iteration, nothing else crosses
devices.

Multi-slice (pod / DCN) layout: ``make_mesh_2d`` builds a 2D
(slice, walkers) mesh and the walker axis shards over BOTH axes
(P(("slice", "walkers"))), so XLA emits hierarchical reductions - a fast
all-reduce within each slice's ICI domain, then one small cross-slice
reduction over DCN per contraction. Every helper here derives the sharding
spec from ``mesh.axis_names``, so 1D meshes behave exactly as before.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

WALKER_AXIS = "walkers"
SLICE_AXIS = "slice"
PARAM_AXIS = "params"


def make_mesh(n_devices: int | None = None, axis_name: str = WALKER_AXIS) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def make_mesh_2d(
    n_slices: int,
    n_per_slice: int | None = None,
    axis_names: tuple[str, str] = (SLICE_AXIS, WALKER_AXIS),
) -> Mesh:
    """(n_slices, n_per_slice) mesh for multi-slice pods: the leading axis
    enumerates ICI domains (slices, connected by DCN), the trailing axis the
    chips within a slice. Walker sharding spans both axes (walker_axes), so
    per-sample work never crosses DCN and reductions are hierarchical."""
    devices = jax.devices()
    if n_per_slice is None:
        n_per_slice = len(devices) // n_slices
    devices = devices[: n_slices * n_per_slice]
    return Mesh(np.asarray(devices).reshape(n_slices, n_per_slice), axis_names)


def make_mesh_tp(
    n_walker_devices: int,
    n_param_devices: int,
    axis_names: tuple[str, str] = (WALKER_AXIS, PARAM_AXIS),
) -> Mesh:
    """(walkers, params) mesh for parameter-sharded SR at very large V
    (SURVEY.md 2.7 'optional parameter-sharded matvec (TP)'): sampling
    data-parallelizes over BOTH axes (every axis carries walkers - the
    sweep is embarrassingly parallel), then the SR solve reshards the
    (K, V) log-derivative matrix to walkers x params tiles so each CG
    matvec is a 2D-blocked GEMM pair - O(K/d_w * V/d_p) memory per device
    instead of O(K/d * V), with psum reductions over the contracted axis."""
    devices = jax.devices()[: n_walker_devices * n_param_devices]
    return Mesh(np.asarray(devices).reshape(n_walker_devices, n_param_devices), axis_names)


def walker_axes(mesh: Mesh) -> tuple[str, ...]:
    """Every mesh axis carries walkers for SAMPLING (1D: ("walkers",); 2D
    multi-slice: ("slice", "walkers"); TP: ("walkers", "params") - the
    sweep is per-walker, so maximal data parallelism is always right).
    The SR solve separately reshards o_mat via o_mat_spec."""
    return tuple(mesh.axis_names)


def o_mat_spec(mesh: Mesh) -> P:
    """PartitionSpec for the (K, V) log-derivative matrix in the SR solve:
    with a PARAM_AXIS in the mesh, walkers over the non-param axes and V
    over the param axis (2D-blocked matvecs); otherwise walker-sharded
    rows with V replicated."""
    w_axes = tuple(a for a in mesh.axis_names if a != PARAM_AXIS)
    if PARAM_AXIS in mesh.axis_names:
        return P(w_axes, PARAM_AXIS)
    return P(w_axes)


def constrain_o_mat(x: Any, mesh: Mesh | None):
    """with_sharding_constraint for (K, V) o_mat leaves per o_mat_spec;
    no-op if mesh is None."""
    if mesh is None:
        return x
    spec = o_mat_spec(mesh)

    def one(leaf):
        return jax.lax.with_sharding_constraint(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(one, x)


def walker_sharding(mesh: Mesh, axis_name: str | None = None) -> NamedSharding:
    spec = P(axis_name) if axis_name is not None else P(walker_axes(mesh))
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_walker_tree(tree: Any, mesh: Mesh, n_walkers: int, axis_name: str | None = None) -> Any:
    """device_put a pytree: leaves with leading dim == n_walkers shard on the
    walker axis (all mesh axes), everything else replicates."""
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


def constrain_walkers(x: Any, mesh: Mesh | None, axis_name: str | None = None):
    """with_sharding_constraint on the leading (walker) axis of every array
    leaf (pytrees like split-complex C pairs recurse); no-op if mesh is None."""
    if mesh is None:
        return x
    axes = axis_name if axis_name is not None else walker_axes(mesh)

    def one(leaf):
        spec = P(axes, *([None] * (leaf.ndim - 1)))
        return jax.lax.with_sharding_constraint(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(one, x)
