from neural_network_quantum_state_tpu.parallel import mesh
from neural_network_quantum_state_tpu.parallel.mesh import (
    SLICE_AXIS,
    WALKER_AXIS,
    constrain_walkers,
    make_mesh,
    make_mesh_2d,
    replicated,
    shard_walker_tree,
    walker_axes,
    walker_sharding,
)

__all__ = [
    "SLICE_AXIS",
    "WALKER_AXIS",
    "constrain_walkers",
    "make_mesh",
    "make_mesh_2d",
    "mesh",
    "replicated",
    "shard_walker_tree",
    "walker_axes",
    "walker_sharding",
]
