from neural_network_quantum_state_tpu.parallel import mesh
from neural_network_quantum_state_tpu.parallel.mesh import (
    PARAM_AXIS,
    constrain_o_mat,
    make_mesh_tp,
    o_mat_spec,
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
    "PARAM_AXIS",
    "constrain_o_mat",
    "make_mesh_tp",
    "o_mat_spec",
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
