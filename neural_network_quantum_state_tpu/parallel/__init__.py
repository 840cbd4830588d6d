from neural_network_quantum_state_tpu.parallel import mesh
from neural_network_quantum_state_tpu.parallel.mesh import (
    WALKER_AXIS,
    constrain_walkers,
    make_mesh,
    replicated,
    shard_walker_tree,
    walker_sharding,
)

__all__ = [
    "WALKER_AXIS",
    "constrain_walkers",
    "make_mesh",
    "mesh",
    "replicated",
    "shard_walker_tree",
    "walker_sharding",
]
