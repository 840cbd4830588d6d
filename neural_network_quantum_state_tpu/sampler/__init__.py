from neural_network_quantum_state_tpu.sampler import kawasaki, metropolis, schedule, tempering
from neural_network_quantum_state_tpu.sampler.kawasaki import exchange_sweeps, ring_bonds, two_ring_bonds
from neural_network_quantum_state_tpu.sampler.metropolis import MCState, acceptance_ratio, init_state, sweeps

__all__ = [
    "MCState",
    "acceptance_ratio",
    "exchange_sweeps",
    "init_state",
    "kawasaki",
    "metropolis",
    "ring_bonds",
    "schedule",
    "sweeps",
    "two_ring_bonds",
]
