from neural_network_quantum_state_tpu.sampler import metropolis, schedule
from neural_network_quantum_state_tpu.sampler.metropolis import MCState, acceptance_ratio, init_state, sweeps

__all__ = ["MCState", "acceptance_ratio", "init_state", "metropolis", "schedule", "sweeps"]
