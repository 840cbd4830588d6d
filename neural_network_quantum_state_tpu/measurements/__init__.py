"""Measurement estimators (reference L7, cpu/include/measurements.hpp,
gpu/include/meas.cuh)."""

from neural_network_quantum_state_tpu.measurements import estimators, fermion
from neural_network_quantum_state_tpu.measurements.fermion import FermionAmplitudeSampler, opdm_pair
from neural_network_quantum_state_tpu.measurements.estimators import (
    correlation_ratio,
    fidelity,
    measure_energy,
    neel_order,
    order_parameter,
    overlap_integral,
    renyi2_entropy,
    spin_x_correlation,
    spin_z_correlation,
    structure_factor_trials,
    spontaneous_magnetization,
)
from neural_network_quantum_state_tpu.measurements.renyi_increment import renyi2_increment
from neural_network_quantum_state_tpu.measurements.sampler import AmplitudeSampler

__all__ = [
    "AmplitudeSampler",
    "FermionAmplitudeSampler",
    "estimators",
    "fermion",
    "correlation_ratio",
    "fidelity",
    "opdm_pair",
    "measure_energy",
    "neel_order",
    "order_parameter",
    "overlap_integral",
    "renyi2_entropy",
    "renyi2_increment",
    "spin_x_correlation",
    "structure_factor_trials",
    "spin_z_correlation",
    "spontaneous_magnetization",
]
