"""TPU-native neural-network quantum state (NQS) variational Monte Carlo framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
dkkim1005/Neural_Network_Quantum_State (complex RBM/FFNN ansatze, parallel
Metropolis sampling, stochastic reconfiguration, spin/fermion Hamiltonians,
measurement estimators) built TPU-first:

- walkers are a leading batch axis, shardable over a ``jax.sharding.Mesh``;
- every hot path is a batched GEMM + fused log-cosh elementwise kernel;
- RNG is counter-based threefry (replacing TRNG4 jump streams);
- stochastic reconfiguration is a matrix-free CG whose contractions reduce
  over the walker mesh axis with XLA collectives.

Reference layer map: /root/reference (see SURVEY.md).
"""

from neural_network_quantum_state_tpu import (
    hamiltonians,
    measurements,
    models,
    ops,
    optim,
    parallel,
    sampler,
    utils,
)
from neural_network_quantum_state_tpu.vmc import VMC, VMCConfig

__version__ = "0.1.0"

__all__ = [
    "VMC",
    "VMCConfig",
    "hamiltonians",
    "measurements",
    "models",
    "ops",
    "optim",
    "parallel",
    "sampler",
    "utils",
]
