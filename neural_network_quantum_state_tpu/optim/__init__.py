from neural_network_quantum_state_tpu.optim import cg, minres, solvers, sr
from neural_network_quantum_state_tpu.optim.cg import CGResult, cg_solve
from neural_network_quantum_state_tpu.optim.minres import (
    MinresResult,
    minres_qlp_solve,
    minres_solve,
    sr_minres_solve,
)
from neural_network_quantum_state_tpu.optim.sr import (
    SRStats,
    energy_and_rsd,
    force_vector,
    lambda_schedule,
    sgd_diag_solve,
    sr_cg_solve,
    sr_dense_solve,
)

__all__ = [
    "CGResult",
    "SRStats",
    "cg",
    "cg_solve",
    "energy_and_rsd",
    "force_vector",
    "lambda_schedule",
    "sgd_diag_solve",
    "solvers",
    "sr",
    "sr_cg_solve",
    "sr_dense_solve",
]
