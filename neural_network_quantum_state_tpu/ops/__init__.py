from neural_network_quantum_state_tpu.ops import cplx, engine, logcosh, rng
from neural_network_quantum_state_tpu.ops.cplx import C
from neural_network_quantum_state_tpu.ops.engine import (
    Cache,
    Work,
    all_flip_log_psi,
    commit_flip,
    commit_flip2_per_walker,
    flip2_log_psi_per_walker,
    flip_log_psi,
    flip_log_psi_per_walker,
    full_forward,
    log_psi,
)
from neural_network_quantum_state_tpu.ops.logcosh import logcosh as logcosh_fn
from neural_network_quantum_state_tpu.ops.logcosh import logcosh_ri, tanh_ri

__all__ = [
    "C",
    "Cache",
    "cplx",
    "Work",
    "all_flip_log_psi",
    "commit_flip",
    "commit_flip2_per_walker",
    "engine",
    "flip2_log_psi_per_walker",
    "flip_log_psi",
    "flip_log_psi_per_walker",
    "full_forward",
    "log_psi",
    "logcosh",
    "logcosh_fn",
    "logcosh_ri",
    "rng",
    "tanh_ri",
]
