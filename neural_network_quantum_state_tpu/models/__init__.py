"""Ansatz registry (reference: Ansatz_<> traits map, cpu/include/common.hpp:6-37)."""

from neural_network_quantum_state_tpu.models.base import Machine, Params
from neural_network_quantum_state_tpu.models.ffnn import FFNN, FFNNSfSymm, FFNNTrSymm
from neural_network_quantum_state_tpu.models.rbm import RBM, RBMSfSymm, RBMTrSymm, RBMZ2PrSymm

REGISTRY = {
    "rbm": RBM,
    "rbmtrsymm": RBMTrSymm,
    "rbmsfsymm": RBMSfSymm,
    "rbmz2prsymm": RBMZ2PrSymm,
    "ffnn": FFNN,
    "ffnntrsymm": FFNNTrSymm,
    "ffnnsfsymm": FFNNSfSymm,
}


def get_machine(name: str, **kwargs) -> Machine:
    """Build a machine by registry name (case-insensitive)."""
    return REGISTRY[name.lower()](**kwargs)


__all__ = [
    "FFNN",
    "FFNNSfSymm",
    "FFNNTrSymm",
    "Machine",
    "Params",
    "RBM",
    "RBMSfSymm",
    "RBMTrSymm",
    "RBMZ2PrSymm",
    "REGISTRY",
    "get_machine",
]
