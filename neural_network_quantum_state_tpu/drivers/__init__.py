"""CLI drivers (reference L8): parameterized train/measure entry points."""

from neural_network_quantum_state_tpu.drivers import common, measure, train

__all__ = ["common", "measure", "train"]
