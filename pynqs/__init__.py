"""Drop-in alias for the reference's ``pynqs`` python package.

The reference's measurement scripts open with ``from pynqs import sampler``
(/root/reference/python/meas_renyi.py:3, meas_smag.py:3, meas_fidelity.py:3)
against the pybind11 binding ``_pynqs_gpu``. This package re-exports the
TPU backend's compatible surface
(neural_network_quantum_state_tpu.api.sampler) under the same name so those
scripts run verbatim. Reference: python/pynqs/__init__.py:1.
"""

from . import sampler

__all__ = ["sampler"]
