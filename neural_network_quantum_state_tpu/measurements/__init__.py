"""Measurement estimators (reference L7, cpu/include/measurements.hpp,
gpu/include/meas.cuh). Populated incrementally."""

__all__ = []
