"""Site-visit schedules (sublattice / checkerboard proposal orders).

The reference visits sites through a circular linked list in sublattice
order so that simultaneous proposals across chains never touch interacting
neighbors within one color class: 1D evens-then-odds
(cpu/include/impl_hamiltonians.hpp:22-37), square black/white (:143-168),
triangular 3-coloring (:348-383). Here a schedule is just an int32 array of
site indices, scanned per sweep; the same site is proposed for all walkers
simultaneously (what makes chains vectorizable on TPU).
"""

from __future__ import annotations

import numpy as np


def chain_checkerboard(n: int) -> np.ndarray:
    """1D: even sites then odd sites."""
    return np.concatenate([np.arange(0, n, 2), np.arange(1, n, 2)]).astype(np.int32)


def square_checkerboard(l: int) -> np.ndarray:
    """2D square LxL (site = i*L + j): black (i+j even) then white."""
    i, j = np.meshgrid(np.arange(l), np.arange(l), indexing="ij")
    sites = (i * l + j).ravel()
    color = ((i + j) % 2).ravel()
    return np.concatenate([sites[color == 0], sites[color == 1]]).astype(np.int32)


def triangular_threecolor(l: int) -> np.ndarray:
    """2D sheared-triangular LxL: 3-coloring c = (i + j) mod 3.

    Valid for the neighbor set {(-1,-1),(-1,0),(0,-1),(0,1),(1,0),(1,1)}:
    all neighbor offsets have (di + dj) % 3 != 0.
    """
    i, j = np.meshgrid(np.arange(l), np.arange(l), indexing="ij")
    sites = (i * l + j).ravel()
    color = ((i + j) % 3).ravel()
    return np.concatenate([sites[color == c] for c in range(3)]).astype(np.int32)


def sequential(n: int) -> np.ndarray:
    """Plain 0..N-1 sweep (the measurement-side Sampler4SpinHalf order,
    gpu/include/impl_meas.cuh:5-41)."""
    return np.arange(n, dtype=np.int32)
