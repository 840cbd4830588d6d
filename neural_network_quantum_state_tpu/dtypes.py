"""Dtype policy helpers.

The reference instantiates every component for ``float``/``double``
(cpu/include/common.hpp:40-42 FloatTypeTrait_). Here a single ``dtype``
argument (``jnp.float32`` or ``jnp.float64``) selects the real dtype; the
matching complex dtype is derived. float64 requires ``jax_enable_x64`` and is
primarily for CPU-based exactness tests; TPU production runs use float32
parameters (optionally bfloat16 matmul inputs inside Pallas kernels).
"""

from __future__ import annotations

import jax.numpy as jnp

_COMPLEX_OF = {
    jnp.dtype("float32"): jnp.dtype("complex64"),
    jnp.dtype("float64"): jnp.dtype("complex128"),
}
_REAL_OF = {v: k for k, v in _COMPLEX_OF.items()}


def complex_dtype(real_dtype) -> jnp.dtype:
    """Complex dtype matching a real dtype (f32 -> c64, f64 -> c128)."""
    dt = jnp.dtype(real_dtype)
    if dt in _REAL_OF:  # already complex
        return dt
    return _COMPLEX_OF[dt]


def real_dtype(dtype) -> jnp.dtype:
    """Real dtype matching a complex dtype (c64 -> f32, c128 -> f64)."""
    dt = jnp.dtype(dtype)
    if dt in _COMPLEX_OF:  # already real
        return dt
    return _REAL_OF[dt]
