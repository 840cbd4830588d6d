"""Numerically stable complex log-cosh.

The workhorse nonlinearity of every NQS ansatz in the reference
(cpu/include/common.hpp:58-74; gpu impl_neural_quantum_state.cuh:1229-1245).
For z = x + iy:

    ln cosh z = ln( (1+e^{-2|x|}) cos y ,  (1-e^{-2|x|}) sin y * sgn x )
                + |x| - ln 2

which never overflows for large |x| (cosh z ~ e^{|x|}/2).

Implemented on split real/imag planes so the same function serves both the
XLA path (complex inputs) and Pallas kernels (TPU Mosaic has no complex
registers - kernels carry separate real/imag refs).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_LN2 = 0.6931471805599453


def logcosh_ri(x, y):
    """Stable ln cosh(x + iy) on split planes; returns (real, imag)."""
    absx = jnp.abs(x)
    sgn = jnp.where(x < 0, -1.0, 1.0).astype(x.dtype)
    e = jnp.exp(-2.0 * absx)
    re = (1.0 + e) * jnp.cos(y)
    im = (1.0 - e) * jnp.sin(y) * sgn
    # principal-branch complex log on split planes
    mag = 0.5 * jnp.log(re * re + im * im)
    ang = jnp.arctan2(im, re)
    return mag + (absx - _LN2), ang


def logcosh(z):
    """Stable ln cosh z for complex (or real) z."""
    if not jnp.iscomplexobj(z):
        return jnp.logaddexp(z, -z) - _LN2  # real fallback: ln cosh x
    re, im = logcosh_ri(jnp.real(z), jnp.imag(z))
    return jax.lax.complex(re, im)


def tanh_ri(x, y):
    """tanh(x + iy) on split planes; returns (real, imag).

    Stable for large |x|: tanh(x+iy) = (tanh x + i tan y tanh_sech-ish) -
    implemented via sinh/cosh identities with e^{-2|x|} scaling:
        tanh(x+iy) = (sinh 2x + i sin 2y) / (cosh 2x + cos 2y)
    with numerator/denominator scaled by e^{-2|x|} to avoid overflow.
    """
    e = jnp.exp(-2.0 * jnp.abs(x))
    sgn = jnp.where(x < 0, -1.0, 1.0).astype(x.dtype)
    # scaled: e * sinh(2x) = sgn * (1 - e^2)/2 ; e * cosh(2x) = (1 + e^2)/2
    num_re = sgn * 0.5 * (1.0 - e * e)
    num_im = e * jnp.sin(2.0 * y)
    den = 0.5 * (1.0 + e * e) + e * jnp.cos(2.0 * y)
    inv = 1.0 / den
    return num_re * inv, num_im * inv
