"""Polynomial/bit-twiddling f32 transcendentals for Pallas TPU kernels.

The fused sweep/energy kernels are VPU-transcendental-bound: after the
matvec-free incremental updates, most cycles go to exp/log/cos per hidden
unit.

Measured A/B on v5e (logcosh-magnitude kernel, 8192x256, 256 steps):
library cos is the expensive one (full Payne-Hanek range reduction;
replacing it alone took the kernel 21.4 -> 10.0 ms), while the VPU lowers
exp and log near-natively - the polynomial versions below measured 15-25%
SLOWER than jnp.exp/jnp.log in-kernel. So production kernels use ONLY
fast_cos/fast_sin; fast_exp_nonpos/fast_log_pos are kept (tested,
documented) for backends without fast native exp/log and as range-
restricted references.

The replacements exploit the kernels' restricted input ranges:

- ``fast_cos(x)``: any finite x, |rel err| < 1e-7. Range-reduce to one
  period via t = frac(x/2pi + 1/2) - 1/2 and evaluate a degree-14 even
  polynomial in t (minimax-fitted for cos(2 pi t)).
- ``fast_exp_nonpos(t)``: t <= 0 (the logcosh magnitude e = exp(-2|x|)).
  2^z split z = n + r with n = round(z), r in [-1/2, 1/2]; 2^r by a
  degree-6 Taylor/minimax polynomial and 2^n by integer exponent-field
  construction. Clamped at n = -126 (subnormal range -> 0, which is exact
  enough: e < 1e-38 means logcosh(x) == |x| - ln 2 in f32).
- ``fast_log_pos(v)``: v > 0 normal (the |cosh|^2 magnitude in (0, 4]).
  Exponent/mantissa split via bitcast, sqrt(2) re-centering so
  m in [sqrt2/2, sqrt2), then the atanh series log m = 2s(1 + s^2/3 +
  s^4/5 + s^6/7) with s = (m-1)/(m+1), |s| <= 0.172.

All three use only ops Mosaic lowers on TPU: FMA, floor, bitcast,
integer shift/and/or (no gather, no library transcendentals).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_INV_2PI = 0.15915494309189535
_LN2 = 0.6931471805599453
_LOG2E = 1.4426950408889634


def fast_cos(x):
    """cos(x) for f32 (|err| < 1e-7): frac-based range reduction + even
    minimax polynomial."""
    t = x * _INV_2PI + 0.5
    t = t - jnp.floor(t) - 0.5  # [-0.5, 0.5], cos(2 pi t) == cos(x)
    u = t * t
    p = jnp.float32(-1.4609357670)
    p = p * u + jnp.float32(7.8065988323)
    p = p * u + jnp.float32(-26.406758113)
    p = p * u + jnp.float32(60.242464258)
    p = p * u + jnp.float32(-85.456685347)
    p = p * u + jnp.float32(64.939390112)
    p = p * u + jnp.float32(-19.739208758)
    p = p * u + jnp.float32(0.99999999992)
    return p


_HALF_PI = 1.5707963267948966


def fast_sin(x):
    """sin(x) = cos(x - pi/2), same error profile as fast_cos."""
    return fast_cos(x - _HALF_PI)


def _pow2_int(n):
    """2^n for integer-valued f32 n in [-126, 127], via the exponent field."""
    bits = (n.astype(jnp.int32) + 127) << 23
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


_LN2_HI = 0.693359375  # 0x3f317400: exact in 11 mantissa bits
_LN2_LO = -2.12194440e-4


def fast_exp_nonpos(t):
    """exp(t) for t <= 0, f32, rel err ~2e-7; exp(t) < 2^-126 flushes to 0."""
    n = jnp.floor(t * _LOG2E + 0.5)
    n = jnp.maximum(n, -126.0)
    # Cody-Waite residual in the original domain (q = t - n ln2 without the
    # f32 cancellation of reducing t*log2e directly): |q| <= ln2/2
    q = (t - n * _LN2_HI) - n * _LN2_LO
    # Taylor through degree 6 (tail < 1.3e-7 at |q| = ln2/2)
    p = jnp.float32(1.0 / 720.0)
    p = p * q + jnp.float32(1.0 / 120.0)
    p = p * q + jnp.float32(1.0 / 24.0)
    p = p * q + jnp.float32(1.0 / 6.0)
    p = p * q + jnp.float32(0.5)
    p = p * q + jnp.float32(1.0)
    p = p * q + jnp.float32(1.0)
    return p * _pow2_int(n)


_SQRT2 = 1.4142135623730951


def fast_log_pos(v):
    """log(v) for normal positive f32 v, rel err ~1e-7 (atanh series)."""
    bits = jax.lax.bitcast_convert_type(v, jnp.int32)
    k = ((bits >> 23) & 0xFF) - 127
    m = jax.lax.bitcast_convert_type(
        (bits & 0x007FFFFF) | jnp.int32(0x3F800000), jnp.float32
    )  # [1, 2)
    # re-center so m in [sqrt2/2, sqrt2): halve m / bump k when m >= sqrt2
    big = m >= _SQRT2
    m = jnp.where(big, 0.5 * m, m)
    kf = k.astype(jnp.float32) + big.astype(jnp.float32)
    s = (m - 1.0) / (m + 1.0)  # |s| <= 0.1716
    u = s * s
    p = jnp.float32(1.0 / 7.0)
    p = p * u + jnp.float32(1.0 / 5.0)
    p = p * u + jnp.float32(1.0 / 3.0)
    p = p * u + jnp.float32(1.0)
    return kf * _LN2 + 2.0 * s * p


def _atan_poly(z):
    """atan on [-1, 1]: 11th-order odd minimax polynomial (f32, ~1e-6 rad)."""
    z2 = z * z
    p = jnp.float32(-0.0117212)
    p = p * z2 + jnp.float32(0.05265332)
    p = p * z2 + jnp.float32(-0.11643287)
    p = p * z2 + jnp.float32(0.19354346)
    p = p * z2 + jnp.float32(-0.33262347)
    p = p * z2 + jnp.float32(0.99997726)
    return z * p


_PI = 3.141592653589793
_HALF_PI = 1.5707963267948966


def fast_atan2(b, a):
    """Quadrant-corrected atan2(b, a) from the polynomial atan - Mosaic has
    no atan/atan2 lowering, so Pallas kernels that need Im ln cosh (complex
    output weights / local-energy phases) use this (VPU-only ops)."""
    eps = jnp.float32(1e-30)
    abs_a, abs_b = jnp.abs(a), jnp.abs(b)
    # ratio in [-1,1]: atan(min/max), then reflect
    num = jnp.minimum(abs_a, abs_b)
    den = jnp.maximum(abs_a, abs_b)
    r = num / jnp.maximum(den, eps)
    t = _atan_poly(r)
    t = jnp.where(abs_b > abs_a, _HALF_PI - t, t)  # angle vs +x axis in [0, pi/2]
    t = jnp.where(a < 0, _PI - t, t)
    return jnp.where(b < 0, -t, t)
