"""Split-complex arithmetic: complex tensors as (re, im) pairs.

TPU compute units (MXU/VPU) have no complex registers; the TPU backend used
here rejects complex dtypes outright, and Pallas/Mosaic kernels require
split planes anyway. So the framework's device representation of every
complex quantity is a ``C(re, im)`` pytree pair of real arrays:

- complex GEMMs lower to 3 real MXU matmuls (Karatsuba),
- elementwise transcendentals (exp, tanh, logcosh) use the stable split
  formulas from ops.logcosh,
- ``to_complex``/``from_complex`` convert at the host/test/checkpoint
  boundary only.

C is a NamedTuple, hence automatically a JAX pytree: it threads through
jit/scan/vmap/sharding untouched.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from neural_network_quantum_state_tpu.ops.logcosh import logcosh_ri, tanh_ri


class C(NamedTuple):
    """A complex tensor as separate real/imag planes (same shape, real dtype)."""

    re: jnp.ndarray
    im: jnp.ndarray

    # -- algebra ---------------------------------------------------------
    def __add__(self, o):
        if isinstance(o, C):
            return C(self.re + o.re, self.im + o.im)
        return C(self.re + o, self.im)  # real scalar/array

    def __radd__(self, o):
        return self.__add__(o)

    def __sub__(self, o):
        if isinstance(o, C):
            return C(self.re - o.re, self.im - o.im)
        return C(self.re - o, self.im)

    def __mul__(self, o):
        if isinstance(o, C):
            return C(self.re * o.re - self.im * o.im, self.re * o.im + self.im * o.re)
        return C(self.re * o, self.im * o)  # real scale

    def __rmul__(self, o):
        return self.__mul__(o)

    def __neg__(self):
        return C(-self.re, -self.im)

    def __getitem__(self, idx):
        return C(self.re[idx], self.im[idx])

    # -- shape utils ------------------------------------------------------
    @property
    def shape(self):
        return self.re.shape

    @property
    def dtype(self):
        return self.re.dtype

    def reshape(self, *shape):
        return C(self.re.reshape(*shape), self.im.reshape(*shape))

    def astype(self, dt):
        return C(self.re.astype(dt), self.im.astype(dt))


# ---------------------------------------------------------------------------
def conj(a: C) -> C:
    return C(a.re, -a.im)


def abs2(a: C) -> jnp.ndarray:
    return a.re * a.re + a.im * a.im


def cexp(a: C) -> C:
    e = jnp.exp(a.re)
    return C(e * jnp.cos(a.im), e * jnp.sin(a.im))


def ctanh(a: C) -> C:
    return C(*tanh_ri(a.re, a.im))


def clogcosh(a: C) -> C:
    return C(*logcosh_ri(a.re, a.im))


def zeros(shape, dtype=jnp.float32) -> C:
    return C(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


def zeros_like(a: C) -> C:
    return C(jnp.zeros_like(a.re), jnp.zeros_like(a.im))


def where(mask: jnp.ndarray, a: C, b: C) -> C:
    return C(jnp.where(mask, a.re, b.re), jnp.where(mask, a.im, b.im))


def csum(a: C, axis=None, keepdims=False) -> C:
    return C(jnp.sum(a.re, axis=axis, keepdims=keepdims), jnp.sum(a.im, axis=axis, keepdims=keepdims))


def cmean(a: C, axis=None, keepdims=False) -> C:
    return C(jnp.mean(a.re, axis=axis, keepdims=keepdims), jnp.mean(a.im, axis=axis, keepdims=keepdims))


def repeat(a: C, repeats: int, axis=None) -> C:
    return C(jnp.repeat(a.re, repeats, axis=axis), jnp.repeat(a.im, repeats, axis=axis))


def broadcast_to(a: C, shape) -> C:
    return C(jnp.broadcast_to(a.re, shape), jnp.broadcast_to(a.im, shape))


def rscale(r: jnp.ndarray, a: C) -> C:
    """real * C with explicit operand order (never put a raw array on the
    left of C arithmetic: ndarray.__mul__ would try to array-ify the tuple)."""
    return C(r * a.re, r * a.im)


def concat(parts: list[C], axis=-1) -> C:
    return C(
        jnp.concatenate([p.re for p in parts], axis=axis),
        jnp.concatenate([p.im for p in parts], axis=axis),
    )


def stack(parts: list[C], axis=0) -> C:
    return C(jnp.stack([p.re for p in parts], axis=axis), jnp.stack([p.im for p in parts], axis=axis))


# ---------------------------------------------------------------------------
# matmul family: every complex contraction lowers to real MXU matmuls.
def matmul_rc(s: jnp.ndarray, w: C) -> C:
    """real @ C - 2 real matmuls (the s @ W of every forward pass; spins
    are real so this is cheaper than a general complex GEMM)."""
    return C(s @ w.re, s @ w.im)


def matmul_cr(a: C, b: jnp.ndarray) -> C:
    return C(a.re @ b, a.im @ b)


def matmul_cc(a: C, b: C) -> C:
    """C @ C via Karatsuba: 3 real matmuls instead of 4."""
    p1 = a.re @ b.re
    p2 = a.im @ b.im
    p3 = (a.re + a.im) @ (b.re + b.im)
    return C(p1 - p2, p3 - p1 - p2)


def matmul_conj_t_c(o: C, z: C) -> C:
    """O^H @ z = conj(O).T @ z (the SR matvec's second contraction)."""
    re = o.re.T @ z.re + o.im.T @ z.im
    im = o.re.T @ z.im - o.im.T @ z.re
    return C(re, im)


def cdot(a: C, b: C) -> C:
    """sum(a * b) over last axis for 1D/stacked operands (no conjugation)."""
    return C(
        a.re @ b.re - a.im @ b.im,
        a.re @ b.im + a.im @ b.re,
    )


def vdot_re(a: C, b: C) -> jnp.ndarray:
    """Re <a, b> = Re sum(a * conj(b)) - full contraction to a real scalar."""
    return jnp.sum(a.re * b.re + a.im * b.im)


def norm2(a: C) -> jnp.ndarray:
    """sum |a|^2 over all elements."""
    return jnp.sum(a.re * a.re + a.im * a.im)


# ---------------------------------------------------------------------------
# host/test/checkpoint boundary
def from_complex(z) -> C:
    z = jnp.asarray(z)
    return C(jnp.real(z), jnp.imag(z))


def to_complex(a: C):
    """Device-side complex array (CPU backend only - TPU has no complex
    dtypes; use to_numpy_complex on runtime paths)."""
    import jax

    return jax.lax.complex(a.re, a.im)


def to_numpy_complex(a: C):
    """Host-side complex numpy array - safe on any backend (fetches the two
    real planes and combines on the host)."""
    import numpy as np

    return np.asarray(a.re) + 1j * np.asarray(a.im)
