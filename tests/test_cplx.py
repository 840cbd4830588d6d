"""Split-complex arithmetic vs numpy complex oracle."""

import jax.numpy as jnp
import numpy as np

from neural_network_quantum_state_tpu.ops import cplx
from neural_network_quantum_state_tpu.ops.cplx import C


def _rand_c(rng, shape):
    z = rng.normal(size=shape) + 1j * rng.normal(size=shape)
    return z, cplx.from_complex(jnp.asarray(z))


def test_mul_conj_exp_tanh(rng):
    za, a = _rand_c(rng, (5, 7))
    zb, b = _rand_c(rng, (5, 7))
    np.testing.assert_allclose(np.asarray(cplx.to_complex(a * b)), za * zb, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(cplx.to_complex(cplx.conj(a))), np.conj(za), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(cplx.to_complex(cplx.cexp(a))), np.exp(za), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(cplx.to_complex(cplx.ctanh(a))), np.tanh(za), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(cplx.abs2(a)), np.abs(za) ** 2, rtol=1e-12)


def test_matmuls(rng):
    za, a = _rand_c(rng, (4, 6))
    zb, b = _rand_c(rng, (6, 3))
    s = rng.normal(size=(5, 4))
    np.testing.assert_allclose(np.asarray(cplx.to_complex(cplx.matmul_cc(a, b))), za @ zb, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(cplx.to_complex(cplx.matmul_rc(jnp.asarray(s), a))), s @ za, rtol=1e-12)
    zz, z = _rand_c(rng, (4,))
    np.testing.assert_allclose(
        np.asarray(cplx.to_complex(cplx.matmul_conj_t_c(a, z))), np.conj(za).T @ zz, rtol=1e-12
    )
    zv, v = _rand_c(rng, (6,))
    np.testing.assert_allclose(np.asarray(cplx.to_complex(cplx.cdot(a, v))), za @ zv, rtol=1e-12)
    np.testing.assert_allclose(float(cplx.vdot_re(z, z)), float(np.sum(np.abs(zz) ** 2)), rtol=1e-12)


def test_reductions_and_where(rng):
    za, a = _rand_c(rng, (4, 6))
    zb, b = _rand_c(rng, (4, 6))
    np.testing.assert_allclose(np.asarray(cplx.to_complex(cplx.csum(a, axis=0))), za.sum(0), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(cplx.to_complex(cplx.cmean(a, axis=1))), za.mean(1), rtol=1e-12)
    mask = jnp.asarray(rng.random(size=(4, 6)) > 0.5)
    got = cplx.to_complex(cplx.where(mask, a, b))
    want = np.where(np.asarray(mask), za, zb)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-12)
    np.testing.assert_allclose(float(cplx.norm2(a)), float(np.sum(np.abs(za) ** 2)), rtol=1e-12)
