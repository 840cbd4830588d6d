"""logcosh stability/accuracy tests (SURVEY.md 4 test plan item 1)."""

import jax.numpy as jnp
import numpy as np

from neural_network_quantum_state_tpu.ops.logcosh import logcosh, logcosh_ri, tanh_ri


def test_logcosh_matches_naive_moderate(rng):
    z = rng.normal(size=200) + 1j * rng.normal(size=200)
    got = np.asarray(logcosh(jnp.asarray(z)))
    want = np.log(np.cosh(z))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_logcosh_large_real_no_overflow():
    z = jnp.asarray([500.0 + 0.3j, -500.0 + 0.3j, 1e4 + 1.0j, -1e4 - 2.0j])
    got = np.asarray(logcosh(z))
    assert np.all(np.isfinite(got))
    # asymptotic: ln cosh z ~ |x| - ln 2 + i*y*sgn(x)  (mod pi wrapping)
    want_re = np.abs(z.real) - np.log(2.0)
    np.testing.assert_allclose(got.real, want_re, rtol=1e-12)


def test_logcosh_ri_matches_complex(rng):
    x = rng.normal(size=100) * 10
    y = rng.normal(size=100) * 3
    re, im = logcosh_ri(jnp.asarray(x), jnp.asarray(y))
    want = np.log(np.cosh(x + 1j * y))
    np.testing.assert_allclose(np.asarray(re), want.real, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(im), want.imag, rtol=1e-10, atol=1e-12)


def test_tanh_ri(rng):
    x = rng.normal(size=100) * 20
    y = rng.normal(size=100) * 3
    re, im = tanh_ri(jnp.asarray(x), jnp.asarray(y))
    want = np.tanh(x + 1j * y)
    np.testing.assert_allclose(np.asarray(re), want.real, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(im), want.imag, rtol=1e-10, atol=1e-12)


def test_logcosh_even():
    z = jnp.asarray([1.2 + 0.7j, -3.0 + 2.0j, 0.1 - 0.2j])
    np.testing.assert_allclose(np.asarray(logcosh(z)), np.asarray(logcosh(-z)), rtol=1e-12)
