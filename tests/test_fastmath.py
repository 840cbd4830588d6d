"""Accuracy of the polynomial f32 transcendentals used in Pallas kernels."""

import jax.numpy as jnp
import numpy as np

from neural_network_quantum_state_tpu.ops.fastmath import (
    fast_cos,
    fast_exp_nonpos,
    fast_log_pos,
)


def test_fast_cos_accuracy():
    # polynomial error < 5e-7 near the origin; at larger |x| the f32
    # range reduction costs ~|x| * eps (inherent to single precision)
    x = np.linspace(-3.2, 3.2, 100001).astype(np.float32)
    got = np.asarray(fast_cos(jnp.asarray(x)))
    np.testing.assert_allclose(got, np.cos(x.astype(np.float64)), atol=5e-7)
    x = np.linspace(-50.0, 50.0, 200001).astype(np.float32)
    got = np.asarray(fast_cos(jnp.asarray(x)))
    np.testing.assert_allclose(got, np.cos(x.astype(np.float64)), atol=1e-5)


def test_fast_exp_nonpos_accuracy():
    t = -np.concatenate(
        [np.linspace(0.0, 60.0, 100001), 10.0 ** np.linspace(-8, 1.5, 1000)]
    ).astype(np.float32)
    got = np.asarray(fast_exp_nonpos(jnp.asarray(t)))
    expect = np.exp(t.astype(np.float64))
    np.testing.assert_allclose(got, expect, rtol=4e-7, atol=1e-38)


def test_fast_log_pos_accuracy():
    v = np.concatenate(
        [np.linspace(1e-6, 4.0, 100001)[1:], 10.0 ** np.linspace(-30, 1, 1000)]
    ).astype(np.float32)
    got = np.asarray(fast_log_pos(jnp.asarray(v)))
    expect = np.log(v.astype(np.float64))
    # absolute error ~ eps * |log v|; near v=1 log->0 so use atol too
    np.testing.assert_allclose(got, expect, rtol=2e-6, atol=4e-7)


def test_fast_log_exp_roundtrip_logcosh_range():
    """The kernel's actual composition: log(1 + e^2 + 2 e cos(2y))."""
    rng = np.random.default_rng(0)
    x = rng.normal(size=20000).astype(np.float32) * 3
    y = rng.normal(size=20000).astype(np.float32) * 10
    e = np.asarray(fast_exp_nonpos(jnp.asarray(-2.0 * np.abs(x))))
    mag2 = 1.0 + e * e + 2.0 * e * np.asarray(fast_cos(jnp.asarray(2.0 * y)))
    got = 0.5 * np.asarray(fast_log_pos(jnp.asarray(mag2))) + np.abs(x) - np.log(2.0)
    expect = np.real(np.log(np.cosh(x.astype(np.float64) + 1j * y.astype(np.float64))))
    # away from the cosh zeros (x ~ 0, y ~ pi/2 mod pi) the composition is
    # accurate to f32 roundoff; at the zeros the |cosh|^2 cancellation costs
    # accuracy in ANY f32 formulation (lnpsi -> -inf there; such proposals
    # are rejected), so only a loose bound applies globally.
    tight = mag2 > 0.1
    assert tight.mean() > 0.9
    np.testing.assert_allclose(got[tight], expect[tight], atol=5e-5)
    np.testing.assert_allclose(got, expect, atol=5e-3)
