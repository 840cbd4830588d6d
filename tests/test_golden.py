"""Golden-run regression: fixed-seed short training trace (SURVEY.md 4
item 5). Detects silent numerical drift in the sampler/SR pipeline.

The golden values were generated on the CPU backend (f64, 8 virtual
devices) at the commit that introduced this test; exact reproduction is
expected for same-jax-version CPU runs, with a loose tolerance to allow
benign cross-version instruction reordering.
"""

import jax
import jax.numpy as jnp
import numpy as np

import neural_network_quantum_state_tpu as nqs
from neural_network_quantum_state_tpu.hamiltonians import TFIChain
from neural_network_quantum_state_tpu.models import RBM

GOLDEN = None  # filled on first generation; see test body


def _trace():
    machine = RBM(n_inputs=6, n_hiddens=8, dtype=jnp.float64)
    ham = TFIChain(n_sites=6, h=-1.0, j=-1.0)
    cfg = nqs.VMCConfig(n_walkers=128, learning_rate=1e-2, solver="cg", seed=1234)
    vmc = nqs.VMC(machine, ham, cfg)
    params, state = vmc.init()
    state = vmc.warm_up(params, state, 50)
    params, state, hist, _ = vmc.run(params, state, 5)
    return [h["energy"] for h in hist]


def test_fixed_seed_trace_is_deterministic():
    t1 = _trace()
    t2 = _trace()
    np.testing.assert_allclose(t1, t2, rtol=0, atol=0)


def test_golden_trace():
    got = _trace()
    golden = [
        -5.861871562378007,
        -5.818320767213892,
        -5.801606485942823,
        -5.75545818463803,
        -5.805838790458527,
    ]
    # regenerate with: python -c "from tests.test_golden import _trace; print(_trace())"
    np.testing.assert_allclose(got, golden, rtol=5e-4)
