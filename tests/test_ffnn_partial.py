"""FFNN hidden-subset training (reference partial_backward /
update_partial_variables parity)."""

import jax
import jax.numpy as jnp
import numpy as np

from neural_network_quantum_state_tpu.models import FFNN
from neural_network_quantum_state_tpu.ops import cplx, engine
from neural_network_quantum_state_tpu.ops.rng import random_spins


def test_partial_grad_matches_full():
    n, m, k = 8, 10, 6
    machine = FFNN(n_inputs=n, n_hiddens=m, dtype=jnp.float64)
    params = machine.init_params(jax.random.PRNGKey(0))
    work = machine.make_work(params)
    spins = random_spins(jax.random.PRNGKey(1), k, n, jnp.float64)
    cache, _ = engine.full_forward(work, spins)

    nodes = [1, 4, 7]
    o_part = machine.grad_log_partial(params, cache, nodes)
    o_full = machine.grad_log(params, cache)
    of = np.asarray(cplx.to_complex(o_full)).reshape(k, -1)
    op = np.asarray(cplx.to_complex(o_part))
    # full layout: wi1 (N,M) row-major, then b1 (M), then w1o (M)
    for ki in range(k):
        want = []
        for j in nodes:  # per-node wi1 columns
            want.extend(of[ki][i * m + j] for i in range(n))
        want.extend(of[ki][n * m + j] for j in nodes)  # b1
        want.extend(of[ki][n * m + m + j] for j in nodes)  # w1o
        np.testing.assert_allclose(op[ki], np.asarray(want), rtol=1e-12)


def test_partial_update_touches_only_subset():
    n, m = 6, 8
    machine = FFNN(n_inputs=n, n_hiddens=m, dtype=jnp.float64)
    params = machine.init_params(jax.random.PRNGKey(2))
    nodes = [0, 5]
    nj = len(nodes)
    dx_size = n * nj + 2 * nj
    dx = cplx.from_complex(jnp.arange(1, dx_size + 1, dtype=jnp.float64) * (1 + 0.5j))
    new = machine.update_params_partial(params, dx, 0.1, nodes)
    # untouched columns identical
    other = np.asarray([j for j in range(m) if j not in nodes])
    np.testing.assert_array_equal(np.asarray(new["wi1"].re)[:, other], np.asarray(params["wi1"].re)[:, other])
    np.testing.assert_array_equal(np.asarray(new["b1"].re)[other], np.asarray(params["b1"].re)[other])
    # touched: theta - lr*dx, with the reference's per-node wi1 ordering
    want_col0 = np.asarray(params["wi1"].re[:, 0]) - 0.1 * np.arange(1, n + 1)
    np.testing.assert_allclose(np.asarray(new["wi1"].re[:, 0]), want_col0, rtol=1e-12)
