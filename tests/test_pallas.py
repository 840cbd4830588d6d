"""Pallas fused-sweep kernel: cache-consistency in TPU-interpret mode.

The interpreter's pltpu.prng_random_bits returns zeros (all proposals
accepted), so distribution/acceptance behavior is validated on real TPU
hardware (see .claude/skills/verify + bench.py); here we check that the
kernel's incremental y/sa/spins/lnpsi updates agree with a from-scratch
forward after hundreds of committed flips.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_network_quantum_state_tpu.models import RBM, RBMTrSymm, RBMZ2PrSymm
from neural_network_quantum_state_tpu.ops import cplx, engine
from neural_network_quantum_state_tpu.ops.pallas_sweep import pallas_sweeps
from neural_network_quantum_state_tpu.ops.rng import random_spins
from neural_network_quantum_state_tpu.sampler.schedule import chain_checkerboard


@pytest.mark.parametrize(
    "machine",
    [
        RBM(n_inputs=16, n_hiddens=12, dtype=jnp.float32),
        RBMTrSymm(n_inputs=16, alpha=2, dtype=jnp.float32),
        RBMZ2PrSymm(n_inputs=16, alpha=3, dtype=jnp.float32),
    ],
    ids=["RBM", "RBMTrSymm", "RBMZ2PrSymm"],
)
def test_fused_sweep_cache_consistency(machine):
    n, k = 16, 128
    params = machine.init_params(jax.random.PRNGKey(0))
    work = machine.make_work(params)
    spins = random_spins(jax.random.PRNGKey(1), k, n, jnp.float32)
    cache, lnpsi = engine.full_forward(work, spins)
    sched = chain_checkerboard(n)
    c2, l2, acc = pallas_sweeps(work, cache, lnpsi, sched, jnp.int32(7), 5, block_k=64, interpret=True)
    assert float(acc) > 0
    ref_cache, ref_ln = engine.full_forward(work, c2.spins)
    np.testing.assert_allclose(np.asarray(c2.y.re), np.asarray(ref_cache.y.re), atol=2e-5)
    np.testing.assert_allclose(np.asarray(c2.y.im), np.asarray(ref_cache.y.im), atol=2e-5)
    np.testing.assert_allclose(np.asarray(l2.re), np.asarray(ref_ln.re), atol=2e-4)
    np.testing.assert_allclose(np.asarray(l2.im), np.asarray(ref_ln.im), atol=2e-4)
    np.testing.assert_allclose(np.asarray(c2.sa.re), np.asarray(ref_cache.sa.re), atol=2e-5)
    assert bool(jnp.all(jnp.abs(c2.spins) == 1.0))


def test_fused_sweep_rejects_ffnn():
    from neural_network_quantum_state_tpu.models import FFNN

    machine = FFNN(n_inputs=8, n_hiddens=8, dtype=jnp.float32)
    params = machine.init_params(jax.random.PRNGKey(0))
    work = machine.make_work(params)
    spins = random_spins(jax.random.PRNGKey(1), 64, 8, jnp.float32)
    cache, lnpsi = engine.full_forward(work, spins)
    with pytest.raises(AssertionError):
        pallas_sweeps(work, cache, lnpsi, chain_checkerboard(8), jnp.int32(1), 1, block_k=64, interpret=True)


def test_adaptive_block_sizing():
    """VMEM-adaptive walker blocks: large H must shrink the block so the
    kernel's (BK, H) temporaries stay within the ~16 MB VMEM budget."""
    n, k = 8, 2048
    machine = RBM(n_inputs=n, n_hiddens=512, dtype=jnp.float32)
    params = machine.init_params(jax.random.PRNGKey(0))
    work = machine.make_work(params)
    spins = random_spins(jax.random.PRNGKey(1), k, n, jnp.float32)
    cache, lnpsi = engine.full_forward(work, spins)
    sched = chain_checkerboard(n)
    # block_k=None -> adaptive: cap = 256*1024 // 512 = 512 -> block 512
    c2, l2, acc = pallas_sweeps(work, cache, lnpsi, sched, jnp.int32(3), 2, block_k=None, interpret=True)
    ref_cache, ref_ln = engine.full_forward(work, c2.spins)
    np.testing.assert_allclose(np.asarray(l2.re), np.asarray(ref_ln.re), atol=2e-4)
    assert bool(jnp.all(jnp.abs(c2.spins) == 1.0))
