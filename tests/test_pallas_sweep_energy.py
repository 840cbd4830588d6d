"""Sweep+energy megakernel vs its two-kernel composition (interpret mode).

The megakernel must be EXACTLY pallas_sweeps(...) followed by
pallas_offdiag_sum on the post-sweep state: same PRNG seeding contract
(per-block threefry seeds), same accept chain, same angle-addition energy
formulation - so both halves are checked against the standalone kernels
with identical seeds, not statistically."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_network_quantum_state_tpu.models import RBM, RBMTrSymm
from neural_network_quantum_state_tpu.ops import engine
from neural_network_quantum_state_tpu.ops.pallas_energy import pallas_offdiag_sum
from neural_network_quantum_state_tpu.ops.pallas_sweep import pallas_sweeps
from neural_network_quantum_state_tpu.ops.pallas_sweep_energy import pallas_sweeps_offdiag
from neural_network_quantum_state_tpu.ops.rng import random_spins


@pytest.mark.slow  # ~40 s per case in the TPU-emulating interpreter
@pytest.mark.parametrize(
    "machine",
    [
        RBM(n_inputs=16, n_hiddens=12, dtype=jnp.float32),
        RBMTrSymm(n_inputs=16, alpha=2, dtype=jnp.float32),
    ],
    ids=["RBM", "RBMTrSymm"],
)
@pytest.mark.parametrize("n_beta", [1, 4], ids=["plain", "pt"])
def test_megakernel_matches_two_kernel_composition(machine, n_beta):
    n, k, n_sweeps = 16, 128, 3
    params = machine.init_params(jax.random.PRNGKey(0))
    work = machine.make_work(params)
    spins = random_spins(jax.random.PRNGKey(1), k, n, jnp.float32)
    cache, lnpsi = engine.full_forward(work, spins)
    schedule = jnp.concatenate([jnp.arange(0, n, 2), jnp.arange(1, n, 2)]).astype(jnp.int32)
    seed = jnp.asarray(7, jnp.int32)

    cache_m, lnpsi_m, acc_m, offdiag_m = pallas_sweeps_offdiag(
        work, cache, lnpsi, schedule, seed, n_sweeps, block_k=64, interpret=True, n_beta=n_beta
    )
    cache_2, lnpsi_2, acc_2 = pallas_sweeps(
        work, cache, lnpsi, schedule, seed, n_sweeps, block_k=64, interpret=True, n_beta=n_beta
    )
    # identical block size + seeds -> identical PRNG streams -> the sweep
    # phase must be bitwise-identical to the standalone sweep kernel
    np.testing.assert_array_equal(np.asarray(cache_m.spins), np.asarray(cache_2.spins))
    np.testing.assert_allclose(np.asarray(cache_m.y.re), np.asarray(cache_2.y.re), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(cache_m.y.im), np.asarray(cache_2.y.im), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(lnpsi_m.re), np.asarray(lnpsi_2.re), rtol=1e-6, atol=1e-6)
    assert int(acc_m) == int(acc_2)

    offdiag_2 = pallas_offdiag_sum(
        work, cache_2, lnpsi_2, jnp.arange(n, dtype=jnp.int32), block_k=64, interpret=True
    )
    np.testing.assert_allclose(np.asarray(offdiag_m.re), np.asarray(offdiag_2.re), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(offdiag_m.im), np.asarray(offdiag_2.im), rtol=2e-4, atol=2e-4)


def test_megakernel_rejects_ffnn():
    from neural_network_quantum_state_tpu.models import FFNN

    machine = FFNN(n_inputs=8, n_hiddens=6, dtype=jnp.float32)
    params = machine.init_params(jax.random.PRNGKey(0))
    work = machine.make_work(params)
    spins = random_spins(jax.random.PRNGKey(1), 32, 8, jnp.float32)
    cache, lnpsi = engine.full_forward(work, spins)
    with pytest.raises(AssertionError, match="RBM family"):
        pallas_sweeps_offdiag(
            work, cache, lnpsi, jnp.arange(8, dtype=jnp.int32), jnp.asarray(1, jnp.int32),
            1, block_k=32, interpret=True,
        )
