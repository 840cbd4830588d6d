"""Fused local-energy kernel vs the XLA path (TPU-interpret mode; no PRNG
involved, so the interpreter validates the full computation incl. the
polynomial atan2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_network_quantum_state_tpu.hamiltonians.ising import _offdiag_sum
from neural_network_quantum_state_tpu.models import FFNN, RBM, RBMTrSymm
from neural_network_quantum_state_tpu.models.ffnn import FFNNTrSymm
from neural_network_quantum_state_tpu.ops import cplx, engine
from neural_network_quantum_state_tpu.ops.pallas_energy import _atan2, pallas_offdiag_sum
from neural_network_quantum_state_tpu.ops.rng import random_spins


def test_polynomial_atan2(rng):
    a = rng.normal(size=512).astype(np.float32) * 3
    b = rng.normal(size=512).astype(np.float32) * 3
    got = np.asarray(_atan2(jnp.asarray(b), jnp.asarray(a)))
    want = np.arctan2(b, a)
    np.testing.assert_allclose(got, want, atol=3e-6)


@pytest.mark.parametrize(
    "machine",
    [
        RBM(n_inputs=16, n_hiddens=12, dtype=jnp.float32),
        RBMTrSymm(n_inputs=16, alpha=2, dtype=jnp.float32),
        # FFNN family: complex output weights c rotate both lncosh planes
        # into the ratio (round-2 verdict item 5 - previously XLA-only)
        FFNN(n_inputs=16, n_hiddens=12, dtype=jnp.float32),
        FFNNTrSymm(n_inputs=16, alpha=2, dtype=jnp.float32),
    ],
    ids=["RBM", "RBMTrSymm", "FFNN", "FFNNTrSymm"],
)
def test_offdiag_kernel_matches_xla(machine):
    n, k = 16, 128
    params = machine.init_params(jax.random.PRNGKey(0))
    work = machine.make_work(params)
    spins = random_spins(jax.random.PRNGKey(1), k, n, jnp.float32)
    cache, lnpsi = engine.full_forward(work, spins)
    sites = jnp.arange(n, dtype=jnp.int32)
    got = pallas_offdiag_sum(work, cache, lnpsi, sites, block_k=64, interpret=True)
    want = _offdiag_sum(work, cache, lnpsi, n)
    np.testing.assert_allclose(np.asarray(got.re), np.asarray(want.re), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got.im), np.asarray(want.im), rtol=2e-4, atol=2e-4)


def test_local_energy_sharded_matches_single_device():
    """local_energy_sharded (shard_map + per-shard fused kernel) must equal
    the plain local_energy on the same walker ensemble (VERDICT round-1
    item 4: the fused energy path was gated to one device)."""
    import neural_network_quantum_state_tpu as nqs
    from neural_network_quantum_state_tpu.hamiltonians import LITFIChain, TFIChain

    n, k = 16, 512
    machine = RBM(n_inputs=n, n_hiddens=32, dtype=jnp.float32)
    params = machine.init_params(jax.random.PRNGKey(0))
    work = machine.make_work(params)
    spins = random_spins(jax.random.PRNGKey(1), k, n, jnp.float32)
    cache, lnpsi = engine.full_forward(work, spins)
    mesh = nqs.parallel.make_mesh()

    for ham in (TFIChain(n_sites=n, h=-1.0, j=-1.0),
                LITFIChain(n_sites=n, h=-0.5, j=0.9, alpha=2.5, pbc=True)):
        ref = ham.local_energy(work, cache, lnpsi)
        cache_s = nqs.parallel.shard_walker_tree(cache, mesh, k)
        ln_s = nqs.parallel.shard_walker_tree(lnpsi, mesh, k)
        got = ham.local_energy_sharded(work, cache_s, ln_s, mesh)
        # the sharded path runs the interpreted Pallas kernel per shard
        # (polynomial transcendentals) vs the XLA chunked path - tolerance
        # covers the implementation difference, not sharding error
        np.testing.assert_allclose(np.asarray(got.re), np.asarray(ref.re), rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(got.im), np.asarray(ref.im), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("unroll", [2, 4])
def test_offdiag_kernel_unroll_matches_unroll1(unroll):
    """unroll>1 evaluates several independent site flips per loop iteration
    (ILP A/B knob); results must be identical to the unroll=1 kernel up to
    summation order."""
    n, k = 16, 128
    machine = RBMTrSymm(n_inputs=n, alpha=2, dtype=jnp.float32)
    params = machine.init_params(jax.random.PRNGKey(2))
    work = machine.make_work(params)
    spins = random_spins(jax.random.PRNGKey(3), k, n, jnp.float32)
    cache, lnpsi = engine.full_forward(work, spins)
    sites = jnp.arange(n, dtype=jnp.int32)
    base = pallas_offdiag_sum(work, cache, lnpsi, sites, block_k=64, interpret=True)
    got = pallas_offdiag_sum(
        work, cache, lnpsi, sites, block_k=64, interpret=True, unroll=unroll
    )
    np.testing.assert_allclose(np.asarray(got.re), np.asarray(base.re), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got.im), np.asarray(base.im), rtol=1e-5, atol=1e-6)


def test_auto_block_k_vmem_guard():
    """The failing production shape (K=8192, H=256, FFNN c-weights) must be
    scaled down below the measured 16MB scoped-VMEM cliff; the RBM shape
    that measured fine keeps its full block."""
    from neural_network_quantum_state_tpu.ops.pallas_energy import _auto_block_k

    assert _auto_block_k(1024, 8192, 256, has_c=False, unroll=1) == 1024
    assert _auto_block_k(1024, 8192, 256, has_c=True, unroll=1) == 512
    assert _auto_block_k(1024, 8192, 256, has_c=True, unroll=2) == 256
    assert _auto_block_k(1024, 8192, 512, has_c=False, unroll=1) == 512
    # never below 128, and divisibility is preserved
    assert _auto_block_k(128, 8192, 4096, has_c=True, unroll=4) == 128


def test_unit_phase_prod_equals_angle_sum(rng):
    """exp(i*sum_h arg z_h) via the normalized product tree - exact up to
    f32 rounding, no angle ever computed (the mod-2pi ambiguity of the
    angle sum is irrelevant inside exp)."""
    from neural_network_quantum_state_tpu.ops.pallas_energy import _unit_phase_prod

    bk, h = 64, 128
    zre = rng.normal(size=(bk, h)).astype(np.float32)
    zim = rng.normal(size=(bk, h)).astype(np.float32)
    pre, pim = (np.asarray(x) for x in _unit_phase_prod(jnp.asarray(zre), jnp.asarray(zim)))
    ang = np.sum(np.arctan2(zim.astype(np.float64), zre.astype(np.float64)), axis=1)
    np.testing.assert_allclose(pre[:, 0], np.cos(ang), atol=5e-5)
    np.testing.assert_allclose(pim[:, 0], np.sin(ang), atol=5e-5)
    # unit magnitude preserved through the tree
    np.testing.assert_allclose(pre[:, 0] ** 2 + pim[:, 0] ** 2, 1.0, atol=1e-4)


@pytest.mark.parametrize(
    "machine",
    [
        RBM(n_inputs=16, n_hiddens=16, dtype=jnp.float32),
        RBMTrSymm(n_inputs=16, alpha=2, dtype=jnp.float32),  # H = 32
    ],
    ids=["RBM_H16", "RBMTrSymm_H32"],
)
def test_offdiag_kernel_phase_product_matches(machine):
    """phase_product=True (atan2/cos/sin replaced by the normalized complex
    product tree) must reproduce both the atan2-kernel and XLA values."""
    n, k = 16, 128
    params = machine.init_params(jax.random.PRNGKey(4))
    work = machine.make_work(params)
    spins = random_spins(jax.random.PRNGKey(5), k, n, jnp.float32)
    cache, lnpsi = engine.full_forward(work, spins)
    sites = jnp.arange(n, dtype=jnp.int32)
    got = pallas_offdiag_sum(
        work, cache, lnpsi, sites, block_k=64, interpret=True, phase_product=True
    )
    for want in (
        pallas_offdiag_sum(work, cache, lnpsi, sites, block_k=64, interpret=True),
        _offdiag_sum(work, cache, lnpsi, n),
    ):
        np.testing.assert_allclose(np.asarray(got.re), np.asarray(want.re), rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(got.im), np.asarray(want.im), rtol=2e-4, atol=2e-4)


def test_offdiag_kernel_phase_product_fallback():
    """FFNN (complex output weights) and non-power-of-two H silently fall
    back to the atan2 kernel - identical results, no crash."""
    for machine in (
        FFNN(n_inputs=16, n_hiddens=12, dtype=jnp.float32),
        RBM(n_inputs=16, n_hiddens=12, dtype=jnp.float32),  # H=12 not pow2
    ):
        params = machine.init_params(jax.random.PRNGKey(6))
        work = machine.make_work(params)
        spins = random_spins(jax.random.PRNGKey(7), 64, 16, jnp.float32)
        cache, lnpsi = engine.full_forward(work, spins)
        sites = jnp.arange(16, dtype=jnp.int32)
        base = pallas_offdiag_sum(work, cache, lnpsi, sites, block_k=64, interpret=True)
        got = pallas_offdiag_sum(
            work, cache, lnpsi, sites, block_k=64, interpret=True, phase_product=True
        )
        np.testing.assert_allclose(np.asarray(got.re), np.asarray(base.re), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(got.im), np.asarray(base.im), rtol=1e-6)
