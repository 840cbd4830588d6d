"""Pallas fused-sweep kernel: cache consistency + sampling statistics in
TPU-interpret mode.

Interpret mode substitutes a murmur3 counter PRNG for the TPU hardware PRNG
(ops.pallas_sweep._hash_bits), so both the incremental y/sa/spins/lnpsi
updates AND the accept-chain statistics are testable off-TPU; hardware
behavior is additionally validated on real TPU (verify skill + bench.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_network_quantum_state_tpu.models import FFNN, RBM, RBMTrSymm, RBMZ2PrSymm
from neural_network_quantum_state_tpu.models.ffnn import FFNNTrSymm
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
        FFNN(n_inputs=16, n_hiddens=12, dtype=jnp.float32),
        FFNNTrSymm(n_inputs=16, alpha=2, dtype=jnp.float32),
    ],
    ids=["RBM", "RBMTrSymm", "RBMZ2PrSymm", "FFNN", "FFNNTrSymm"],
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


@pytest.mark.parametrize(
    "machine, scale",
    [
        (RBM(n_inputs=4, n_hiddens=8, dtype=jnp.float32), 4.0),
        # FFNN at scale 4 makes |psi|^2 ~0.99-peaked on one config and even
        # the XLA sampler goes metastable (measured tv=0.49 for BOTH paths);
        # 1.5 gives a well-mixed yet clearly non-uniform target
        (FFNN(n_inputs=4, n_hiddens=8, dtype=jnp.float32), 1.5),
    ],
    ids=["RBM", "FFNN"],
)
def test_fused_sweep_samples_psi2(machine, scale):
    """The fused accept chain (Re ln psi only; for FFNN via the in-kernel
    complex-c reduction with polynomial Im lncosh) must sample |psi|^2:
    chi^2 + total-variation against exact enumeration. This is the
    statistical equivalence test between the fused kernel and the XLA sweep
    (VERDICT round-1 item 7)."""
    n, k = 4, 1024
    params = machine.init_params(jax.random.PRNGKey(2))
    params = jax.tree_util.tree_map(lambda x: scale * x, params)  # non-uniform |psi|^2
    work = machine.make_work(params)
    spins = random_spins(jax.random.PRNGKey(3), k, n, jnp.float32)
    cache, lnpsi = engine.full_forward(work, spins)
    sched = chain_checkerboard(n)

    confs = np.array([[1.0 - 2.0 * ((i >> b) & 1) for b in range(n)] for i in range(2**n)], np.float32)
    ln = engine.log_psi(work, jnp.asarray(confs))
    p = np.exp(2.0 * np.asarray(ln.re, np.float64))
    p /= p.sum()

    cache, lnpsi, _ = pallas_sweeps(work, cache, lnpsi, sched, jnp.int32(11), 30, block_k=256, interpret=True)
    counts = np.zeros(2**n)
    bit_w = np.asarray([1 << b for b in range(n)])
    seed = 100
    for _ in range(40):
        cache, lnpsi, _ = pallas_sweeps(work, cache, lnpsi, sched, jnp.int32(seed), 2, block_k=256, interpret=True)
        seed += 1
        s = np.asarray(cache.spins)
        idx = ((1.0 - s) / 2.0 @ bit_w).astype(int)
        counts += np.bincount(idx, minlength=2**n)
    total = counts.sum()
    chi2 = float(np.sum((counts - total * p) ** 2 / (total * p)))
    tv = 0.5 * float(np.abs(counts / total - p).sum())
    assert chi2 / (2**n - 1) < 3.0, (chi2, tv)
    assert tv < 0.03, tv


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


def test_fused_tempered_cache_consistency():
    """n_beta > 1: after in-kernel tempered sweeps + swap phases, the
    returned y/sa/lnpsi caches must equal a from-scratch forward of the
    returned spins (swaps exchange whole machine states consistently)."""
    n, k, n_beta = 6, 512, 4
    machine = RBM(n_inputs=n, n_hiddens=8, dtype=jnp.float32)
    params = machine.init_params(jax.random.PRNGKey(5))
    work = machine.make_work(params)
    spins = random_spins(jax.random.PRNGKey(6), k, n, jnp.float32)
    cache, lnpsi = engine.full_forward(work, spins)
    sched = chain_checkerboard(n)
    cache, lnpsi, n_acc = pallas_sweeps(
        work, cache, lnpsi, sched, jnp.int32(7), 5, block_k=256, interpret=True, n_beta=n_beta
    )
    ref_cache, ref_ln = engine.full_forward(work, cache.spins)
    np.testing.assert_allclose(np.asarray(cache.y.re), np.asarray(ref_cache.y.re), rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(cache.y.im), np.asarray(ref_cache.y.im), rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(lnpsi.re), np.asarray(ref_ln.re), rtol=0, atol=5e-5)
    assert float(n_acc) > 0


@pytest.mark.slow
def test_fused_tempered_beta1_samples_psi2():
    """Replica-exchange in-kernel: the beta=1 slice (replica-minor [::nb])
    must still sample |psi|^2 - chi^2 + total variation vs enumeration.
    Catches a wrong swap phase (which would mix beta<1 statistics into the
    physical chains)."""
    n, n_beta = 4, 4
    k = 1024 * n_beta
    machine = RBM(n_inputs=n, n_hiddens=8, dtype=jnp.float32)
    params = machine.init_params(jax.random.PRNGKey(2))
    params = jax.tree_util.tree_map(lambda x: 1.5 * x, params)
    work = machine.make_work(params)
    spins = random_spins(jax.random.PRNGKey(3), k, n, jnp.float32)
    cache, lnpsi = engine.full_forward(work, spins)
    sched = chain_checkerboard(n)

    confs = np.array([[1.0 - 2.0 * ((i >> b) & 1) for b in range(n)] for i in range(2**n)], np.float32)
    ln = engine.log_psi(work, jnp.asarray(confs))
    p = np.exp(2.0 * np.asarray(ln.re, np.float64))
    p /= p.sum()

    cache, lnpsi, _ = pallas_sweeps(
        work, cache, lnpsi, sched, jnp.int32(11), 30, block_k=256, interpret=True, n_beta=n_beta
    )
    counts = np.zeros(2**n)
    bit_w = np.asarray([1 << b for b in range(n)])
    seed = 300
    for _ in range(40):
        cache, lnpsi, _ = pallas_sweeps(
            work, cache, lnpsi, sched, jnp.int32(seed), 2, block_k=256, interpret=True, n_beta=n_beta
        )
        seed += 1
        s = np.asarray(cache.spins)[::n_beta]  # beta=1 replicas only
        idx = ((1.0 - s) / 2.0 @ bit_w).astype(int)
        counts += np.bincount(idx, minlength=2**n)
    total = counts.sum()
    chi2 = float(np.sum((counts - total * p) ** 2 / (total * p)))
    tv = 0.5 * float(np.abs(counts / total - p).sum())
    assert chi2 / (2**n - 1) < 3.0, (chi2, tv)
    assert tv < 0.03, tv


def test_recur_cos_variant_matches_standard_kernel():
    """The recurrent-rotation sweep variant (recur_cos=True: running
    cos/sin(2 y_im) rotated by per-site cos/sin(4 w_im) constants, refreshed
    every sweep) must be a drop-in statistical twin of the standard kernel.
    On the shared interpret-mode PRNG stream the accept chains differ only
    by rotation roundoff (~1e-6 on dln), so the decision sequences - and
    therefore spins, acceptance counts, and lnpsi - should match outright
    at small shapes; the cache must stay self-consistent independently.
    Round-4 verdict item 2: the A/B'd optimization attempt
    (scripts/bench_sweep_recurcos_ab.py measures it on chip)."""
    n, k = 16, 256
    machine = RBMTrSymm(n_inputs=n, alpha=2, dtype=jnp.float32)
    params = machine.init_params(jax.random.PRNGKey(0))
    work = machine.make_work(params)
    spins = random_spins(jax.random.PRNGKey(1), k, n, jnp.float32)
    cache, lnpsi = engine.full_forward(work, spins)
    sched = chain_checkerboard(n)
    for n_beta in (1, 4):
        c0, l0, a0 = pallas_sweeps(
            work, cache, lnpsi, sched, jnp.int32(7), 6, block_k=64, interpret=True, n_beta=n_beta
        )
        c1, l1, a1 = pallas_sweeps(
            work, cache, lnpsi, sched, jnp.int32(7), 6, block_k=64, interpret=True,
            n_beta=n_beta, recur_cos=True,
        )
        assert float(a0) == float(a1), (n_beta, float(a0), float(a1))
        np.testing.assert_array_equal(np.asarray(c0.spins), np.asarray(c1.spins))
        np.testing.assert_allclose(np.asarray(l0.re), np.asarray(l1.re), atol=1e-4)
        # cache self-consistency of the variant (full recompute oracle)
        ref_cache, ref_ln = engine.full_forward(work, c1.spins)
        np.testing.assert_allclose(np.asarray(c1.y.im), np.asarray(ref_cache.y.im), atol=2e-5)
        np.testing.assert_allclose(np.asarray(l1.re), np.asarray(ref_ln.re), atol=2e-4)
