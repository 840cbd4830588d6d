"""Measurement estimators vs exact enumeration on small systems
(the reference cross-validates C++ vs NumPy estimators; here the oracle is
exact summation over the 2^N basis)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_network_quantum_state_tpu.measurements import (
    AmplitudeSampler,
    fidelity,
    overlap_integral,
    renyi2_entropy,
    spin_x_correlation,
    spin_z_correlation,
    spontaneous_magnetization,
)
from neural_network_quantum_state_tpu.models import RBM
from neural_network_quantum_state_tpu.ops import cplx, engine

N = 6


def _all_spins(n):
    idx = np.arange(2**n)
    bits = (idx[:, None] >> np.arange(n)[None, :]) & 1
    return 1.0 - 2.0 * bits  # (2^n, n)


def _psi_vector(machine, params):
    s = jnp.asarray(_all_spins(N), jnp.float64)
    ln = engine.log_psi(machine.make_work(params), s)
    return np.exp(np.asarray(cplx.to_complex(ln)))


def _machine(seed):
    m = RBM(n_inputs=N, n_hiddens=10, dtype=jnp.float64)
    return m, m.init_params(jax.random.PRNGKey(seed))


def test_overlap_integral_vs_exact():
    m1, p1 = _machine(0)
    m2, p2 = _machine(1)
    psi1, psi2 = _psi_vector(m1, p1), _psi_vector(m2, p2)
    # exact <psi1|psi2>/<psi1|psi1> (the |psi1|^2-weighted ratio estimator)
    want = np.sum(np.conj(psi1) * psi2) / np.sum(np.abs(psi1) ** 2)
    smp = AmplitudeSampler(m1, p1, n_walkers=2048, key=5)
    got, re_err, im_err = overlap_integral(smp, m2.make_work(p2), n_trials=40, n_warmup=150, n_sweeps=3)
    assert abs(got.real - want.real) < 5 * re_err + 0.02, (got, want)
    assert abs(got.imag - want.imag) < 5 * im_err + 0.02, (got, want)


def test_renyi2_vs_exact():
    m1, p1 = _machine(2)
    psi = _psi_vector(m1, p1)
    psi = psi / np.linalg.norm(psi)
    l = 3  # subsystem A = sites [0, l)
    # basis index bit i = site i; A bits are the low l bits
    dim_a, dim_b = 2**l, 2 ** (N - l)
    # index = sum_i bit_i 2^i: A bits low -> reshape (dim_b, dim_a) with B major
    psi_mat = psi.reshape(dim_b, dim_a)  # [b, a]
    rho_a = psi_mat.T @ psi_mat.conj()  # rho_A[a,a'] = sum_b psi[a,b] psi*[a',b]
    s2_exact = -np.log(np.real(np.trace(rho_a @ rho_a)))
    s1 = AmplitudeSampler(m1, p1, n_walkers=2048, key=7)
    s2 = AmplitudeSampler(m1, p1, n_walkers=2048, key=987654321)
    got = renyi2_entropy(s1, s2, l, n_iterations=50, n_sweeps=2, n_warmup=150)
    assert abs(got - s2_exact) < 0.08, (got, s2_exact)


def test_fidelity_vs_exact():
    m1, p1 = _machine(3)
    m2, p2 = _machine(4)
    psi1, psi2 = _psi_vector(m1, p1), _psi_vector(m2, p2)
    want = abs(np.vdot(psi1, psi2)) / (np.linalg.norm(psi1) * np.linalg.norm(psi2))
    s1 = AmplitudeSampler(m1, p1, n_walkers=2048, key=9)
    s2 = AmplitudeSampler(m2, p2, n_walkers=2048, key=10)
    got, err = fidelity(s1, s2, n_meas=40, n_warmup=150, n_sweeps=2)
    assert abs(got - want) < 10 * err + 0.03, (got, want, err)


def test_smag_and_zz_vs_exact():
    m1, p1 = _machine(5)
    psi = _psi_vector(m1, p1)
    p = np.abs(psi) ** 2
    p /= p.sum()
    s = _all_spins(N)
    m_abs = np.abs(s.mean(axis=1))
    want_m1 = float((p * m_abs).sum())
    want_m2 = float((p * m_abs**2).sum())
    want_zz = (s[:, :, None] * s[:, None, :] * p[:, None, None]).sum(axis=0)

    smp = AmplitudeSampler(m1, p1, n_walkers=4096, key=12)
    m1_got, m2_got, m4_got = spontaneous_magnetization(smp, n_iterations=30, n_sweeps=2, n_warmup=150)
    assert abs(m1_got - want_m1) < 0.02, (m1_got, want_m1)
    assert abs(m2_got - want_m2) < 0.02, (m2_got, want_m2)

    smp2 = AmplitudeSampler(m1, p1, n_walkers=4096, key=13)
    zz = spin_z_correlation(smp2, n_iterations=30, n_sweeps=2, n_warmup=150)
    np.testing.assert_allclose(zz, want_zz, atol=0.04)


def test_spin_x_correlation_vs_exact():
    m1, p1 = _machine(6)
    psi = _psi_vector(m1, p1)
    norm2 = np.sum(np.abs(psi) ** 2)
    dim = 2**N
    want_s = np.zeros(N)
    want_ss = np.zeros((N, N))
    idx = np.arange(dim)
    for i in range(N):
        fi = idx ^ (1 << i)
        want_s[i] = np.real(np.sum(np.conj(psi) * psi[fi])) / norm2
        for j in range(N):
            if j == i:
                want_ss[i, j] = 1.0
                continue
            fij = fi ^ (1 << j)
            want_ss[i, j] = np.real(np.sum(np.conj(psi) * psi[fij])) / norm2

    smp = AmplitudeSampler(m1, p1, n_walkers=4096, key=14)
    s_got, ss_got = spin_x_correlation(smp, n_iterations=25, n_sweeps=2, n_warmup=150)
    np.testing.assert_allclose(s_got, want_s, atol=0.04)
    np.testing.assert_allclose(ss_got, want_ss, atol=0.05)


def test_tempered_estimator_vs_exact():
    """AmplitudeSampler(n_beta>1): the beta=1 readout must reproduce the
    same |psi|^2 expectation values as plain sampling (the tempered
    estimator for metastable states)."""
    m1, p1 = _machine(7)
    psi = _psi_vector(m1, p1)
    p = np.abs(psi) ** 2
    p /= p.sum()
    s = _all_spins(N)
    m_abs = np.abs(s.mean(axis=1))
    want_m1 = float((p * m_abs).sum())

    smp = AmplitudeSampler(m1, p1, n_walkers=4096, key=21, n_beta=4)
    assert smp.n_walkers == 1024
    assert smp.spins.shape == (1024, N)
    m1_got, m2_got, m4_got = spontaneous_magnetization(smp, n_iterations=30, n_sweeps=2, n_warmup=150)
    assert abs(m1_got - want_m1) < 0.03, (m1_got, want_m1)


def test_mesh_sharded_estimators_match_single_device():
    """Walker-sharded measurement path (VERDICT round-1 item 4): the same
    estimators over an 8-device mesh agree with single-device values to
    statistical error; the Renyi two-replica swap stays device-local
    because both replicas carry identical walker sharding."""
    import neural_network_quantum_state_tpu as nqs

    m1, p1 = _machine(3)
    mesh = nqs.parallel.make_mesh()

    # single device
    s_single = AmplitudeSampler(m1, p1, n_walkers=2048, key=31)
    m1_s, m2_s, _ = spontaneous_magnetization(s_single, n_iterations=30, n_sweeps=2, n_warmup=150)
    # sharded
    s_mesh = AmplitudeSampler(m1, p1, n_walkers=2048, key=32, mesh=mesh)
    m1_m, m2_m, _ = spontaneous_magnetization(s_mesh, n_iterations=30, n_sweeps=2, n_warmup=150)
    assert abs(m1_s - m1_m) < 0.03, (m1_s, m1_m)
    assert abs(m2_s - m2_m) < 0.03, (m2_s, m2_m)

    # two-replica estimator (renyi) on the mesh vs single device
    r1 = AmplitudeSampler(m1, p1, n_walkers=2048, key=33, mesh=mesh)
    r2 = AmplitudeSampler(m1, p1, n_walkers=2048, key=34, mesh=mesh)
    s2_mesh = renyi2_entropy(r1, r2, l=3, n_iterations=30, n_sweeps=2, n_warmup=150)
    q1 = AmplitudeSampler(m1, p1, n_walkers=2048, key=35)
    q2 = AmplitudeSampler(m1, p1, n_walkers=2048, key=36)
    s2_single = renyi2_entropy(q1, q2, l=3, n_iterations=30, n_sweeps=2, n_warmup=150)
    assert abs(s2_mesh - s2_single) < 0.08, (s2_mesh, s2_single)


def test_mesh_plus_tempering_estimator():
    """mesh x n_beta (VERDICT round-1 weak item 6): tempered sampling over
    the sharded walker axis; the strided beta=1 readout must stay correct."""
    import neural_network_quantum_state_tpu as nqs

    m1, p1 = _machine(7)
    psi = _psi_vector(m1, p1)
    p = np.abs(psi) ** 2
    p /= p.sum()
    s = _all_spins(N)
    want_m1 = float((p * np.abs(s.mean(axis=1))).sum())

    mesh = nqs.parallel.make_mesh()
    smp = AmplitudeSampler(m1, p1, n_walkers=4096, key=41, n_beta=4, mesh=mesh)
    m1_got, _, _ = spontaneous_magnetization(smp, n_iterations=30, n_sweeps=2, n_warmup=150)
    assert abs(m1_got - want_m1) < 0.03, (m1_got, want_m1)


def test_amplitude_sampler_fused_cpu_and_odd_nbeta():
    """Review regressions: (a) use_fused without a mesh must auto-select
    interpret mode off-TPU; (b) non-power-of-two replica ladders (n_beta=3)
    must get a block size that keeps replica groups whole."""
    from neural_network_quantum_state_tpu.measurements.sampler import AmplitudeSampler
    from neural_network_quantum_state_tpu.models import RBM

    machine = RBM(n_inputs=6, n_hiddens=8, dtype=jnp.float32)
    params = machine.init_params(jax.random.PRNGKey(0))
    smp = AmplitudeSampler(machine, params, 384, key=1, n_beta=3, use_fused=True)
    smp.do_mcmc_steps(2)
    assert np.all(np.isfinite(np.asarray(smp.lnpsi.re)))
    assert smp.spins.shape[0] == 128  # beta=1 slice of 384/3


@pytest.mark.slow
def test_binder_pipeline_vs_ed_ground_state():
    """End-to-end Binder-cumulant pipeline against exact diagonalization:
    train a LITFI chain (the paper's model) to its ground state, measure
    the staggered moments through the estimator, and compare U to the
    exact ground-state value from the Lanczos anchor
    (utils.exact.litfi_binder_exact). This validates the ENTIRE
    finite-size-scaling workflow - the round-3 N=64 transition-region
    re-training was motivated by exactly this check failing at scale."""
    import math

    import neural_network_quantum_state_tpu as nqs
    from neural_network_quantum_state_tpu.hamiltonians import LITFIChain
    from neural_network_quantum_state_tpu.measurements.estimators import (
        binder_cumulant,
        order_parameter,
    )
    from neural_network_quantum_state_tpu.models import RBMTrSymm
    from neural_network_quantum_state_tpu.utils.exact import litfi_binder_exact

    n, theta, alpha = 8, 1.1, 2.5
    machine = RBMTrSymm(n_inputs=n, alpha=4, dtype=jnp.float64)
    ham = LITFIChain(n_sites=n, j=math.sin(theta), h=-math.cos(theta), alpha=alpha, pbc=True)
    # tempered training (n_beta=4): plain single-flip training at this
    # near-critical theta plateaus at 4% energy error / U biased low by 0.1
    # (the miniature version of the N=64 transition-region failure this test
    # guards against); PT reaches rel err ~2e-4
    vmc = nqs.VMC(machine, ham, nqs.VMCConfig(n_walkers=1024, learning_rate=2e-2, seed=17, n_beta=4))
    params, state = vmc.init()
    state = vmc.warm_up(params, state, 300)
    params, state, hist, _ = vmc.run(params, state, 1500)

    smp = AmplitudeSampler(machine, params, n_walkers=2048, key=19)
    coeff = jnp.asarray(np.where(np.arange(n) % 2 == 0, 1.0, -1.0), jnp.float64)
    m1_t, m2_t, m4_t = order_parameter(smp, coeff, 60, 2, 200, return_trials=True)
    u, u_err = binder_cumulant(m2_t, m4_t)
    want = litfi_binder_exact(n, theta, alpha)
    assert abs(float(np.mean(m1_t)) - want["m1"]) < 0.02
    assert abs(u - want["U"]) < 0.02, (u, want["U"], u_err)


def test_correlation_ratio_vs_exact():
    """structure_factor_trials / correlation_ratio vs exact enumeration:
    S(k) is diagonal in sigma_z, so the oracle is a |psi|^2-weighted sum of
    |sum_j s_j e^{ikj}|^2 / N over the full basis."""
    from neural_network_quantum_state_tpu.measurements import (
        correlation_ratio,
        structure_factor_trials,
    )

    m1, p1 = _machine(7)
    psi = _psi_vector(m1, p1)
    p = np.abs(psi) ** 2
    p /= p.sum()
    s = _all_spins(N)
    ks = [np.pi, np.pi + 2 * np.pi / N]
    want = []
    for k in ks:
        amp = s @ np.exp(1j * k * np.arange(N))
        want.append(float((p * np.abs(amp) ** 2).sum()) / N)

    smp = AmplitudeSampler(m1, p1, n_walkers=4096, key=15)
    trials = structure_factor_trials(smp, ks, n_iterations=30, n_sweeps=2, n_warmup=150)
    assert trials.shape == (30, 2)
    got = trials.mean(axis=0)
    np.testing.assert_allclose(got, want, rtol=0.05)

    smp2 = AmplitudeSampler(m1, p1, n_walkers=4096, key=16)
    r, r_err, s_peak, s_nb = correlation_ratio(smp2, n_iterations=30, n_sweeps=2, n_warmup=150)
    want_r = want[1] / want[0]
    assert abs(r - want_r) < max(5 * r_err, 0.05), (r, want_r, r_err)
    assert r_err < 0.05


def test_run_estimator_chunked_matches_monolithic():
    """scan_chunk splits the estimator scan into bounded device calls (the
    remote-tunnel watchdog mitigation, drivers.measure -mchunk); the chain
    advance is deterministic, so chunked and monolithic runs from the same
    initial state must produce IDENTICAL per-iteration outputs - including
    a non-dividing remainder chunk."""
    machine, params = _machine(11)

    def accum(cache, lnpsi):
        return jnp.mean(cache.spins), jnp.mean(lnpsi.re)

    def run(chunk):
        smp = AmplitudeSampler(machine, params, 64, key=5)
        smp.warm_up(10)
        return smp.run_estimator(accum, 20, n_sweeps=2, chunk=chunk)

    mono = run(0)
    chunked = run(7)  # 7+7+6: exercises the remainder executable
    for a, b in zip(mono, chunked):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=0)
    assert np.asarray(mono[0]).shape == (20,)

    # the pair estimator takes the same chunking (fidelity/renyi path)
    from neural_network_quantum_state_tpu.measurements.sampler import run_pair_estimator

    def accum2(c1, ln1, c2, ln2):
        return jnp.mean(ln1.re - ln2.re)

    def run_pair(chunk):
        s1 = AmplitudeSampler(machine, params, 64, key=5)
        s2 = AmplitudeSampler(machine, params, 64, key=9)
        return run_pair_estimator(s1, s2, accum2, 20, n_sweeps=1, chunk=chunk)

    np.testing.assert_allclose(
        np.asarray(run_pair(0)), np.asarray(run_pair(8)), rtol=0, atol=0
    )


# ---------------------------------------------------------------------------
# Increment-trick Renyi estimator (measurements/renyi_increment.py)

def test_renyi2_increment_vs_exact():
    from neural_network_quantum_state_tpu.measurements import renyi2_increment

    m1, p1 = _machine(2)
    psi = _psi_vector(m1, p1)
    psi = psi / np.linalg.norm(psi)
    l = 3
    dim_a, dim_b = 2**l, 2 ** (N - l)
    psi_mat = psi.reshape(dim_b, dim_a)
    rho_a = psi_mat.T @ psi_mat.conj()
    s2_exact = -np.log(np.real(np.trace(rho_a @ rho_a)))
    got, err, per_level = renyi2_increment(
        m1, p1, l, n_iterations=60, n_sweeps=2, n_warmup=150,
        walkers_per_level=1024, key=11,
    )
    assert per_level.shape == (l, 3)
    assert abs(got - s2_exact) < max(5 * err, 0.05), (got, s2_exact, err)


def test_renyi2_increment_chunked_matches_shape():
    # chunked device calls concatenate to the same iteration count
    from neural_network_quantum_state_tpu.measurements import renyi2_increment

    m1, p1 = _machine(6)
    s2a, _, _ = renyi2_increment(m1, p1, 2, n_iterations=12, n_warmup=20,
                                 walkers_per_level=64, key=3, chunk=5)
    assert np.isfinite(s2a)


def test_glued_state_invariant():
    """After sweeps: s3 == glue(s1, s2), s4 == glue(s2, s1), caches exact."""
    from neural_network_quantum_state_tpu.measurements import renyi_increment as ri
    from neural_network_quantum_state_tpu.ops.rng import random_spins

    m1, p1 = _machine(4)
    work = m1.make_work(p1)
    k = 32
    kk = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(kk, 3)
    level = jnp.repeat(jnp.arange(4, dtype=jnp.int32), 8)
    mask = jnp.arange(N, dtype=jnp.int32)[None, :] < level[:, None]
    s1 = random_spins(k1, k, N, jnp.float64)
    s2 = random_spins(k2, k, N, jnp.float64)
    st = ri.init_glued(work, s1, s2, mask, k3)
    st = ri.glued_sweeps(work, st, jnp.arange(N, dtype=jnp.int32), mask, 5)
    s1n, s2n = np.asarray(st.c1.spins), np.asarray(st.c2.spins)
    np.testing.assert_array_equal(np.asarray(st.c3.spins), np.where(mask, s1n, s2n))
    np.testing.assert_array_equal(np.asarray(st.c4.spins), np.where(mask, s2n, s1n))
    # incremental ln caches agree with from-scratch forwards
    for c, ln in ((st.c1, st.ln1), (st.c3, st.ln3), (st.c4, st.ln4)):
        want = engine.log_psi(work, c.spins)
        np.testing.assert_allclose(np.asarray(ln.re), np.asarray(want.re), atol=1e-9)
        np.testing.assert_allclose(np.asarray(ln.im), np.asarray(want.im), atol=1e-9)
    assert float(st.n_proposed) == 2 * 5 * N * k


def test_renyi2_increment_hybrid_offset():
    """level_offset + external base = full S2 (the -l0 hybrid path)."""
    from neural_network_quantum_state_tpu.measurements import renyi2_increment

    m1, p1 = _machine(2)
    psi = _psi_vector(m1, p1)
    psi = psi / np.linalg.norm(psi)
    l, l0 = 3, 1
    psi_mat = psi.reshape(2 ** (N - l), 2**l)
    rho_a = psi_mat.T @ psi_mat.conj()
    s2_exact = -np.log(np.real(np.trace(rho_a @ rho_a)))
    # exact base: -ln q_1
    m0 = psi.reshape(2 ** (N - 1), 2)
    r0 = m0.T @ m0.conj()
    base = -np.log(np.real(np.trace(r0 @ r0)))
    neel = np.where(np.arange(N) % 2 == 0, 1.0, -1.0)
    got, err, per_level = renyi2_increment(
        m1, p1, l, n_iterations=60, n_sweeps=2, n_warmup=150,
        walkers_per_level=1024, key=12, level_offset=l0,
        init_spins=(neel, neel),
    )
    assert per_level.shape == (l - l0, 3)
    assert abs((base + got) - s2_exact) < max(5 * err, 0.05), (base + got, s2_exact, err)


def _exact_s2(psi, l):
    psi = psi / np.linalg.norm(psi)
    psi_mat = psi.reshape(2 ** (N - l), 2**l)
    rho_a = psi_mat.T @ psi_mat.conj()
    return -np.log(np.real(np.trace(rho_a @ rho_a)))


def test_renyi2_increment_z2_quadrature_vs_exact():
    """In-chain Z2 orbit quadrature stays unbiased on a generic state."""
    from neural_network_quantum_state_tpu.measurements import renyi2_increment

    m1, p1 = _machine(2)
    s2_exact = _exact_s2(_psi_vector(m1, p1), 3)
    got, err, per_level = renyi2_increment(
        m1, p1, 3, n_iterations=60, n_sweeps=2, n_warmup=150,
        walkers_per_level=1024, key=11, z2_quadrature=True,
    )
    assert per_level.shape == (3, 3)
    assert abs(got - s2_exact) < max(5 * err, 0.05), (got, s2_exact, err)


def _cat_machine(c=2.0, asym=0.05):
    """Hand-built sector-ASYMMETRIC cat: lnpsi = asym*sum (-1)^i s_i +
    logcosh(c * sum (-1)^i s_i) + const - weight concentrates on the two
    Neel configurations with unequal weights, and single-flip moves out of
    a Neel state are suppressed by ~e^{-2(logcosh(cN)-logcosh(c(N-2)))}."""
    m = RBM(n_inputs=N, n_hiddens=10, dtype=jnp.float64)
    stag = jnp.asarray(np.where(np.arange(N) % 2 == 0, 1.0, -1.0), jnp.float64)
    w = jnp.zeros((N, 10), jnp.float64).at[:, 0].set(c * stag)
    params = {
        "w": cplx.C(w, jnp.zeros_like(w)),
        "a": cplx.C(asym * stag, jnp.zeros_like(stag)),
        "b": cplx.C(jnp.zeros((10,), jnp.float64), jnp.zeros((10,), jnp.float64)),
    }
    return m, params


def test_renyi2_increment_z2q_rescues_frozen_sector():
    """On a deep-ordered asymmetric cat with both replicas frozen in one
    Neel sector, the plain increment chain reads S2 ~ 0 (every glued ratio
    is exactly 1 when s1 == s2), while the Z2 orbit quadrature recovers the
    exact cat entropy analytically from the frozen chains - the in-chain
    version of the sector rescue that swap_base_z2 provides for the hybrid
    base (RESULTS.md 6e)."""
    from neural_network_quantum_state_tpu.measurements import renyi2_increment

    m1, p1 = _cat_machine()
    s2_exact = _exact_s2(_psi_vector(m1, p1), 3)
    assert s2_exact > 0.3  # the asymmetric-cat entropy is far from 0
    neel = np.where(np.arange(N) % 2 == 0, 1.0, -1.0)
    kwargs = dict(n_iterations=60, n_sweeps=2, n_warmup=100,
                  walkers_per_level=512, key=7, init_spins=(neel, neel))
    plain, _, _ = renyi2_increment(m1, p1, 3, **kwargs)
    rb, rb_err, _ = renyi2_increment(m1, p1, 3, z2_quadrature=True, **kwargs)
    assert abs(plain - s2_exact) > 0.1, (plain, s2_exact)  # frozen bias
    assert abs(rb - s2_exact) < max(5 * rb_err, 0.05), (rb, s2_exact, rb_err)


def test_swap_base_z2_vs_exact():
    """Z2-orbit-quadrature swap base agrees with exact Tr rho_A^2 (l=1, 3)."""
    from neural_network_quantum_state_tpu.measurements.renyi_increment import swap_base_z2

    m1, p1 = _machine(2)
    psi = _psi_vector(m1, p1)
    psi = psi / np.linalg.norm(psi)
    for l in (1, 3):
        psi_mat = psi.reshape(2 ** (N - l), 2**l)
        rho_a = psi_mat.T @ psi_mat.conj()
        want = -np.log(np.real(np.trace(rho_a @ rho_a)))
        s1 = AmplitudeSampler(m1, p1, n_walkers=1024, key=31 + l)
        s2 = AmplitudeSampler(m1, p1, n_walkers=1024, key=77 + l)
        got, err = swap_base_z2(s1, s2, l, n_iterations=40, n_sweeps=2, n_warmup=120)
        assert abs(got - want) < max(6 * err, 0.05), (l, got, want, err)


@pytest.mark.slow
def test_renyi2_increment_pt_ladder_vs_exact():
    """n_beta > 1 (glued PT ladder): the beta=1 readout still estimates the
    exact S2 - tempered proposals + whole-state swaps must not bias the
    cold chains (verdict round-3 item 3, BACKLOG 'PT ladder for the glued
    sampler')."""
    from neural_network_quantum_state_tpu.measurements import renyi2_increment

    m1, p1 = _machine(2)
    s2_exact = _exact_s2(_psi_vector(m1, p1), 3)
    got, err, per_level = renyi2_increment(
        m1, p1, 3, n_iterations=60, n_sweeps=2, n_warmup=150,
        walkers_per_level=2048, key=13, n_beta=4,
    )
    assert per_level.shape == (3, 3)
    assert abs(got - s2_exact) < max(5 * err, 0.05), (got, s2_exact, err)


def test_glued_pt_sweeps_invariants():
    """Tempered glued sweeps keep the glue invariant and exact ln caches on
    EVERY replica, and whole-state swaps never mix walkers across levels."""
    from neural_network_quantum_state_tpu.measurements import renyi_increment as ri
    from neural_network_quantum_state_tpu.ops.rng import random_spins

    m1, p1 = _machine(4)
    work = m1.make_work(p1)
    n_beta, k = 4, 32
    kk = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(kk, 3)
    level = jnp.repeat(jnp.arange(4, dtype=jnp.int32), 8)  # 8 = 2 chains x 4 replicas
    mask = jnp.arange(N, dtype=jnp.int32)[None, :] < level[:, None]
    s1 = random_spins(k1, k, N, jnp.float64)
    s2 = random_spins(k2, k, N, jnp.float64)
    st = ri.init_glued(work, s1, s2, mask, k3)
    st = ri.glued_sweeps(work, st, jnp.arange(N, dtype=jnp.int32), mask, 5, n_beta)
    s1n, s2n = np.asarray(st.c1.spins), np.asarray(st.c2.spins)
    np.testing.assert_array_equal(np.asarray(st.c3.spins), np.where(mask, s1n, s2n))
    np.testing.assert_array_equal(np.asarray(st.c4.spins), np.where(mask, s2n, s1n))
    for c, ln in ((st.c1, st.ln1), (st.c2, st.ln2), (st.c3, st.ln3), (st.c4, st.ln4)):
        want = engine.log_psi(work, c.spins)
        np.testing.assert_allclose(np.asarray(ln.re), np.asarray(want.re), atol=1e-9)
        np.testing.assert_allclose(np.asarray(ln.im), np.asarray(want.im), atol=1e-9)
    assert float(st.n_accepted) > 0


def test_renyi2_increment_mesh_matches_single_device():
    """mesh=8: the sharded levels x walkers batch reproduces the
    single-device estimate to statistical error (same physics, different
    RNG consumption order is NOT expected - the chains are identical given
    the same key, so the match is exact up to reduction order)."""
    from neural_network_quantum_state_tpu.measurements import renyi2_increment
    from neural_network_quantum_state_tpu.parallel import make_mesh

    m1, p1 = _machine(2)
    kwargs = dict(n_iterations=25, n_sweeps=1, n_warmup=40,
                  walkers_per_level=256, key=21)
    s2_one, err_one, _ = renyi2_increment(m1, p1, 4, **kwargs)
    s2_mesh, err_mesh, _ = renyi2_increment(m1, p1, 4, mesh=make_mesh(8), **kwargs)
    # identical chains (same threefry streams) -> near-identical estimates
    np.testing.assert_allclose(s2_mesh, s2_one, atol=1e-6)

    # PT ladder + mesh compose (replica groups stay shard-local)
    s2_pt, err_pt, _ = renyi2_increment(
        m1, p1, 4, mesh=make_mesh(8), n_beta=2, **kwargs
    )
    s2_exact = _exact_s2(_psi_vector(m1, p1), 4)
    assert abs(s2_pt - s2_exact) < max(6 * err_pt, 0.1), (s2_pt, s2_exact, err_pt)


def test_spin_x_correlation_chunked_matches_unchunked(monkeypatch):
    """The site-chunked flip-ratio path (round-4 verdict weak #8) is
    numerically identical to the single-shot tensor: force a tiny chunk cap
    so every block holds one site and compare against the default path on
    the same sampler state/key."""
    from neural_network_quantum_state_tpu.measurements import estimators

    m1, p1 = _machine(4)
    smp_a = AmplitudeSampler(m1, p1, n_walkers=512, key=44)
    s_a, ss_a = spin_x_correlation(smp_a, n_iterations=5, n_sweeps=1, n_warmup=30)

    monkeypatch.setattr(estimators, "_FLIP_CHUNK_ELEMS", 1)
    smp_b = AmplitudeSampler(m1, p1, n_walkers=512, key=44)
    s_b, ss_b = spin_x_correlation(smp_b, n_iterations=5, n_sweeps=1, n_warmup=30)
    np.testing.assert_allclose(s_b, s_a, rtol=0, atol=1e-10)
    np.testing.assert_allclose(ss_b, ss_a, rtol=0, atol=1e-10)


@pytest.mark.slow
def test_spin_x_correlation_production_shape_mesh():
    """Shape-stress at the N=128/H=512 production scale on the 8-device
    CPU mesh (round-4 verdict item 8): the flip tensor must stay bounded
    by the site-block scan instead of materializing (K, N, H). Tiny walker
    count keeps runtime test-lane-friendly; the chunking threshold is
    lowered so the blocked path actually engages at this K."""
    import neural_network_quantum_state_tpu as nqs
    from neural_network_quantum_state_tpu.measurements import estimators

    n, h = 128, 512
    m = RBM(n_inputs=n, n_hiddens=h, dtype=jnp.float32)
    p = m.init_params(jax.random.PRNGKey(0))
    old = estimators._FLIP_CHUNK_ELEMS
    estimators._FLIP_CHUNK_ELEMS = 1024 * 1024  # chunk = 1M/(64*512) = 32 sites
    try:
        smp = AmplitudeSampler(m, p, n_walkers=64, key=50, mesh=nqs.parallel.make_mesh())
        s, ss = spin_x_correlation(smp, n_iterations=2, n_sweeps=1, n_warmup=5)
    finally:
        estimators._FLIP_CHUNK_ELEMS = old
    assert s.shape == (n,) and ss.shape == (n, n)
    assert np.all(np.isfinite(s)) and np.all(np.isfinite(ss))
    assert np.all(np.abs(s) <= 1.05) and np.all(np.abs(ss) <= 1.05)
