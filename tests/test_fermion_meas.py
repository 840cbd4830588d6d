"""Pair-OPDM estimator vs exact sector-restricted expectation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_network_quantum_state_tpu.measurements.fermion import FermionAmplitudeSampler, opdm_pair
from neural_network_quantum_state_tpu.models import RBM
from neural_network_quantum_state_tpu.ops import cplx, engine

L = 3  # 6 JW spins
N_UP = N_DN = 2


def _exact_opdm(machine, params, n, m):
    """Exact <Op> over the (N_UP, N_DN) sector: Op matrix built from the
    estimator's matrix-element convention, psi from full enumeration."""
    n_in = 2 * L
    dim = 2**n_in
    idx = np.arange(dim)
    bits = (idx[:, None] >> np.arange(n_in)[None, :]) & 1
    s = 1.0 - 2.0 * bits
    occ = (1 + s) / 2
    sector = (occ[:, :L].sum(1) == N_UP) & (occ[:, L:].sum(1) == N_DN)

    all_spins = jnp.asarray(s, jnp.float64)
    ln = engine.log_psi(machine.make_work(params), all_spins)
    psi = np.exp(np.asarray(cplx.to_complex(ln)))
    psi = np.where(sector, psi, 0.0)
    p = np.abs(psi) ** 2
    p /= p.sum()

    if m == 0:
        local = 0.25 * (1 + s[:, n]) * (1 + s[:, L + n])
        return np.sum(p * local)
    flip_mask = (1 << n) | (1 << (n + m)) | (1 << (L + n)) | (1 << (L + n + m))
    flipped = idx ^ flip_mask
    string = np.prod(s[:, n + 1 : n + m] * s[:, L + n + 1 : L + n + m], axis=1)
    coeff = (
        (1 / 16)
        * (1 + s[:, n + m])
        * (1 + s[:, L + n + m])
        * (1 - s[:, n])
        * (1 - s[:, L + n])
        * string
    )
    ratio = np.where(np.abs(psi) > 0, psi[flipped] / np.where(psi == 0, 1.0, psi), 0.0)
    return np.sum(p * coeff * ratio)


@pytest.mark.slow
def test_opdm_vs_exact():
    machine = RBM(n_inputs=2 * L, n_hiddens=10, dtype=jnp.float64)
    params = machine.init_params(jax.random.PRNGKey(4))
    for n, m in [(0, 0), (0, 1), (0, 2), (1, 1)]:
        want = _exact_opdm(machine, params, n, m)
        smp = FermionAmplitudeSampler(machine, params, n_walkers=4096, n_up=N_UP, n_down=N_DN, key=21)
        got = opdm_pair(smp, n, m, n_iterations=25, n_sweeps=2, n_warmup=150)
        assert abs(got.real - want.real) < 0.03, (n, m, got, want)
        assert abs(got.imag - want.imag) < 0.03, (n, m, got, want)


def test_opdm_on_mesh_matches_single_device():
    """FermionAmplitudeSampler(mesh=...): the walker-sharded OPDM estimate
    agrees with single-device to statistical error, and sector conservation
    holds per shard."""
    from neural_network_quantum_state_tpu.parallel import mesh as meshlib

    machine = RBM(n_inputs=2 * L, n_hiddens=10, dtype=jnp.float64)
    params = machine.init_params(jax.random.PRNGKey(4))
    mesh = meshlib.make_mesh()
    want = _exact_opdm(machine, params, 0, 1)
    smp = FermionAmplitudeSampler(
        machine, params, n_walkers=4096, n_up=N_UP, n_down=N_DN, key=7, mesh=mesh
    )
    got = opdm_pair(smp, 0, 1, n_iterations=25, n_sweeps=2, n_warmup=150)
    assert abs(got.real - want.real) < 0.03, (got, want)
    s = np.asarray(smp.spins)
    assert np.all(((1 + s[:, :L]) / 2).sum(1) == N_UP)
    assert np.all(((1 + s[:, L:]) / 2).sum(1) == N_DN)


def test_fermion_sampler_conserves():
    machine = RBM(n_inputs=2 * L, n_hiddens=6, dtype=jnp.float64)
    params = machine.init_params(jax.random.PRNGKey(5))
    smp = FermionAmplitudeSampler(machine, params, n_walkers=64, n_up=1, n_down=2, key=3)
    smp.do_mcmc_steps(15)
    s = np.asarray(smp.spins)
    assert np.all(((1 + s[:, :L]) / 2).sum(1) == 1)
    assert np.all(((1 + s[:, L:]) / 2).sum(1) == 2)


@pytest.mark.slow
def test_fermion_sampler_fused_matches_xla():
    """use_fused=True drives the fermion estimator through the Pallas
    exchange kernel (interpret mode off-TPU): density profile and double
    occupancy agree with the XLA-scan sampler within MC error."""
    import jax
    import jax.numpy as jnp

    from neural_network_quantum_state_tpu.measurements.fermion import (
        FermionAmplitudeSampler,
        density_profile,
        opdm_pair,
    )
    from neural_network_quantum_state_tpu.models import RBM

    l = 3
    machine = RBM(n_inputs=2 * l, n_hiddens=8, dtype=jnp.float32)
    params = machine.init_params(jax.random.PRNGKey(3))
    f1 = FermionAmplitudeSampler(machine, params, 1024, 1, 1, key=5)
    f2 = FermionAmplitudeSampler(machine, params, 1024, 1, 1, key=6, use_fused=True)
    d1 = density_profile(f1, 40, 2, 150)
    d2 = density_profile(f2, 40, 2, 150)
    assert abs(d1.sum() - 2.0) < 1e-5 and abs(d2.sum() - 2.0) < 1e-5
    np.testing.assert_allclose(d1, d2, atol=0.05)
    o1 = opdm_pair(f1, 0, 1, 40, 2, 50)
    o2 = opdm_pair(f2, 0, 1, 40, 2, 50)
    assert abs(o1.real - o2.real) < 0.05


@pytest.mark.slow
def test_fermion_sampler_fused_on_mesh_matches_single_device():
    """use_fused + mesh: the shard_map'd Pallas exchange kernel (a bare
    pallas_call is opaque to GSPMD and would be all-gathered) advances the
    sharded ensemble; density agrees with the single-device fused sampler
    within MC error and the sector is conserved per walker."""
    from neural_network_quantum_state_tpu.measurements.fermion import (
        FermionAmplitudeSampler,
        density_profile,
    )
    from neural_network_quantum_state_tpu.models import RBM
    from neural_network_quantum_state_tpu.parallel import mesh as meshlib

    l = 3
    machine = RBM(n_inputs=2 * l, n_hiddens=8, dtype=jnp.float32)
    params = machine.init_params(jax.random.PRNGKey(3))
    mesh = meshlib.make_mesh()
    f1 = FermionAmplitudeSampler(machine, params, 1024, 1, 1, key=5, use_fused=True)
    f2 = FermionAmplitudeSampler(machine, params, 1024, 1, 1, key=6, use_fused=True, mesh=mesh)
    d1 = density_profile(f1, 40, 2, 150)
    d2 = density_profile(f2, 40, 2, 150)
    assert abs(d2.sum() - 2.0) < 1e-5
    np.testing.assert_allclose(d1, d2, atol=0.05)
    s = np.asarray(f2.spins)
    assert np.all(((1 + s[:, :l]) / 2).sum(1) == 1)
    assert np.all(((1 + s[:, l:]) / 2).sum(1) == 1)


def test_fermion_run_estimator_chunked_matches_monolithic():
    """FermionAmplitudeSampler.run_estimator(chunk=...) must reproduce the
    monolithic scan exactly (chain advance is deterministic) - the
    remote-tunnel watchdog mitigation of drivers.measure -mchunk."""
    machine = RBM(n_inputs=2 * L, n_hiddens=8, dtype=jnp.float64)
    params = machine.init_params(jax.random.PRNGKey(3))

    def accum(cache, lnpsi):
        return jnp.mean(cache.spins), jnp.mean(lnpsi.re)

    def run(chunk):
        smp = FermionAmplitudeSampler(
            machine, params, n_walkers=64, n_up=N_UP, n_down=N_DN, key=7
        )
        smp.warm_up(10)
        return smp.run_estimator(accum, 15, n_sweeps=2, chunk=chunk)

    mono, chunked = run(0), run(4)  # 4+4+4+3: remainder executable too
    for a, b in zip(mono, chunked):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=0)
    assert np.asarray(mono[0]).shape == (15,)
