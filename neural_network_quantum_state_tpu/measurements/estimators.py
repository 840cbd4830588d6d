"""Measurement estimators (reference L7).

TPU-native ports of cpu/include/measurements.hpp:13-483 and
gpu/include/meas.cuh:11-283 (+impl_meas.cuh): every estimator is a host
loop over jitted, walker-batched device steps. Conventions (means over
chains x iterations, error bars, conjugations) follow the reference
exactly; citations on each function.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from neural_network_quantum_state_tpu.measurements.sampler import AmplitudeSampler
from neural_network_quantum_state_tpu.ops import cplx, engine
from neural_network_quantum_state_tpu.ops.cplx import C


# ---------------------------------------------------------------------------
def measure_energy(vmc_or_pair, n_trials: int, n_sweeps: int = 1):
    """<Etilde> over n_trials sampling rounds, mean +/- std-of-trial-means
    (free fn meas_energy, cpu measurements.hpp:123-144).

    Accepts a (sampler_step, energy_fn) pair via a VMC-like object exposing
    ``sample_and_energy()`` or an (AmplitudeSampler, hamiltonian) tuple.
    """
    sampler, ham = vmc_or_pair
    means = []
    for _ in range(n_trials):
        sampler.do_mcmc_steps(n_sweeps)
        ht = ham.local_energy(sampler.work, sampler.state.cache, sampler.state.lnpsi)
        means.append(complex(float(jnp.mean(ht.re)), float(jnp.mean(ht.im))))
    means = np.asarray(means)
    err = means.real.std(ddof=1) / np.sqrt(n_trials) if n_trials > 1 else 0.0
    return means.mean(), err


# ---------------------------------------------------------------------------
def _abs_mag_moments(sampler: AmplitudeSampler, coeff: Optional[jnp.ndarray], n_iterations, n_sweeps, n_warmup):
    """Shared core of MeasSpontaneousMagnetization / MeasOrderParameter
    (impl_meas.cuh:418-505): m = |(1/N) sum_i coeff_i s_i| per walker;
    returns (m1, m2, m4) = (<m>, <m^2>, <m^4>)."""
    sampler.warm_up(n_warmup)
    n = sampler.n_inputs
    rdt = sampler.machine.real_dtype
    if coeff is None:
        co = C(jnp.ones((n,), rdt), jnp.zeros((n,), rdt))
    elif isinstance(coeff, C):
        co = coeff
    else:
        z = np.asarray(coeff)  # split on host: TPU has no complex dtypes
        co = C(jnp.asarray(z.real, rdt), jnp.asarray(np.imag(z), rdt))

    @jax.jit
    def mag_abs(spins):
        m = C(spins @ co.re, spins @ co.im) * (1.0 / n)
        return jnp.sqrt(cplx.abs2(m))

    m1 = m2 = m4 = 0.0
    for _ in range(n_iterations):
        sampler.do_mcmc_steps(n_sweeps)
        mag = np.asarray(mag_abs(sampler.spins))
        m1 += mag.mean()
        m2 += (mag**2).mean()
        m4 += (mag**4).mean()
    return m1 / n_iterations, m2 / n_iterations, m4 / n_iterations


def spontaneous_magnetization(sampler: AmplitudeSampler, n_iterations: int, n_sweeps: int = 1, n_warmup: int = 100):
    """m1=<|m|>, m2=<m^2>, m4=<m^4> (MeasSpontaneousMagnetization,
    gpu meas.cuh:182-198, cpu measurements.hpp:153-249)."""
    return _abs_mag_moments(sampler, None, n_iterations, n_sweeps, n_warmup)


def order_parameter(sampler: AmplitudeSampler, coeff, n_iterations: int, n_sweeps: int = 1, n_warmup: int = 100):
    """Generic coefficient-weighted magnetization moments (MeasOrderParameter,
    gpu meas.cuh:202-219)."""
    return _abs_mag_moments(sampler, coeff, n_iterations, n_sweeps, n_warmup)


def neel_order(sampler: AmplitudeSampler, l: int, n_iterations: int, n_sweeps: int = 1, n_warmup: int = 100):
    """Staggered magnetization on the square lattice: coeff = (-1)^(i+j)
    (MeasNeelOrder, cpu measurements.hpp:359-482)."""
    i, j = np.meshgrid(np.arange(l), np.arange(l), indexing="ij")
    coeff = jnp.asarray(((-1.0) ** (i + j)).ravel())
    return _abs_mag_moments(sampler, coeff, n_iterations, n_sweeps, n_warmup)


# ---------------------------------------------------------------------------
def overlap_integral(
    sampler: AmplitudeSampler,
    work2: engine.Work,
    n_trials: int,
    n_warmup: int = 100,
    n_sweeps: int = 1,
):
    """<psi1|psi2>/<psi1|psi1> ~ < exp(lnpsi2 - lnpsi1) >_{|psi1|^2}, with
    per-trial means and their stddevs (MeasOverlapIntegral,
    impl_meas.cuh:145-196; cpu measurements.hpp:13-120).
    Returns (mean complex, re_err, im_err)."""
    sampler.warm_up(n_warmup)

    @jax.jit
    def trial(spins, lnpsi1):
        lnpsi2 = engine.log_psi(work2, spins)
        r = cplx.cexp(lnpsi2 - lnpsi1)
        return jnp.mean(r.re), jnp.mean(r.im)

    vals = []
    for _ in range(n_trials):
        sampler.do_mcmc_steps(n_sweeps)
        re, im = trial(sampler.spins, sampler.lnpsi)
        vals.append(complex(float(re), float(im)))
    vals = np.asarray(vals)
    mean = vals.mean()
    re_err = vals.real.std(ddof=1) if n_trials > 1 else 0.0
    im_err = vals.imag.std(ddof=1) if n_trials > 1 else 0.0
    return mean, re_err, im_err


# ---------------------------------------------------------------------------
def renyi2_entropy(
    sampler1: AmplitudeSampler,
    sampler2: AmplitudeSampler,
    l: int,
    n_iterations: int,
    n_sweeps: int = 1,
    n_warmup: int = 100,
    return_error: bool = False,
):
    """S2 = -log Tr rho_A^2 via the swap trick on two independent replicas
    (MeasRenyiEntropy, impl_meas.cuh:57-142): swap sites [l, N) between the
    replicas and average conj(exp(ln3 + ln4 - ln1 - ln2)).

    Subsystem A = sites [0, l); both replicas sample |psi|^2.
    """
    n = sampler1.n_inputs
    if not (0 <= l < n):
        raise ValueError("l out of range")
    work = sampler1.work
    sampler1.warm_up(n_warmup)
    sampler2.warm_up(n_warmup)

    region = jnp.arange(n) >= l  # sites swapped between replicas

    @jax.jit
    def swap_ratio(s1, s2, ln1: C, ln2: C):
        s3 = jnp.where(region[None, :], s2, s1)
        s4 = jnp.where(region[None, :], s1, s2)
        ln3 = engine.log_psi(work, s3)
        ln4 = engine.log_psi(work, s4)
        r = cplx.cexp(ln3 + ln4 - ln1 - ln2)
        # conj then accumulate (meas__GetRho2local__): only Re survives the mean
        return jnp.mean(r.re), jnp.mean(-r.im)

    vals = []
    for _ in range(n_iterations):
        sampler1.do_mcmc_steps(n_sweeps)
        sampler2.do_mcmc_steps(n_sweeps)
        re, _ = swap_ratio(sampler1.spins, sampler2.spins, sampler1.lnpsi, sampler2.lnpsi)
        vals.append(float(re))
    tr2 = np.asarray(vals)
    rho2 = tr2.mean()
    s2 = float(-np.log(rho2))
    if return_error:
        # error bar convention of python/meas_renyi.py:57-58:
        # err(Tr rho^2) = sqrt(sum (x - mean)^2 / (n (n-1))), propagated
        # through -log as err/mean
        if n_iterations > 1:
            err_tr2 = float(np.sqrt(np.sum((tr2 - rho2) ** 2) / (n_iterations * (n_iterations - 1))))
        else:
            err_tr2 = 0.0
        return s2, err_tr2 / max(rho2, 1e-300)
    return s2


# ---------------------------------------------------------------------------
def fidelity(
    sampler1: AmplitudeSampler,
    sampler2: AmplitudeSampler,
    n_meas: int,
    n_warmup: int = 100,
    n_sweeps: int = 1,
):
    """|<psi1|psi2>| via two-replica cross ratios (MeasFidelity,
    impl_meas.cuh:199-268): per-iteration r_n = Re mean_k of
    conj(exp(ln<s2|psi1> + ln<s1|psi2> - ln<s1|psi1> - ln<s2|psi2>));
    returns (sqrt(mean r), jackknife-style err)."""
    work1, work2 = sampler1.work, sampler2.work
    sampler1.warm_up(n_warmup)
    sampler2.warm_up(n_warmup)

    @jax.jit
    def cross_ratio(s1, s2, ln1: C, ln2: C):
        ln3 = engine.log_psi(work1, s2)  # <sigma_2|psi_1>
        ln4 = engine.log_psi(work2, s1)  # <sigma_1|psi_2>
        r = cplx.cexp(ln3 + ln4 - ln1 - ln2)
        return jnp.mean(r.re)

    r_list = []
    for _ in range(n_meas):
        sampler1.do_mcmc_steps(n_sweeps)
        sampler2.do_mcmc_steps(n_sweeps)
        r_list.append(float(cross_ratio(sampler1.spins, sampler2.spins, sampler1.lnpsi, sampler2.lnpsi)))
    r = np.asarray(r_list)
    rho_mean = float(np.sqrt(np.mean(r)))
    if n_meas > 1:
        err = float(np.sqrt(np.sum((np.sqrt(np.abs(r)) - rho_mean) ** 2) / ((n_meas - 1) * n_meas)))
    else:
        err = 0.0
    return rho_mean, err


# ---------------------------------------------------------------------------
def spin_z_correlation(sampler: AmplitudeSampler, n_iterations: int, n_sweeps: int = 1, n_warmup: int = 100):
    """<s_i s_j> matrix via walker-axis rank-K updates (herk accumulation,
    MeasSpinZSpinZCorrelation, impl_meas.cuh:271-312)."""
    sampler.warm_up(n_warmup)
    n = sampler.n_inputs

    @jax.jit
    def accum(spins):
        return spins.T @ spins / spins.shape[0]

    ss = np.zeros((n, n))
    for _ in range(n_iterations):
        sampler.do_mcmc_steps(n_sweeps)
        ss += np.asarray(accum(sampler.spins))
    return ss / n_iterations


def spin_x_correlation(sampler: AmplitudeSampler, n_iterations: int, n_sweeps: int = 1, n_warmup: int = 100):
    """<sigma^x_i> and <sigma^x_i sigma^x_j> via 1-flip and 2-flip amplitude
    ratios (MeasSpinXSpinXCorrelation, impl_meas.cuh:315-470; cpu
    measurements.hpp:252-356). The reference's N^2 sequential forwards
    become one batched flip-tensor per row i (lax.map over i).

    Returns (s (N,), ss (N,N)) with ss_ij filled for i < j (and symmetrized).
    """
    sampler.warm_up(n_warmup)
    n = sampler.n_inputs
    work = sampler.work
    sites = jnp.arange(n, dtype=jnp.int32)

    @jax.jit
    def accum(cache: engine.Cache, lnpsi: C):
        # <sigma^x_i>: all single flips at once
        ln1 = engine.all_flip_log_psi(work, cache, sites)  # (K, N)
        d1 = C(ln1.re - lnpsi.re[:, None], ln1.im - lnpsi.im[:, None])
        s_acc = jnp.mean(cplx.cexp(d1).re, axis=0)  # (N,)

        # <sigma^x_i sigma^x_j>: flip i committed, then all flips j
        def row(i):
            k = cache.spins.shape[0]
            ci = engine.commit_flip(work, cache, i, jnp.ones((k,), bool))
            ln2 = engine.all_flip_log_psi(work, ci, sites)  # (K, N)
            d2 = C(ln2.re - lnpsi.re[:, None], ln2.im - lnpsi.im[:, None])
            return jnp.mean(cplx.cexp(d2).re, axis=0)  # (N,)

        ss_acc = jax.lax.map(row, sites)  # (N, N)
        return s_acc, ss_acc

    s = np.zeros(n)
    ss = np.zeros((n, n))
    for _ in range(n_iterations):
        sampler.do_mcmc_steps(n_sweeps)
        s_a, ss_a = accum(sampler.state.cache, sampler.lnpsi)
        s += np.asarray(s_a)
        ss += np.asarray(ss_a)
    s /= n_iterations
    ss /= n_iterations
    np.fill_diagonal(ss, 1.0)  # sigma^x_i sigma^x_i = identity
    return s, ss
