"""Ansatz-only amplitude sampler for measurements.

Equivalent of the reference's Sampler4SpinHalf (gpu/include/meas.cuh:11-28,
impl_meas.cuh:5-41): Markov chains driven purely by |psi|^2 of one machine
(no Hamiltonian), exposing exactly the primitives the measurement estimators
and the pynqs Python binding need - sample, read states, evaluate ln psi on
fixed spins (pywrapping_sampler.cu:20-132).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from neural_network_quantum_state_tpu.models.base import Machine, Params
from neural_network_quantum_state_tpu.ops import cplx, engine
from neural_network_quantum_state_tpu.ops.cplx import C
from neural_network_quantum_state_tpu.ops.rng import random_spins
from neural_network_quantum_state_tpu.sampler import metropolis
from neural_network_quantum_state_tpu.sampler.schedule import sequential


class AmplitudeSampler:
    """Stateful convenience wrapper (host-side) around the pure sampler.

    Sequential site sweep (the measurement-side order, impl_meas.cuh:5-41).
    """

    def __init__(
        self,
        machine: Machine,
        params: Params,
        n_walkers: int,
        key: jax.Array | int = 0,
        init_spins: Optional[jnp.ndarray] = None,
        schedule: Optional[np.ndarray] = None,
        n_beta: int = 1,
    ):
        """n_beta > 1 enables replica-exchange (parallel-tempered) sampling:
        n_walkers total chains hold n_walkers/n_beta physical chains x
        n_beta tempered replicas (replica-minor layout); ``spins``/``lnpsi``
        expose only the beta=1 slice. Use for near-critical/ordered states
        where plain Metropolis is metastable (the reference's measurement
        classes lack this; its PT machinery is training-side CPU-only)."""
        self.machine = machine
        self.params = params
        self.work = machine.make_work(params)
        if n_beta > 1 and n_walkers % n_beta != 0:
            raise ValueError("n_walkers must be a multiple of n_beta")
        self.n_beta = n_beta
        if isinstance(key, int):
            key = jax.random.PRNGKey(key)
        kinit, krun = jax.random.split(key)
        if init_spins is None:
            init_spins = random_spins(kinit, n_walkers, machine.n_inputs, machine.real_dtype)
        self.schedule = jnp.asarray(schedule if schedule is not None else sequential(machine.n_inputs))
        self.state = metropolis.init_state(self.work, init_spins, krun)

    # -- reference API surface -------------------------------------------
    def warm_up(self, n_sweeps: int) -> None:
        self.do_mcmc_steps(n_sweeps)

    def do_mcmc_steps(self, n_sweeps: int) -> None:
        if self.n_beta > 1:
            from neural_network_quantum_state_tpu.sampler import tempering

            self.state = tempering.tempering_sweeps(
                self.work, self.state, self.schedule, n_sweeps, self.n_beta
            )
        else:
            self.state = metropolis.sweeps(self.work, self.state, self.schedule, n_sweeps)

    @property
    def spins(self) -> jnp.ndarray:
        """Current spin states (K, N) - get_quantumStates(). With tempering,
        only the beta=1 replicas (impl_mcmc_sampler.hpp:193-205)."""
        return self.state.cache.spins[:: self.n_beta]

    @property
    def lnpsi(self) -> C:
        """ln psi of the current states (K,) - get_lnpsi(); beta=1 slice."""
        return C(self.state.lnpsi.re[:: self.n_beta], self.state.lnpsi.im[:: self.n_beta])

    def log_psi(self, spins: jnp.ndarray) -> C:
        """ln psi on fixed spin configurations - get_lnpsi_for_fixed_spins()."""
        return engine.log_psi(self.work, spins.astype(self.machine.real_dtype))

    @property
    def n_walkers(self) -> int:
        """Effective estimator walkers (beta=1 replicas under tempering)."""
        return int(self.state.cache.spins.shape[0]) // self.n_beta

    @property
    def n_inputs(self) -> int:
        return self.machine.n_inputs
