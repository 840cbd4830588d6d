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
        mesh=None,
        use_fused: bool = False,
    ):
        """n_beta > 1 enables replica-exchange (parallel-tempered) sampling:
        n_walkers total chains hold n_walkers/n_beta physical chains x
        n_beta tempered replicas (replica-minor layout); ``spins``/``lnpsi``
        expose only the beta=1 slice. Use for near-critical/ordered states
        where plain Metropolis is metastable (the reference's measurement
        classes lack this; its PT machinery is training-side CPU-only).

        mesh: optional ``jax.sharding.Mesh`` - the walker axis shards across
        it (parameters replicate) and every estimator's walker reductions
        lower to mesh collectives, exactly like the training step. The
        reference is single-GPU here (Sampler4SpinHalf, meas.cuh:11-28)."""
        self.machine = machine
        self.params = params
        self.work = machine.make_work(params)
        if n_beta > 1 and n_walkers % n_beta != 0:
            raise ValueError("n_walkers must be a multiple of n_beta")
        self.n_beta = n_beta
        self.mesh = mesh
        # fused Pallas sweeps (f32 machines; n_beta > 1 runs the replica-
        # exchange chain in-kernel - swap phases included)
        self.use_fused = use_fused
        if use_fused and jnp.dtype(machine.real_dtype) != jnp.float32:
            raise ValueError("use_fused requires a float32 machine")
        if isinstance(key, int):
            key = jax.random.PRNGKey(key)
        kinit, krun = jax.random.split(key)
        if init_spins is None:
            init_spins = random_spins(kinit, n_walkers, machine.n_inputs, machine.real_dtype)
        self.schedule = jnp.asarray(schedule if schedule is not None else sequential(machine.n_inputs))
        self.state = metropolis.init_state(self.work, init_spins, krun)
        if mesh is not None:
            from neural_network_quantum_state_tpu.parallel import mesh as meshlib

            # replica-minor layout keeps each physical chain's n_beta
            # replicas contiguous; shard whole chains (n_walkers leading dim)
            self.state = meshlib.shard_walker_tree(self.state, mesh, n_walkers)
            self.work = machine.make_work(meshlib.replicate_tree(params, mesh))

    # -- reference API surface -------------------------------------------
    def warm_up(self, n_sweeps: int) -> None:
        self.do_mcmc_steps(n_sweeps)

    def _advance_fn(self, n_sweeps: int):
        """Pure state -> state advance of n_sweeps (traceable inside jit)."""
        work, sched, nb = self.work, self.schedule, self.n_beta
        if self.use_fused:
            if self.mesh is not None:
                interp = self.mesh.devices.ravel()[0].platform == "cpu"
                fused = metropolis.make_fused_sharded_sweeps(self.mesh, interpret=interp, n_beta=nb)
                return lambda state: fused(work, state, sched, n_sweeps)
            return lambda state: metropolis.sweeps_fused(work, state, sched, n_sweeps, n_beta=nb)
        if nb > 1:
            from neural_network_quantum_state_tpu.sampler import tempering

            return lambda state: tempering.tempering_sweeps(work, state, sched, n_sweeps, nb)
        return lambda state: metropolis.sweeps(work, state, sched, n_sweeps)

    def do_mcmc_steps(self, n_sweeps: int) -> None:
        self.state = self._advance_fn(n_sweeps)(self.state)

    def _beta1(self, tree):
        """beta=1 replica slice of a per-walker pytree (replica-minor)."""
        if self.n_beta == 1:
            return tree
        return jax.tree_util.tree_map(lambda x: x[:: self.n_beta], tree)

    # Per-call scan-chunk bound used by run_estimator / run_pair_estimator
    # when the caller doesn't pass ``chunk`` explicitly; drivers.measure
    # sets it from -mchunk. 0 = one monolithic scan (the default).
    scan_chunk: int = 0

    def run_estimator(self, accum_fn, n_iterations: int, n_sweeps: int = 1, chunk: int | None = None):
        """Run ``n_iterations`` of (advance n_sweeps; accum_fn(cache, lnpsi))
        as ONE device computation (lax.scan) and return accum_fn's outputs
        stacked on axis 0, as host numpy.

        This removes the per-iteration host round trip of the naive loop
        (measured 15-30 ms dispatch latency through the remote TPU tunnel,
        dominating measure-driver wall clock at niter=500); the training
        loop batches steps the same way (vmc.py steps_per_host_loop).
        ``accum_fn`` receives the beta=1 slice under tempering.

        ``chunk`` > 0 splits the scan into ceil(n/chunk)-many device calls
        of at most ``chunk`` iterations each: the remote-tunnel worker
        enforces a per-call watchdog, and one monolithic scan at large
        system size can exceed it (the Hubbard L=32 trap training chunks
        died this way at ~55 s/call; see drivers.train -mloop). The
        chunk-sized executable is compiled once and reused. ``chunk=None``
        falls back to ``self.scan_chunk``."""
        if chunk is None:
            chunk = self.scan_chunk
        adv = self._advance_fn(n_sweeps)

        def body(state, _):
            state = adv(state)
            return state, accum_fn(self._beta1(state.cache), self._beta1(state.lnpsi))

        def make_runner(length):
            @jax.jit
            def runner(state):
                return jax.lax.scan(body, state, None, length=length)

            return runner

        if chunk <= 0 or chunk >= n_iterations:
            self.state, outs = make_runner(n_iterations)(self.state)
            return jax.device_get(outs)

        import numpy as np

        n_full, rem = divmod(n_iterations, chunk)
        runner = make_runner(chunk)
        pieces = []
        for _ in range(n_full):
            self.state, o = runner(self.state)
            pieces.append(jax.device_get(o))
        if rem:
            self.state, o = make_runner(rem)(self.state)
            pieces.append(jax.device_get(o))
        return jax.tree_util.tree_map(lambda *xs: np.concatenate(xs, axis=0), *pieces)

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


def run_pair_estimator(
    s1: AmplitudeSampler,
    s2: AmplitudeSampler,
    accum_fn,
    n_iterations: int,
    n_sweeps: int = 1,
    chunk: int | None = None,
):
    """Two-replica variant of :meth:`AmplitudeSampler.run_estimator`: both
    samplers advance in lock-step inside one device-side lax.scan (the
    Renyi/fidelity pattern, impl_meas.cuh:57-99). ``accum_fn(c1, ln1, c2,
    ln2)`` sees the beta=1 slices. Under a mesh, both replicas carry the
    same walker sharding, so the swap/cross terms are device-local
    (SURVEY.md 7 'hard parts': replicas must be co-located). ``chunk``
    splits the scan into bounded device calls exactly like
    :meth:`AmplitudeSampler.run_estimator`; ``None`` falls back to the
    larger of the two samplers' ``scan_chunk``."""
    if chunk is None:
        chunk = max(s1.scan_chunk, s2.scan_chunk)
    adv1, adv2 = s1._advance_fn(n_sweeps), s2._advance_fn(n_sweeps)

    def body(carry, _):
        st1, st2 = carry
        st1, st2 = adv1(st1), adv2(st2)
        out = accum_fn(
            s1._beta1(st1.cache), s1._beta1(st1.lnpsi), s2._beta1(st2.cache), s2._beta1(st2.lnpsi)
        )
        return (st1, st2), out

    def make_runner(length):
        @jax.jit
        def runner(st1, st2):
            return jax.lax.scan(body, (st1, st2), None, length=length)

        return runner

    if chunk <= 0 or chunk >= n_iterations:
        (s1.state, s2.state), outs = make_runner(n_iterations)(s1.state, s2.state)
        return jax.device_get(outs)

    import numpy as np

    n_full, rem = divmod(n_iterations, chunk)
    runner = make_runner(chunk)
    pieces = []
    for _ in range(n_full):
        (s1.state, s2.state), o = runner(s1.state, s2.state)
        pieces.append(jax.device_get(o))
    if rem:
        (s1.state, s2.state), o = make_runner(rem)(s1.state, s2.state)
        pieces.append(jax.device_get(o))
    return jax.tree_util.tree_map(lambda *xs: np.concatenate(xs, axis=0), *pieces)
