"""Fermion measurements: particle-conserving sampler + pair OPDM.

Reference: fermion::jordanwigner::Sampler4SpinHalf and MeasOPDM
(gpu/include/meas.cuh:226-283, impl_meas.cuh:505-688). The estimator is the
pair one-particle density matrix

    OPDM(n,m) = <psi| c+_{n+m,up} c+_{n+m,dn} c_{n,dn} c_{n,up} |psi>

with JW-string local value (meas__OPDM__ kernels, impl_meas.cuh:648-686):

    m>0: 1/16 (1+s^up_{n+m})(1+s^dn_{n+m})(1-s^up_n)(1-s^dn_n)
              * prod_{l=n+1}^{n+m-1} s^up_l s^dn_l * psi(flip)/psi(s)
    m=0: 1/4 (1+s^up_n)(1+s^dn_n)          (double occupancy)

where flip negates sites n and n+m in both flavor sectors.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from neural_network_quantum_state_tpu.models.base import Machine, Params
from neural_network_quantum_state_tpu.ops import cplx, engine
from neural_network_quantum_state_tpu.sampler import kawasaki, metropolis


class FermionAmplitudeSampler:
    """|psi|^2 sampler with Kawasaki pair-exchange proposals (conserves
    per-flavor particle numbers) - fermion Sampler4SpinHalf."""

    def __init__(
        self,
        machine: Machine,
        params: Params,
        n_walkers: int,
        n_up: int,
        n_down: int,
        key: jax.Array | int = 0,
        per_flavor_rings: bool = True,
        mesh=None,
        use_fused: bool = False,
        n_beta: int = 1,
    ):
        """mesh: optional ``jax.sharding.Mesh`` - the walker axis shards
        across it exactly like :class:`AmplitudeSampler`. The Kawasaki
        proposal is walker-local (each chain picks its own bond from its own
        spin state), so the exchange sweep needs no cross-device traffic;
        only the estimator's mean lowers to a collective.

        n_beta > 1 enables replica-exchange (parallel-tempered) exchange
        sampling (kawasaki.tempered_exchange_sweeps): n_walkers total chains
        = n_walkers/n_beta physical chains x n_beta tempered replicas,
        replica-minor; ``spins``/``lnpsi``/estimators expose the beta=1
        slice. Sector-preserving by construction (swaps exchange whole
        in-sector configurations). Use for slow-mixing trapped/ordered
        fermion states (RESULTS.md: the L=32 trap needed nwarm=5000 with
        plain exchange). XLA path only (incompatible with use_fused)."""
        if machine.n_inputs % 2 != 0:
            raise ValueError("fermion machines need 2L inputs")
        if n_beta > 1 and n_walkers % n_beta != 0:
            raise ValueError("n_walkers must be a multiple of n_beta")
        if n_beta > 1 and use_fused:
            raise ValueError("use_fused does not implement tempered exchange (set n_beta=1)")
        self.n_beta = n_beta
        self.machine = machine
        self.params = params
        self.work = machine.make_work(params)
        self.l = machine.n_inputs // 2
        self.mesh = mesh
        if isinstance(key, int):
            key = jax.random.PRNGKey(key)
        kinit, krun = jax.random.split(key)
        from neural_network_quantum_state_tpu.hamiltonians.hubbard import HubbardChain

        ham = HubbardChain(n_sites=machine.n_inputs, n_up=n_up, n_down=n_down)
        spins = ham.init_spins(kinit, n_walkers, machine.real_dtype)
        self.bonds = (
            jnp.asarray(kawasaki.two_ring_bonds(self.l))
            if per_flavor_rings
            else jnp.asarray(kawasaki.ring_bonds(machine.n_inputs))
        )
        self.n_unit_steps = machine.n_inputs
        self.state = metropolis.init_state(self.work, spins, krun)
        if use_fused and jnp.dtype(machine.real_dtype) != jnp.float32:
            raise ValueError("use_fused requires a float32 machine")
        self.use_fused = use_fused
        self._bonds_tuple = tuple(map(tuple, np.asarray(self.bonds).tolist()))
        if mesh is not None:
            from neural_network_quantum_state_tpu.parallel import mesh as meshlib

            self.state = meshlib.shard_walker_tree(self.state, mesh, n_walkers)
            self.work = machine.make_work(meshlib.replicate_tree(params, mesh))

    def _advance_fn(self, n_sweeps: int):
        """One (jit-friendly) sweep-advance closure: fused Pallas exchange
        kernel (per-walker pair choice as static MXU matmuls,
        ops.pallas_exchange) or the XLA scan."""
        work, bonds, nus = self.work, self.bonds, self.n_unit_steps
        if self.n_beta > 1:
            nb = self.n_beta
            return lambda state: kawasaki.tempered_exchange_sweeps(work, state, bonds, n_sweeps, nus, nb)
        if self.use_fused:
            bonds_t = self._bonds_tuple
            if self.mesh is not None:
                # a bare pallas_call is opaque to GSPMD (it would be
                # all-gathered and run replicated); shard_map it over the
                # walker axis like VMC's exchange training path (vmc.py)
                interp = self.mesh.devices.ravel()[0].platform == "cpu"
                fused_ex = kawasaki.make_fused_exchange_sharded_sweeps(
                    self.mesh, bonds_t, nus, interpret=interp
                )
                return lambda state: fused_ex(work, state, n_sweeps)
            interp = jax.devices()[0].platform == "cpu"

            def adv(state):
                return kawasaki.exchange_sweeps_fused(
                    work, state, bonds_t, n_sweeps, nus, interpret=interp
                )

            return adv
        return lambda state: kawasaki.exchange_sweeps(work, state, bonds, n_sweeps, nus)

    def warm_up(self, n_sweeps: int) -> None:
        self.do_mcmc_steps(n_sweeps)

    def do_mcmc_steps(self, n_sweeps: int) -> None:
        self.state = self._advance_fn(n_sweeps)(self.state)

    # Per-call scan-chunk bound, as in AmplitudeSampler.scan_chunk (the
    # remote-tunnel watchdog matters MOST here: fermion estimators at
    # L=32 run minutes-long monolithic scans). 0 = one scan.
    scan_chunk: int = 0

    def run_estimator(self, accum_fn, n_iterations: int, n_sweeps: int = 1, chunk: int | None = None):
        """Run ``n_iterations`` of (advance n_sweeps; accum_fn(cache, lnpsi))
        as ONE device computation (lax.scan), like
        :meth:`AmplitudeSampler.run_estimator` - one dispatch per
        measurement instead of one per iteration. ``chunk`` > 0 bounds
        each device call to that many iterations (``None`` falls back to
        ``self.scan_chunk``)."""
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

    def _beta1(self, tree):
        """beta=1 replica slice of a per-walker pytree (replica-minor)."""
        if self.n_beta == 1:
            return tree
        return jax.tree_util.tree_map(lambda x: x[:: self.n_beta], tree)

    @property
    def spins(self) -> jnp.ndarray:
        return self.state.cache.spins[:: self.n_beta]

    @property
    def lnpsi(self):
        return self._beta1(self.state.lnpsi)


def opdm_pair(
    sampler: FermionAmplitudeSampler,
    n: int,
    m: int,
    n_iterations: int,
    n_sweeps: int = 1,
    n_warmup: int = 100,
) -> complex:
    """<c+_{n+m,up} c+_{n+m,dn} c_{n,dn} c_{n,up}> (MeasOPDM::measure,
    impl_meas.cuh:592-645)."""
    l = sampler.l
    if not (0 <= n and n + m < l and m >= 0):
        raise ValueError("(n+m) must be < L and n, m >= 0")
    work = sampler.work
    sampler.warm_up(n_warmup)

    def local(cache, lnpsi):
        s = cache.spins
        if m == 0:
            val = 0.25 * (1.0 + s[:, n]) * (1.0 + s[:, l + n])
            return jnp.mean(val), jnp.zeros((), s.dtype)
        flipped = s.at[:, jnp.asarray([n, n + m, l + n, l + n + m])].multiply(-1.0)
        lnpsi1 = engine.log_psi(work, flipped)
        ratio = cplx.cexp(lnpsi1 - lnpsi)
        string = jnp.prod(s[:, n + 1 : n + m] * s[:, l + n + 1 : l + n + m], axis=1)
        coeff = (
            (1.0 / 16.0)
            * (1.0 + s[:, n + m])
            * (1.0 + s[:, l + n + m])
            * (1.0 - s[:, n])
            * (1.0 - s[:, l + n])
            * string
        )
        return jnp.mean(coeff * ratio.re), jnp.mean(coeff * ratio.im)

    # all iterations run device-side in one lax.scan (one dispatch), and the
    # walker mean lowers to a mesh collective when the sampler is sharded
    re, im = sampler.run_estimator(local, n_iterations, n_sweeps)
    return complex(np.mean(re), np.mean(im))


def density_profile(
    sampler: FermionAmplitudeSampler,
    n_iterations: int,
    n_sweeps: int = 1,
    n_warmup: int = 100,
) -> np.ndarray:
    """Per-site mean occupations <n_i> for both flavors -> (2L,) array
    (the m = 0 OPDM diagonal measured for every site in ONE estimator run:
    n_i = (1 + s_i)/2 under the JW convention, diagonal in the s basis so
    no forwards are needed). The trap-profile observable of the reference's
    trapped-Hubbard study (fermi_hubbard_CH-train_rbm.cu:117-128)."""
    sampler.warm_up(n_warmup)

    def local(cache, lnpsi):
        del lnpsi
        return jnp.mean(0.5 * (1.0 + cache.spins), axis=0)  # (2L,)

    occ = sampler.run_estimator(local, n_iterations, n_sweeps)  # (iters, 2L)
    return np.asarray(np.mean(occ, axis=0))
