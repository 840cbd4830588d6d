"""High-level VMC ground-state optimization driver.

Wires machine + Hamiltonian + SR into one jitted training step, replacing
the reference's optimizer::propagate loops (cpu/include/optimizer.hpp:22-88,
159-206; gpu optimizer.cuh:119-167):

    per iteration:
      do_mcmc_steps(nms)  ->  local energy  ->  O_k  ->  SR solve  ->
      theta -= lr * dx    ->  recompute caches (update_variables)

with the lambda schedule, RSD convergence test and NaN guard of the GPU
SR-CG path. The whole iteration is ONE XLA computation; only scalar metrics
return to the host each step.
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from neural_network_quantum_state_tpu.hamiltonians.base import Hamiltonian
from neural_network_quantum_state_tpu.models.base import Machine
from neural_network_quantum_state_tpu.ops import engine
from neural_network_quantum_state_tpu.optim import solvers as dense_solvers
from neural_network_quantum_state_tpu.optim.sr import (
    SRStats,
    energy_and_rsd,
    lambda_schedule,
    sgd_diag_solve,
    sr_cg_solve,
    sr_dense_solve,
)
from neural_network_quantum_state_tpu.parallel import mesh as meshlib
from neural_network_quantum_state_tpu.sampler import metropolis


@dataclasses.dataclass(frozen=True)
class VMCConfig:
    n_walkers: int = 1024
    n_sweeps_per_step: int = 1  # reference "nms"
    learning_rate: float = 1e-2  # reference "lr" / deltaTau
    solver: str = "cg"  # cg | lu | cholesky | svd | sgd
    cg_tol: float = 1e-5  # gpu impl_optimizer.cuh:60
    cg_max_iters: int = 1000
    rsd_cutoff: Optional[float] = None  # early stop (gpu optimizer.cuh:160-165)
    seed: int = 0


class VMC:
    def __init__(
        self,
        machine: Machine,
        hamiltonian: Hamiltonian,
        config: VMCConfig = VMCConfig(),
        mesh: Optional[Any] = None,
    ):
        if machine.n_inputs != hamiltonian.n_sites:
            raise ValueError("machine.n_inputs != hamiltonian.n_sites")
        self.machine = machine
        self.hamiltonian = hamiltonian
        self.config = config
        self.mesh = mesh
        self.schedule = jnp.asarray(hamiltonian.schedule())
        # proposal family: single-spin-flip Metropolis, or Kawasaki pair
        # exchange for particle-conserving models (Hubbard)
        if getattr(hamiltonian, "sampler_kind", "flip") == "exchange":
            bonds, n_unit = hamiltonian.bonds, hamiltonian.n_unit_steps

            def sweep(work, state, n):
                from neural_network_quantum_state_tpu.sampler import kawasaki

                return kawasaki.exchange_sweeps(work, state, bonds, n, n_unit)

        else:

            def sweep(work, state, n):
                return metropolis.sweeps(work, state, self.schedule, n)

        self._sweep = sweep
        self._step_fn = self._build_step()

    # ------------------------------------------------------------------
    def init(self, key: jax.Array | int | None = None):
        """Initialize params + sampler state (machine.initialize + Hamiltonian
        initial spins)."""
        if key is None:
            key = self.config.seed
        if isinstance(key, int):
            key = jax.random.PRNGKey(key)
        kp, ks, kr = jax.random.split(key, 3)
        params = self.machine.init_params(kp)
        spins = self.hamiltonian.init_spins(ks, self.config.n_walkers, self.machine.real_dtype)
        work = self.machine.make_work(params)
        state = metropolis.init_state(work, spins, kr)
        if self.mesh is not None:
            params = meshlib.shard_walker_tree(params, self.mesh, self.config.n_walkers)
            state = meshlib.shard_walker_tree(state, self.mesh, self.config.n_walkers)
        return params, state

    def warm_up(self, params, state, n_sweeps: int = 500):
        work = self.machine.make_work(params)
        return self._sweep(work, state, n_sweeps)

    # ------------------------------------------------------------------
    def _build_step(self):
        machine, ham, cfg = self.machine, self.hamiltonian, self.config
        mesh = self.mesh

        @partial(jax.jit, donate_argnums=(1,))
        def step(params, state: metropolis.MCState, step_idx: jnp.ndarray):
            work = machine.make_work(params)
            state = self._sweep(work, state, cfg.n_sweeps_per_step)
            htilda = ham.local_energy(work, state.cache, state.lnpsi)
            o_mat = machine.grad_log(params, state.cache)
            o_mat = meshlib.constrain_walkers(o_mat, mesh)
            havg, rsd = energy_and_rsd(htilda)
            lam = lambda_schedule(step_idx, dtype=machine.real_dtype)
            cg_iters = jnp.zeros((), jnp.int32)
            if cfg.solver == "cg":
                dx, res = sr_cg_solve(o_mat, htilda, lam, tol=cfg.cg_tol, max_iters=min(cfg.cg_max_iters, machine.n_vars))
                cg_iters = res.iterations
            elif cfg.solver == "sgd":
                dx = sgd_diag_solve(o_mat, htilda, lam)
            else:
                dx = sr_dense_solve(o_mat, htilda, lam, dense_solvers.SOLVERS[cfg.solver])
            # NaN guard: freeze the update if <H> went non-finite
            ok = jnp.isfinite(havg.re)
            new_params = machine.update_params(params, dx, cfg.learning_rate)
            new_params = jax.tree_util.tree_map(
                lambda new, old: jnp.where(ok, new, old), new_params, params
            )
            # update_variables recomputes caches from the current spins
            work = machine.make_work(new_params)
            cache, lnpsi = engine.full_forward(work, state.cache.spins)
            state = state._replace(cache=cache, lnpsi=lnpsi)
            stats = SRStats(energy=havg, rsd=rsd, cg_iters=cg_iters, lam=lam)
            return new_params, state, stats

        return step

    # ------------------------------------------------------------------
    def run(
        self,
        params,
        state,
        n_iterations: int,
        callback: Optional[Callable[[int, SRStats], None]] = None,
        verbose: bool = False,
    ):
        """Host-side optimization loop with RSD early stop + NaN guard
        (gpu optimizer.cuh:134-138, 160-165)."""
        history = []
        t0 = time.perf_counter()
        for n in range(n_iterations):
            params, state, stats = self._step_fn(params, state, jnp.asarray(n, jnp.int32))
            e_re = float(stats.energy.re)
            rsd = float(stats.rsd)
            history.append({"step": n, "energy": e_re, "rsd": rsd, "cg_iters": int(stats.cg_iters)})
            if callback is not None:
                callback(n, stats)
            if verbose:
                print(f"{n + 1:5d}  {e_re:+.7f}  rsd={rsd:.3e}  cg={int(stats.cg_iters)}")
            if not jnp.isfinite(e_re):
                print('# "Havg" has non-value type. We stop here.')
                break
            if self.config.rsd_cutoff is not None and rsd < self.config.rsd_cutoff:
                if verbose:
                    print("# We got a converged solution.")
                break
        elapsed = time.perf_counter() - t0
        return params, state, history, elapsed
