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
import logging
import math
import time
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from neural_network_quantum_state_tpu.hamiltonians.base import Hamiltonian
from neural_network_quantum_state_tpu.models.base import Machine
from neural_network_quantum_state_tpu.ops import cplx, engine
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

logger = logging.getLogger(__name__)


@dataclasses.dataclass(frozen=True)
class VMCConfig:
    # Large-V guidance (measured, N=128/V=517 on v5e - RESULTS.md 5b): the
    # f32 CG saturation at large V is a roundoff artifact, not true
    # ill-conditioning - with solve_dtype=float64 the same system solves in
    # 3-10 CG iterations. Prefer solve_dtype=float64 at V >~ 500;
    # solver="auto" (QLP min-length fallback) is the pure-f32 option that
    # degrades gracefully.
    n_walkers: int = 1024
    n_sweeps_per_step: int = 1  # reference "nms"
    # dense-solver only: accumulate S/F over this many sampling rounds per
    # iteration (reference "naccumulation", optimizer.hpp:37-57)
    n_accumulations: int = 1
    learning_rate: float = 1e-2  # reference "lr" / deltaTau
    solver: str = "cg"  # cg | lu | cholesky | svd | sgd | minsr | auto | minresqlp
    cg_tol: float = 1e-5  # gpu impl_optimizer.cuh:60
    cg_max_iters: int = 1000
    rsd_cutoff: Optional[float] = None  # early stop (gpu optimizer.cuh:160-165)
    n_beta: int = 1  # >1: parallel tempering with n_beta replicas per chain
    # Trust region on ||S^-1 F||: healthy SR steps stay well below 1 (the
    # lambda*diag(S) regularization bounds them); near-singular solves on a
    # collapsed walker distribution emit steps of norm 10-30 that can pin
    # the sampler. None disables (exact reference semantics).
    max_dx_norm: Optional[float] = 1.0
    # >1: run this many SR iterations per device call (lax.scan) - removes
    # the per-iteration host round trip (the dominant cost on remote/TPU
    # dispatch for small systems). RSD early stop is checked per chunk.
    steps_per_host_loop: int = 1
    # Pallas fused-sweep sampling (f32 machines on TPU; RBM and FFNN families)
    use_fused_sweeps: bool = False
    # >0: append this many symmetric block-flip proposals per sweep after
    # the single-flip pass (metropolis.block_flip_moves) - an ergodicity
    # move that can hop between ordered sectors where single flips freeze
    # (the N=128 deep-ordered collapse). Tempered chains accept with their
    # replica beta; incompatible with the exchange sampler (blocks break
    # particle conservation).
    block_moves_per_sweep: int = 0
    # Mixed-precision SR (the reference trains in double end-to-end - all
    # drivers instantiate <double>, gpu/src/LICH-train_rbmtrsymm.cu:91; on
    # TPU these recover that accuracy while keeping the f32 sweep hot path):
    #
    # solve_dtype=jnp.float64: the S/F reductions and the solve run in f64
    #   (O_k and local energy are cast after being computed in the energy
    #   dtype). Cheap - the f64 work is O(KV) casts + the O(V) solve - and
    #   fixes the dominant f32 failure mode (CG on ill-conditioned S).
    # energy_dtype=jnp.float64: additionally recompute lnpsi, the local
    #   energy and O_k in f64 (one widened forward + the N-forward flip
    #   tensor in f64). Exact given the f32 params, but f64 transcendentals
    #   are emulated on TPU (~70x the f32 energy at N=64) - use as the
    #   high-precision anchor mode.
    # energy_dtype="compensated": f32 transcendentals with difference-first
    #   per-hidden accumulation of lnpsi(flip) - lnpsi in f64 (engine.
    #   all_flip_delta_log_psi) - ~f64-quality LOCAL ENERGY at ~2x the f32
    #   cost (the f64 work is adds + a (K,N) exp), A/B'd in
    #   scripts/bench_compensated_ab.py. O_k stays f32 (cast to
    #   solve_dtype); ising-family Hamiltonians, single-device path.
    #
    # All require jax_enable_x64. dx is cast back to the machine dtype.
    solve_dtype: Optional[Any] = None
    energy_dtype: Optional[Any] = None
    # Collapse auto-remediation (active recovery beyond the reference's
    # passive NaN guard, gpu optimizer.cuh:134-138): when the energy
    # variance collapses to exactly zero for collapse_patience consecutive
    # steps (every walker pinned on one configuration - the N=128
    # deep-ordered failure mode, RESULTS.md 5/5b), run() remediates instead
    # of freezing forever: first escalate to in-run parallel tempering with
    # collapse_escalate_nbeta replicas (the rescue that worked manually at
    # N=128); where PT is unavailable (exchange sampler, indivisible walker
    # count, already tempered) reseed collapse_reseed_frac of the walkers
    # from the Hamiltonian's reseed distribution and re-equilibrate for
    # collapse_requil_sweeps.
    # collapse_escalate_nbeta = 0 selects the replica count automatically
    # at escalation time from the measured replica-exchange acceptance
    # (tempering.tune_n_beta: smallest ladder whose worst adjacent-pair
    # swap acceptance clears 20%).
    auto_remediate: bool = True
    collapse_patience: int = 3
    collapse_escalate_nbeta: int = 4
    collapse_reseed_frac: float = 0.5
    collapse_requil_sweeps: int = 100
    # >0: precondition CG with an exponential moving average of diag(S)
    # (this decay per iteration) instead of the current round's noisy
    # K-sample estimate - at large V each diagonal entry is estimated from
    # K walkers and the relative noise scales the preconditioned spectrum.
    # Regularization still uses the current diag(S) (reference semantics,
    # functor_for_CG.hpp:82-97). cg/auto solvers only.
    precond_ema: float = 0.0
    seed: int = 0


# Large-V mixed-precision policy (single source; drivers consult it to
# pre-enable x64 before VMC.__init__ applies the solve_dtype default):
# a pure-f32 CG solve at V >~ 500 walks into a measured quality cliff
# (roundoff residual collapse -> NaN update, RESULTS.md 5b).
LARGE_V_THRESHOLD = 500
LARGE_V_SOLVERS = ("cg", "auto")


def wants_large_v_mixed_precision(machine, solver: str) -> bool:
    return (
        machine.n_vars >= LARGE_V_THRESHOLD
        and solver in LARGE_V_SOLVERS
        and jnp.dtype(machine.real_dtype) == jnp.float32
    )


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
        # proposal family: single-spin-flip Metropolis, Kawasaki pair
        # exchange (particle-conserving Hubbard), or replica-exchange
        # parallel tempering (config.n_beta > 1)
        if config.n_beta > 1 and config.n_walkers % config.n_beta != 0:
            raise ValueError("n_walkers must be a multiple of n_beta")
        if mesh is not None:
            n_dev = int(np.prod(list(mesh.shape.values()))) if hasattr(mesh, "shape") else mesh.devices.size
            if config.n_walkers % (n_dev * config.n_beta) != 0:
                raise ValueError(
                    f"n_walkers ({config.n_walkers}) must be a multiple of "
                    f"mesh devices * n_beta ({n_dev} * {config.n_beta}) so the "
                    "walker shards (and the beta=1 estimator slice) divide evenly"
                )
        if config.n_accumulations > 1:
            if config.solver not in ("lu", "cholesky", "svd"):
                raise ValueError("n_accumulations > 1 requires a dense solver (reference parity)")
        if config.energy_dtype == "compensated":
            if mesh is not None:
                raise ValueError(
                    "energy_dtype='compensated' is a single-device anchor mode "
                    "(use energy_dtype=float64 under a mesh)"
                )
            if not hasattr(hamiltonian, "local_energy") or "compensated" not in (
                hamiltonian.local_energy.__code__.co_varnames
            ):
                raise ValueError(
                    "energy_dtype='compensated' requires a Hamiltonian with a "
                    "compensated local_energy (ising family)"
                )
        for knob in (config.solve_dtype, config.energy_dtype):
            if knob is None or knob == "compensated":
                needs_x64 = knob == "compensated"
            else:
                needs_x64 = jnp.dtype(knob) == jnp.float64
            if needs_x64 and not jax.config.jax_enable_x64:
                raise ValueError(
                    "solve_dtype/energy_dtype=float64 (or 'compensated') requires "
                    "jax_enable_x64 (jax.config.update('jax_enable_x64', True) "
                    "before building the VMC)"
                )
        # Large-V auto-default (wants_large_v_mixed_precision above; the
        # f32-auto N=128 run died on this cliff). The fix is cheap (O(KV)
        # casts + the O(V) solve in f64), so default it rather than rely on
        # a comment: upgrade solve_dtype when x64 is available, warn loudly
        # when it is not. Explicit solve_dtype=float32 opts out.
        if (
            wants_large_v_mixed_precision(machine, config.solver)
            and config.solve_dtype is None
            and config.energy_dtype is None
        ):
            if jax.config.jax_enable_x64:
                config = dataclasses.replace(config, solve_dtype=jnp.float64)
                logger.info(
                    "V=%d >= 500 with an f32 %s solve: defaulting "
                    "solve_dtype=float64 (mixed-precision SR; pass "
                    "solve_dtype=jnp.float32 to opt out)",
                    machine.n_vars,
                    config.solver,
                )
            else:
                logger.warning(
                    "V=%d >= 500 with a pure-f32 %s SR solve: this configuration "
                    "measurably degrades (CG stagnation, possible NaN updates - "
                    "RESULTS.md 5b). Enable jax_enable_x64 and set "
                    "solve_dtype=jnp.float64 (drivers: -solvedtype=float64), or pass "
                    "solve_dtype=jnp.float32 explicitly to silence this.",
                    machine.n_vars,
                    config.solver,
                )
        self.config = config
        if getattr(hamiltonian, "sampler_kind", "flip") == "exchange":
            bonds, n_unit = hamiltonian.bonds, hamiltonian.n_unit_steps
            if config.n_beta > 1:
                # tempered Kawasaki exchange (sector-preserving PT; XLA path
                # only - the fused exchange kernel has no in-kernel ladder)
                if config.use_fused_sweeps:
                    raise ValueError(
                        "use_fused_sweeps does not implement tempered exchange; "
                        "set use_fused_sweeps=False with n_beta > 1"
                    )

                def sweep(work, state, n):
                    from neural_network_quantum_state_tpu.sampler import kawasaki

                    return kawasaki.tempered_exchange_sweeps(
                        work, state, bonds, n, n_unit, config.n_beta
                    )

            elif config.use_fused_sweeps:
                if jnp.dtype(machine.real_dtype) != jnp.float32:
                    raise ValueError("use_fused_sweeps requires a float32 machine")
                bonds_tuple = tuple(map(tuple, np.asarray(bonds).tolist()))
                from neural_network_quantum_state_tpu.sampler import kawasaki

                if mesh is not None:
                    interp = mesh.devices.ravel()[0].platform == "cpu"
                    fused_ex = kawasaki.make_fused_exchange_sharded_sweeps(
                        mesh, bonds_tuple, n_unit, interpret=interp
                    )

                    def sweep(work, state, n):
                        return fused_ex(work, state, n)

                else:

                    def sweep(work, state, n):
                        return kawasaki.exchange_sweeps_fused(work, state, bonds_tuple, n, n_unit)

            else:
                # XLA-scan path; under a mesh the per-walker ops partition
                # along the walker axis by pjit alone (no collectives in the
                # sweep itself - tested mesh-vs-single agreement)
                def sweep(work, state, n):
                    from neural_network_quantum_state_tpu.sampler import kawasaki

                    return kawasaki.exchange_sweeps(work, state, bonds, n, n_unit)

        elif config.n_beta > 1 and not config.use_fused_sweeps:

            def sweep(work, state, n):
                from neural_network_quantum_state_tpu.sampler import tempering

                return tempering.tempering_sweeps(work, state, self.schedule, n, config.n_beta)

        elif config.use_fused_sweeps:
            if jnp.dtype(machine.real_dtype) != jnp.float32:
                raise ValueError("use_fused_sweeps requires a float32 machine")
            nb = config.n_beta  # > 1: replica-exchange runs in-kernel
            if mesh is not None:
                # per-device Pallas kernels under shard_map (a pallas_call
                # cannot be partitioned by pjit alone)
                interp = mesh.devices.ravel()[0].platform == "cpu"
                fused = metropolis.make_fused_sharded_sweeps(mesh, interpret=interp, n_beta=nb)

                def sweep(work, state, n):
                    return fused(work, state, self.schedule, n)

            else:

                def sweep(work, state, n):
                    return metropolis.sweeps_fused(work, state, self.schedule, n, n_beta=nb)

        else:

            def sweep(work, state, n):
                return metropolis.sweeps(work, state, self.schedule, n)

        if config.block_moves_per_sweep > 0:
            if getattr(hamiltonian, "sampler_kind", "flip") == "exchange":
                raise ValueError(
                    "block_moves_per_sweep breaks particle conservation - "
                    "not available with the Kawasaki exchange sampler"
                )
            base_sweep = sweep
            bmps, nb = config.block_moves_per_sweep, config.n_beta

            def sweep(work, state, n):
                state = base_sweep(work, state, n)
                beta = None
                if nb > 1:
                    from neural_network_quantum_state_tpu.sampler import tempering

                    k_tot = state.lnpsi.re.shape[0]
                    beta = tempering.replica_betas(nb, k_tot // nb, state.cache.spins.dtype)
                return metropolis.block_flip_moves(work, state, n_moves=n * bmps, beta=beta)

        self._sweep = sweep
        self._step_fn = self._build_step()
        self._reseed_fn = None
        self.n_remediations = 0  # collapse-remediation events (run() increments)

    @property
    def _ema_init(self):
        """Fresh diag(S)-EMA carry (the jitted step donates its buffer, so
        each run()/step chain needs its own; step 0 overwrites the seed)."""
        if not self._use_ema:
            return None
        return jnp.ones((self.machine.n_vars,), self._ema_dtype)

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
            params = meshlib.replicate_tree(params, self.mesh)
            state = meshlib.shard_walker_tree(state, self.mesh, self.config.n_walkers)
        return params, state

    def warm_up(self, params, state, n_sweeps: int = 500):
        work = self.machine.make_work(params)
        return self._sweep(work, state, n_sweeps)

    # ------------------------------------------------------------------
    def _build_step(self):
        machine, ham, cfg = self.machine, self.hamiltonian, self.config
        mesh = self.mesh
        rdt = jnp.dtype(machine.real_dtype)
        compensated = cfg.energy_dtype == "compensated"
        if compensated:
            edt = jnp.dtype(jnp.float64)  # htilda lands in f64 (stats/solve dtype)
        else:
            edt = rdt if cfg.energy_dtype is None else jnp.dtype(cfg.energy_dtype)
        sdt = edt if cfg.solve_dtype is None else jnp.dtype(cfg.solve_dtype)
        sdt = max(sdt, edt, key=lambda d: jnp.finfo(d).bits)  # solve never narrower

        def estimator_terms(params, cache, lnpsi):
            """(htilda, o_mat) for one sampling round: local energy and O_k
            in cfg.energy_dtype, then cast to cfg.solve_dtype for the S/F
            reductions and the solve."""
            if compensated:
                # widened f64 forward (2 MXU GEMMs + O(KH) f64 scalars -
                # cheap; it is the O(NKH) flip-tensor transcendentals that
                # cost ~70x in full f64), then the difference-first local
                # energy: exact f64 linear algebra, f32 transcendentals
                params64 = jax.tree_util.tree_map(lambda x: x.astype(edt), params)
                work = machine.make_work(params64)
                with jax.named_scope("widen_forward"):
                    cache, lnpsi = engine.full_forward(work, cache.spins.astype(edt))
                with jax.named_scope("local_energy"):
                    htilda = ham.local_energy(work, cache, lnpsi, compensated=True)
                with jax.named_scope("grad_log"):
                    o_mat = meshlib.constrain_o_mat(machine.grad_log(params64, cache), mesh)
                return htilda.astype(sdt), o_mat.astype(sdt)
            if edt == rdt:
                work = machine.make_work(params)
            else:
                params = jax.tree_util.tree_map(lambda x: x.astype(edt), params)
                work = machine.make_work(params)
                with jax.named_scope("widen_forward"):
                    # one widened (K,N)x(N,H) GEMM pair: given f32 inputs the
                    # f64 y/lnpsi are exact, so local energy and O_k carry
                    # only statistical (not roundoff) error
                    cache, lnpsi = engine.full_forward(work, cache.spins.astype(edt))
            with jax.named_scope("local_energy"):
                if mesh is not None:
                    # shard_map over the walker axis: per-shard fused kernels
                    # run where eligible; no collectives (local energy has no
                    # cross-walker terms)
                    htilda = ham.local_energy_sharded(work, cache, lnpsi, mesh)
                else:
                    htilda = ham.local_energy(work, cache, lnpsi)
            with jax.named_scope("grad_log"):
                o_mat = machine.grad_log(params, cache)
                # walker-sharded rows; with a TP mesh ("params" axis) this
                # also splits V into column blocks, so every CG matvec is a
                # 2D-blocked GEMM pair with psum over the contracted axis
                o_mat = meshlib.constrain_o_mat(o_mat, mesh)
            if sdt != edt:
                htilda, o_mat = htilda.astype(sdt), o_mat.astype(sdt)
            return htilda, o_mat

        def step_body(params, state: metropolis.MCState, step_idx: jnp.ndarray, diag_ema=None):
            # named scopes: per-phase visibility in jax.profiler traces
            # (reference tracing is wall-clock-only, SURVEY.md 5)
            with jax.named_scope("sample"):
                work = machine.make_work(params)
                state = self._sweep(work, state, cfg.n_sweeps_per_step)
            if cfg.n_beta > 1:
                # estimators read only the beta=1 replicas (replica-minor
                # layout: strided slice; reference impl_mcmc_sampler.hpp:193)
                est_cache = jax.tree_util.tree_map(lambda x: x[:: cfg.n_beta], state.cache)
                est_lnpsi = jax.tree_util.tree_map(lambda x: x[:: cfg.n_beta], state.lnpsi)
            else:
                est_cache, est_lnpsi = state.cache, state.lnpsi
            htilda, o_mat = estimator_terms(params, est_cache, est_lnpsi)
            havg, rsd = energy_and_rsd(htilda)
            lam = lambda_schedule(step_idx, dtype=sdt)
            cg_iters = jnp.zeros((), jnp.int32)
            pdiag = None
            if diag_ema is not None:
                # EMA of diag(S): first step seeds with the current estimate
                from neural_network_quantum_state_tpu.optim.sr import sr_diag

                cur = sr_diag(o_mat, cplx.cmean(o_mat, axis=0))
                rho = jnp.asarray(cfg.precond_ema, cur.dtype)
                diag_ema = jnp.where(step_idx == 0, cur, rho * diag_ema + (1.0 - rho) * cur)
                pdiag = diag_ema
            if cfg.solver == "cg":
                dx, res = sr_cg_solve(
                    o_mat, htilda, lam, tol=cfg.cg_tol,
                    max_iters=min(cfg.cg_max_iters, machine.n_vars), precond_diag=pdiag,
                )
                cg_iters = res.iterations
            elif cfg.solver == "auto":
                # CG with MINRES-QLP fallback: CG is the cheap workhorse
                # (reference default, SURVEY.md 2.6); when it exhausts its
                # iteration cap the sampled S is too ill-conditioned for CG
                # (observed at large V: N=128, V=517 - docs/BACKLOG.md) and
                # the min-length MINRES-QLP solve takes over (the reference's
                # large-V backend, cpu/include/minresqlp.hpp:74-135). Both
                # branches compile; only the taken one executes per step.
                from neural_network_quantum_state_tpu.optim.minres import sr_minres_solve

                cap = min(cfg.cg_max_iters, machine.n_vars)
                dx, res = sr_cg_solve(o_mat, htilda, lam, tol=cfg.cg_tol, max_iters=cap, precond_diag=pdiag)

                def _qlp_fallback(_):
                    dx2, r2 = sr_minres_solve(
                        o_mat, htilda, lam, tol=cfg.cg_tol, max_iters=cfg.cg_max_iters
                    )
                    return dx2, r2.iterations.astype(jnp.int32)

                def _keep_cg(_):
                    return dx, jnp.zeros((), jnp.int32)

                # fall back only if CG is both at its cap AND unconverged
                # (cg_solve's own threshold semantics: tol^2 * ||F||^2) - a
                # solve whose residual crosses tol exactly on the cap-th
                # iteration is legitimate and needs no QLP pass. XLA CSEs
                # this force_vector with the one inside sr_cg_solve.
                from neural_network_quantum_state_tpu.optim.sr import force_vector

                f_vec, _ = force_vector(o_mat, htilda)
                threshold = (cfg.cg_tol * cfg.cg_tol) * cplx.norm2(f_vec)
                fallback = (res.iterations >= cap) & (res.residual_norm2 >= threshold)
                dx, extra = jax.lax.cond(fallback, _qlp_fallback, _keep_cg, None)
                cg_iters = res.iterations + extra
            elif cfg.solver == "minresqlp":
                from neural_network_quantum_state_tpu.optim.minres import sr_minres_solve

                dx, res = sr_minres_solve(o_mat, htilda, lam, tol=cfg.cg_tol, max_iters=cfg.cg_max_iters)
                cg_iters = res.iterations
            elif cfg.solver == "minsr":
                # kernel-trick SR: exact KxK walker-space solve (one MXU
                # GEMM pair + dense solve) - the large-V option where the
                # VxV dense path is unbuildable and CG is latency-bound
                from neural_network_quantum_state_tpu.optim.sr import sr_minsr_solve

                dx, _ = sr_minsr_solve(o_mat, htilda, lam)
            elif cfg.solver == "sgd":
                dx = sgd_diag_solve(o_mat, htilda, lam)
            elif cfg.n_accumulations > 1:
                from neural_network_quantum_state_tpu.optim.sr import sr_dense_solve_accumulated

                samples = [(o_mat, htilda)]
                for _ in range(cfg.n_accumulations - 1):
                    state = self._sweep(work, state, cfg.n_sweeps_per_step)
                    if cfg.n_beta > 1:
                        # each accumulation round reads only its beta=1
                        # replicas, like the first (replica-minor stride)
                        ec = jax.tree_util.tree_map(lambda x: x[:: cfg.n_beta], state.cache)
                        el = jax.tree_util.tree_map(lambda x: x[:: cfg.n_beta], state.lnpsi)
                    else:
                        ec, el = state.cache, state.lnpsi
                    ht_r, om_r = estimator_terms(params, ec, el)
                    samples.append((om_r, ht_r))
                dx = sr_dense_solve_accumulated(samples, lam, dense_solvers.SOLVERS[cfg.solver])
                havg, rsd = energy_and_rsd(cplx.concat([h for _, h in samples], axis=0))
            else:
                dx = sr_dense_solve(o_mat, htilda, lam, dense_solvers.SOLVERS[cfg.solver])
            if sdt != rdt:
                dx = dx.astype(machine.real_dtype)  # narrow for the update
            if cfg.max_dx_norm is not None:
                # Trust region (robustness beyond the reference): when the
                # walker distribution collapses, diag(S) -> 0 and the
                # reference's lambda*diag(S) regularization
                # (functor_for_CG.hpp:82-84) vanishes exactly when it is
                # needed, letting the solve emit an unbounded step that can
                # pin the sampler. Cap ||dx||.
                dx_norm = jnp.sqrt(cplx.norm2(dx))
                scale = jnp.where(
                    jnp.isfinite(dx_norm),
                    jnp.minimum(1.0, cfg.max_dx_norm / jnp.maximum(dx_norm, 1e-30)),
                    0.0,  # non-finite solve -> skip the update entirely
                )
                dx = dx * scale.astype(dx.re.dtype)
            # Guards: freeze the update if <H> went non-finite (reference
            # NaN guard, gpu optimizer.cuh:134-138), or if the energy
            # variance collapsed to zero - then S and F are exact zeros,
            # diag(S)-scaled regularization vanishes and the solve is pure
            # noise amplification (observed to pin PT runs permanently).
            var = jnp.mean(cplx.abs2(htilda)) - cplx.abs2(havg)
            ok = jnp.isfinite(havg.re) & (var > 0.0)
            new_params = machine.update_params(params, dx, cfg.learning_rate)
            new_params = jax.tree_util.tree_map(
                lambda new, old: jnp.where(ok, new, old), new_params, params
            )
            # update_variables recomputes caches from the current spins
            work = machine.make_work(new_params)
            cache, lnpsi = engine.full_forward(work, state.cache.spins)
            state = state._replace(cache=cache, lnpsi=lnpsi)
            stats = SRStats(energy=havg, rsd=rsd, cg_iters=cg_iters, lam=lam)
            return new_params, state, stats, diag_ema

        self._use_ema = cfg.precond_ema > 0.0 and cfg.solver in ("cg", "auto")
        self._ema_dtype = sdt

        @partial(jax.jit, donate_argnums=(1, 3))
        def step(params, state, step_idx, diag_ema):
            return step_body(params, state, step_idx, diag_ema)

        m = cfg.steps_per_host_loop

        @partial(jax.jit, donate_argnums=(0, 1, 3))
        def multi_step(params, state, step0, diag_ema):
            def scan_body(carry, i):
                params, state, ema = carry
                params, state, stats, ema = step_body(params, state, step0 + i, ema)
                return (params, state, ema), stats

            (params, state, diag_ema), stats = jax.lax.scan(
                scan_body, (params, state, diag_ema), jnp.arange(m, dtype=jnp.int32)
            )
            return params, state, stats, diag_ema  # stats leaves stacked (m, ...)

        self._multi_step_fn = multi_step
        return step

    # ------------------------------------------------------------------
    # Below any honest Monte-Carlo relative standard deviation (best
    # converged runs sit at rsd ~1e-4): rsd this small only happens when the
    # energy variance is exactly zero, i.e. every walker is pinned on one
    # configuration (walker collapse).
    _COLLAPSE_RSD = 1e-12

    def _reseed_state(self, params, state):
        """Replace collapse_reseed_frac of the walkers with fresh
        configurations from the Hamiltonian's reseed distribution (sector-
        preserving for exchange samplers); caches recomputed."""
        if self._reseed_fn is None:
            cfg, machine, ham = self.config, self.machine, self.hamiltonian
            stride = max(1, int(round(1.0 / max(cfg.collapse_reseed_frac, 1e-9))))

            @jax.jit
            def reseed(params, state):
                key, k1 = jax.random.split(state.key)
                rand = ham.reseed_spins(k1, cfg.n_walkers, machine.real_dtype)
                keep = (jnp.arange(cfg.n_walkers) % stride) != 0
                spins = jnp.where(keep[:, None], state.cache.spins, rand.astype(state.cache.spins.dtype))
                work = machine.make_work(params)
                cache, lnpsi = engine.full_forward(work, spins)
                return state._replace(cache=cache, lnpsi=lnpsi, key=key)

            self._reseed_fn = reseed
        return self._reseed_fn(params, state)

    # auto-tuner ladder tried when collapse_escalate_nbeta == 0
    _NBETA_CANDIDATES = (2, 4, 6, 8, 12, 16)

    def _n_devices(self) -> int:
        if self.mesh is None:
            return 1
        return int(np.prod(list(self.mesh.shape.values()))) if hasattr(self.mesh, "shape") else self.mesh.devices.size

    def _can_escalate(self) -> bool:
        cfg = self.config
        if cfg.n_beta > 1 or cfg.collapse_escalate_nbeta < 0:
            return False  # already tempered / escalation disabled
        if getattr(self.hamiltonian, "sampler_kind", "flip") == "exchange" and cfg.use_fused_sweeps:
            return False  # fused exchange kernel has no tempered ladder
        n_dev = self._n_devices()
        if cfg.collapse_escalate_nbeta == 0:  # auto: any valid ladder size
            return any(cfg.n_walkers % (n_dev * nb) == 0 for nb in self._NBETA_CANDIDATES)
        if cfg.collapse_escalate_nbeta == 1:
            return False
        return cfg.n_walkers % (n_dev * cfg.collapse_escalate_nbeta) == 0

    def _resolve_escalation_nbeta(self, params, state) -> int:
        """Fixed collapse_escalate_nbeta, or - when 0 - the measured-
        acceptance auto choice (tempering.tune_n_beta on the live, collapsed
        ensemble; the tuner's warm sweeps decorrelate the replicas first)."""
        cfg = self.config
        if cfg.collapse_escalate_nbeta > 1:
            return cfg.collapse_escalate_nbeta
        work = self.machine.make_work(params)
        if getattr(self.hamiltonian, "sampler_kind", "flip") == "exchange":
            # probe with the sector-preserving exchange dynamics (a flip
            # probe would break particle conservation)
            from neural_network_quantum_state_tpu.sampler import kawasaki

            nb, diags = kawasaki.tune_n_beta_exchange(
                work, state, self.hamiltonian.bonds, self.hamiltonian.n_unit_steps,
                candidates=self._NBETA_CANDIDATES, n_devices=self._n_devices(),
            )
        else:
            from neural_network_quantum_state_tpu.sampler import tempering

            nb, diags = tempering.tune_n_beta(
                work, state, self.schedule,
                candidates=self._NBETA_CANDIDATES, n_devices=self._n_devices(),
            )
        for cand, d in diags.items():
            print(f"#   n_beta={cand}: swap/pair = "
                  + "/".join(f"{a:.2f}" for a in d["swap"])
                  + "  flip/replica = " + "/".join(f"{a:.2f}" for a in d["flip"]))
        return nb

    def run(
        self,
        params,
        state,
        n_iterations: int,
        callback: Optional[Callable[[int, SRStats], None]] = None,
        verbose: bool = False,
        checkpoint_fn: Optional[Callable[[int, Any, Any], None]] = None,
        checkpoint_every: int = 100,  # reference nrec (gpu optimizer.cuh:153)
        start_step: int = 0,
    ):
        """Host-side optimization loop with RSD early stop + NaN guard
        (gpu optimizer.cuh:134-138, 160-165). With
        config.steps_per_host_loop > 1, chunks of iterations run as one
        device call (early stop checked per chunk).

        start_step: global optimizer-step offset for structured resume - the
        lambda schedule, history/callback step indices and periodic
        checkpoints continue from the restored position instead of replaying
        the 100*0.9^n regularization transient.

        Collapse auto-remediation (config.auto_remediate): rsd pinned at
        exactly zero for collapse_patience consecutive steps means the
        walker ensemble has collapsed onto a single configuration - the
        zero-variance guard freezes updates, and without intervention the
        run would stay frozen forever (observed at N=128, RESULTS.md 5/5b).
        run() then escalates to in-run parallel tempering
        (collapse_escalate_nbeta replicas - the rescue that worked manually)
        or, where PT is unavailable, reseeds a fraction of the walkers and
        re-equilibrates. A zero-variance rsd never triggers the rsd_cutoff
        convergence stop while auto_remediate is on: statistical noise is
        never exactly zero, so rsd == 0 is collapse, not convergence."""
        cfg = self.config
        history = []
        t0 = time.perf_counter()
        m = cfg.steps_per_host_loop
        n = 0
        stop = False
        prev_acc, prev_prop = 0.0, 0.0
        ema = self._ema_init
        collapse_run = 0
        while n < n_iterations and not stop:
            if m > 1 and n + m <= n_iterations:
                params, state, stats_stack, ema = self._multi_step_fn(params, state, jnp.asarray(start_step + n, jnp.int32), ema)
                # ONE host transfer for the whole chunk (per-scalar fetches
                # pay the full dispatch latency each on remote backends)
                stats_np = jax.device_get(stats_stack)
                chunk = [jax.tree_util.tree_map(lambda x: x[i], stats_np) for i in range(m)]
            else:
                params, state, stats, ema = self._step_fn(params, state, jnp.asarray(start_step + n, jnp.int32), ema)
                chunk = [jax.device_get(stats)]
            # acceptance ratio over this chunk (CPU-stack parity:
            # optimizer.hpp:73 prints it per iteration)
            na, np_ = jax.device_get((state.n_accepted, state.n_proposed))
            acc = float(na - prev_acc) / max(float(np_ - prev_prop), 1.0)
            prev_acc, prev_prop = float(na), float(np_)
            if checkpoint_fn is not None and (start_step + n + len(chunk)) // checkpoint_every > (start_step + n) // checkpoint_every:
                # periodic save with the CURRENT (live, undonated) params -
                # references captured before run() are invalidated by buffer
                # donation inside the jitted step (reference parity: save
                # every nrec iterations, gpu optimizer.cuh:153-155)
                checkpoint_fn(start_step + n + len(chunk), params, state)
            for stats in chunk:
                e_re = float(stats.energy.re)
                rsd = float(stats.rsd)
                history.append(
                    {"step": start_step + n, "energy": e_re, "rsd": rsd, "cg_iters": int(stats.cg_iters), "acceptance": acc}
                )
                if callback is not None:
                    callback(start_step + n, stats)
                if verbose:
                    print(f"{start_step + n + 1:5d}  {e_re:+.7f}  rsd={rsd:.3e}  cg={int(stats.cg_iters)}")
                n += 1
                # math.isfinite, NOT jnp: a jnp op on a host scalar creates
                # a device computation whose bool() blocks on the dispatch
                # round trip - ~30 ms/iteration through the remote tunnel
                # (measured: run() at 46 ms/iter vs 9.3 ms for the jitted
                # step; this line was the difference)
                if not math.isfinite(e_re):
                    print('# "Havg" has non-value type. We stop here.')
                    stop = True
                    break
                collapsed = rsd < self._COLLAPSE_RSD
                collapse_run = collapse_run + 1 if collapsed else 0
                if cfg.rsd_cutoff is not None and rsd < cfg.rsd_cutoff and not (collapsed and cfg.auto_remediate):
                    if verbose:
                        print("# We got a converged solution.")
                    stop = True
                    break
            if not stop and cfg.auto_remediate and collapse_run >= cfg.collapse_patience and n < n_iterations:
                collapse_run = 0
                self.n_remediations += 1
                if self._can_escalate():
                    esc_nbeta = self._resolve_escalation_nbeta(params, state)
                    print(
                        f"# walker collapse at step {start_step + n}: escalating to "
                        f"parallel tempering (n_beta={esc_nbeta}"
                        + (", auto-tuned from swap acceptance)" if cfg.collapse_escalate_nbeta == 0 else ")")
                    )
                    esc = VMC(
                        self.machine,
                        self.hamiltonian,
                        dataclasses.replace(cfg, n_beta=esc_nbeta),
                        mesh=self.mesh,
                    )
                    esc.n_remediations = self.n_remediations
                    # existing walkers reinterpret as replica-minor groups
                    # (betas assigned by position); caches are already
                    # consistent, the tempered sweep takes over directly
                    p2, s2, hist2, _ = esc.run(
                        params, state, n_iterations - n,
                        callback=callback, verbose=verbose,
                        checkpoint_fn=checkpoint_fn, checkpoint_every=checkpoint_every,
                        start_step=start_step + n,
                    )
                    self.n_remediations = esc.n_remediations
                    return p2, s2, history + hist2, time.perf_counter() - t0
                print(
                    f"# walker collapse at step {start_step + n}: reseeding "
                    f"{cfg.collapse_reseed_frac:.0%} of walkers + "
                    f"{cfg.collapse_requil_sweeps} re-equilibration sweeps"
                )
                state = self._reseed_state(params, state)
                state = self.warm_up(params, state, cfg.collapse_requil_sweeps)
        elapsed = time.perf_counter() - t0
        return params, state, history, elapsed
