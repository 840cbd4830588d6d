"""Generic VMC ground-state training driver.

One parameterized entry point covering the reference's per-(lattice,ansatz)
training mains ({CH,LICH,SQ,TRI,CB,fermi_hubbard_CH}-train_* - SURVEY.md
2.6): -name=value CLI, hyperparameter grid sweeps over comma lists, warm
start from -ifprefix, reference-format checkpoint save, per-iteration
metrics, RSD early stop.

    python -m neural_network_quantum_state_tpu.drivers.train \
        -model=LICH -ansatz=rbmtrsymm -L=32 -nf=4 -ns=2048 -niter=2000 \
        -alpha=2,2.5 -theta=2 -ver=1 -path=./runs
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import neural_network_quantum_state_tpu as nqs
from neural_network_quantum_state_tpu.drivers.common import (
    build_hamiltonian,
    build_machine,
    checkpoint_prefix,
    enable_cli_logging,
    hamiltonian_kwargs,
)
from neural_network_quantum_state_tpu.utils.checkpoint import (
    load_reference_text,
    save_npz,
    save_reference_text,
)
from neural_network_quantum_state_tpu.utils.cli import DriverArgs
from neural_network_quantum_state_tpu.utils.metrics import MetricsLogger

OPTIONS = [
    ("model", "lattice/model: CH | LICH | SQ | TRI | CB | hubbard"),
    ("ansatz", "rbm | rbmtrsymm | rbmsfsymm | rbmz2prsymm | ffnn | ffnntrsymm | ffnnsfsymm"),
    ("L", "# of lattice sites (Hubbard: L sites -> 2L machine inputs)"),
    ("nf", "# of hidden units / filters (comma list sweeps)"),
    ("ns", "# of walkers (parallel Markov chains)"),
    ("niter", "# of SR iterations"),
    ("theta", "LICH only: J=sin(theta), h=-cos(theta) (comma list)"),
    ("alpha", "LICH only: power-law decay exponent (comma list)"),
    ("h", "transverse field (non-LICH spin models)"),
    ("J", "Ising coupling (non-LICH spin models)"),
    ("J2", "CB only: J2 diagonal coupling (reference CB-train_ffnn.cpp:24)"),
    ("na", "dense-SR only: # of sampling rounds to accumulate S/F per "
           "iteration (reference naccumulation, CB-train_ffnn.cpp:33; "
           "requires -solver=lu|cholesky|svd)"),
    ("U", "hubbard only: onsite interaction"),
    ("t", "hubbard only: hopping"),
    ("npar", "hubbard only: n_up,n_down"),
    ("trap", "hubbard only: harmonic-trap strength V (V*(i-(L-1)/2)^2, 0 = off)"),
    ("ver", "version tag (comma list)"),
    ("nwarm", "# of warm-up sweeps"),
    ("nms", "# of sweeps per SR iteration"),
    ("lr", "learning rate (deltaTau)"),
    ("rsd", "RSD convergence cutoff"),
    ("cgmax", "iterative-solver (cg/minresqlp) iteration cap per SR solve; "
     "the reference hard-codes 1000 (gpu impl_optimizer.cuh:60). Lower it "
     "to bound anneal-block cost on ill-conditioned states (truncated CG "
     "is still the Krylov-subspace energy minimizer, i.e. a descent "
     "direction)"),
    ("solver", "cg | auto (cg->minresqlp fallback) | minresqlp | lu | cholesky | svd | sgd | minsr (KxK kernel-trick SR)"),
    ("solvedtype", "SR estimator/solve dtype: same | float64 (mixed-precision "
                   "SR: f32 sampling + f64 local energy/O_k/solve - the "
                   "reference's double-precision training accuracy on TPU)"),
    ("mesh", "# of devices for walker-sharded training (0 = single device)"),
    ("gridmesh", "devices per grid point: comma-list grid points run "
                 "CONCURRENTLY on disjoint submeshes (0 = serial grid)"),
    ("nbeta", "parallel-tempering replicas (1 = off; 'auto' = pick the "
              "smallest ladder whose measured replica-exchange acceptance "
              "clears 20% per adjacent pair, probed after warm-up)"),
    ("path", "directory for checkpoints/metrics"),
    ("seed", "RNG seed"),
    ("ifprefix", "warm-start checkpoint prefix ('None' = cold; params only)"),
    ("resume", "structured-state checkpoint to resume from ('None' = off): "
               "prefix or .state.npz path; restores params + optimizer step "
               "(lambda schedule position) + RNG key + walker states, and "
               "-niter then counts ADDITIONAL iterations"),
    ("nrec", "auto-save period in SR iterations (reference nrec, "
             "gpu optimizer.cuh:153-155; 0 = only save at the end)"),
    ("ckpt", "structured-checkpoint format: npz (single-file .state.npz) | "
             "orbax (atomic directory commit, multi-host-safe sharded-array "
             "writes; -resume accepts the .orbax directory). Reference-format "
             "text is always written alongside either"),
    ("dtype", "float32 | float64"),
    ("pbc", "periodic boundary (1/0)"),
    ("mloop", "SR iterations per device call (latency amortization; LOWER it "
              "at large system size - remote-tunnel workers enforce a "
              "per-call watchdog that killed ~55 s Hubbard L=32 chunks)"),
    ("fused", "use the fused Pallas sweep kernel (1/0, f32 RBM family)"),
    ("blockmoves", "symmetric block-flip proposals per sweep (ergodicity in the ordered phase)"),
]
DEFAULTS = {
    "theta": "0",
    "alpha": "2",
    "h": "-1",
    "J": "-1",
    "J2": "0",
    "na": "1",
    "U": "4",
    "t": "1",
    "npar": "1,1",
    "trap": "0",
    "ver": "1",
    "nwarm": "500",
    "nms": "1",
    "lr": "1e-2",
    "rsd": "1e-3",
    "cgmax": "1000",
    "solver": "cg",
    "solvedtype": "same",
    "mesh": "0",
    "gridmesh": "0",
    "nbeta": "1",
    "path": ".",
    "seed": "0",
    "ifprefix": "None",
    "resume": "None",
    "nrec": "100",
    "ckpt": "npz",
    "dtype": "float32",
    "pbc": "1",
    "mloop": "25",
    "fused": "0",
    "blockmoves": "0",
}


def run_one(model, ansatz, l, nf, args, theta, alpha, ver, mesh_override=None) -> dict:
    dtype = jnp.float32 if args.find("dtype") == "float32" else jnp.float64
    pbc = bool(args.find("pbc", int))
    n_inputs = 2 * l if model == "hubbard" else l
    machine = build_machine(ansatz, n_inputs, nf, dtype)

    ham_kw = hamiltonian_kwargs(model, l, args, theta=theta, alpha=alpha)
    prefix_kw: dict = {}
    if model == "lich":
        prefix_kw.update(alpha=alpha, theta=theta)
    elif model == "hubbard":
        prefix_kw.update(u=args.find("U", float))
    else:
        prefix_kw.update(h=args.find("h", float))
    ham = build_hamiltonian(model, n_inputs, **ham_kw)

    prefix = checkpoint_prefix(args.find("path"), model, ansatz, n_inputs, nf, ver, **prefix_kw)
    sd_opt = args.find("solvedtype").lower()
    solve_dtype = None
    if sd_opt in ("float64", "f64", "double"):
        jax.config.update("jax_enable_x64", True)
        solve_dtype = jnp.float64
    elif sd_opt in ("float32", "f32"):
        solve_dtype = jnp.float32  # explicit opt-out of the large-V auto-default
    elif nqs.vmc.wants_large_v_mixed_precision(machine, args.find("solver")):
        # pre-enable x64 so VMC.__init__'s large-V auto-default (the single
        # source of the threshold/solver policy) can apply solve_dtype=f64
        # instead of falling back to the no-x64 warning path
        jax.config.update("jax_enable_x64", True)
    nbeta_raw = args.find("nbeta").lower()
    auto_nbeta = nbeta_raw == "auto"
    cfg = nqs.VMCConfig(
        n_walkers=args.find("ns", int),
        n_sweeps_per_step=args.find("nms", int),
        n_accumulations=args.find("na", int),
        learning_rate=args.find("lr", float),
        solver=args.find("solver"),
        cg_max_iters=args.find("cgmax", int),
        rsd_cutoff=args.find("rsd", float),
        n_beta=1 if auto_nbeta else int(nbeta_raw),
        steps_per_host_loop=args.find("mloop", int),
        use_fused_sweeps=bool(args.find("fused", int)),
        block_moves_per_sweep=args.find("blockmoves", int),
        solve_dtype=solve_dtype,
        seed=args.find("seed", int),
    )
    mesh = mesh_override
    if mesh is None:
        n_mesh = args.find("mesh", int)
        if n_mesh > 0:
            mesh = nqs.parallel.make_mesh(n_mesh)
    vmc = nqs.VMC(machine, ham, cfg, mesh=mesh)
    params, state = vmc.init()
    t0 = time.time()
    start_step = 0
    resume = args.find("resume")
    if resume != "None":
        # structured resume: params + optimizer step (lambda position) +
        # RNG key + walker states - no lambda-transient replay, no walker
        # re-equilibration (round-2 verdict item 2; the reference restarts
        # from params only, SURVEY.md 5)
        import os

        from neural_network_quantum_state_tpu.sampler import metropolis
        from neural_network_quantum_state_tpu.utils.checkpoint import load_npz, load_orbax

        if resume.endswith(".npz") or resume.endswith(".orbax"):
            rpath = resume
        elif os.path.exists(args.find("path") + "/" + resume + ".state.npz"):
            rpath = args.find("path") + "/" + resume + ".state.npz"
        else:
            rpath = args.find("path") + "/" + resume + ".orbax"
        if rpath.endswith(".orbax"):
            params, start_step, key_data, spins, _extra = load_orbax(rpath, machine)
        else:
            params, start_step, key_data, spins = load_npz(rpath, machine)
        if key_data is None or spins is None:
            raise ValueError(f"{rpath} lacks RNG/walker state - not a resumable checkpoint")
        if spins.shape[0] != cfg.n_walkers:
            # shard_walker_tree pattern-matches on leading dim == n_walkers,
            # so a mismatched ensemble would be silently replicated instead
            # of sharded (and every n_walkers-sized mask downstream breaks)
            raise ValueError(
                f"{rpath} holds {spins.shape[0]} walkers but -ns={cfg.n_walkers}; "
                "resume with the checkpoint's walker count"
            )
        state = metropolis.init_state(machine.make_work(params), jnp.asarray(spins, dtype), jnp.asarray(key_data))
        if mesh is not None:
            params = nqs.parallel.replicate_tree(params, mesh)
            state = nqs.parallel.shard_walker_tree(state, mesh, cfg.n_walkers)
        print(f"# resumed from {rpath} at step {start_step}")
    else:
        ifprefix = args.find("ifprefix")
        if ifprefix != "None":
            params = load_reference_text(machine, args.find("path") + "/" + ifprefix)
            print(f"# warm start from {ifprefix}")
        state = vmc.warm_up(params, state, args.find("nwarm", int))

    if auto_nbeta:
        # measured-acceptance replica-count choice on the warmed ensemble
        # (tempering.tune_n_beta); the walkers then reinterpret as
        # replica-minor groups and the tempered sweep takes over
        import dataclasses

        n_dev = 1 if mesh is None else int(np.prod(list(mesh.shape.values())))
        if getattr(ham, "sampler_kind", "flip") == "exchange":
            # sector-preserving tempered-exchange probe (kawasaki)
            from neural_network_quantum_state_tpu.sampler import kawasaki

            nb, diags = kawasaki.tune_n_beta_exchange(
                machine.make_work(params), state, ham.bonds, ham.n_unit_steps, n_devices=n_dev
            )
        else:
            from neural_network_quantum_state_tpu.sampler import tempering

            nb, diags = tempering.tune_n_beta(
                machine.make_work(params), state, vmc.schedule, n_devices=n_dev
            )
        for cand, d in sorted(diags.items()):
            print(f"# nbeta=auto probe n_beta={cand}: swap/pair "
                  + "/".join(f"{a:.2f}" for a in d["swap"])
                  + "  flip/replica " + "/".join(f"{a:.2f}" for a in d["flip"]))
        print(f"# nbeta=auto -> n_beta={nb}")
        cfg = dataclasses.replace(cfg, n_beta=nb)
        vmc = nqs.VMC(machine, ham, cfg, mesh=mesh)

    log = MetricsLogger(prefix + ".metrics.jsonl", echo=True)

    def callback(n, stats):
        log.log(
            n,
            energy=float(stats.energy.re),
            rsd=float(stats.rsd),
            cg_iters=int(stats.cg_iters),
            lam=float(stats.lam),
        )

    ckpt_fmt = args.find("ckpt").lower()
    if ckpt_fmt not in ("npz", "orbax"):
        raise ValueError(f"-ckpt must be npz or orbax, got {ckpt_fmt}")

    def save_all(step, params_c, state_c):
        # reference-format text (interoperable with the reference's loaders)
        # + the structured resume state alongside (.state.npz or .orbax per
        # -ckpt; orbax writes sharded arrays directly - each process commits
        # only its shards, so the same path works single- and multi-host)
        save_reference_text(machine, params_c, prefix)
        if ckpt_fmt == "orbax":
            from neural_network_quantum_state_tpu.utils.checkpoint import save_orbax

            save_orbax(
                prefix + ".orbax", machine, params_c, step=step,
                key=state_c.key, spins=state_c.cache.spins,
            )
        else:
            save_npz(
                prefix + ".state.npz", machine, params_c, step=step,
                key=state_c.key, spins=state_c.cache.spins,
            )

    nrec = args.find("nrec", int)
    params, state, history, elapsed = vmc.run(
        params, state, args.find("niter", int), callback=callback,
        checkpoint_fn=save_all if nrec > 0 else None,
        checkpoint_every=max(nrec, 1), start_step=start_step,
    )
    final_step = history[-1]["step"] + 1 if history else start_step
    save_all(final_step, params, state)
    log.close()
    print(f"# elapsed time: {time.time() - t0:.1f}(sec)  saved: {prefix}")
    return {"prefix": prefix, "history": history, "params": params, "machine": machine}


def _enable_compile_cache():
    """Persistent compilation cache (remote TPU compiles take minutes for
    the big scanned training graphs; reruns then start instantly)."""
    import os

    cache_dir = os.environ.get("NQS_COMPILE_CACHE", os.path.expanduser("~/.cache/nqs_jax"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass  # older jax without the knobs


def main(argv=None):
    enable_cli_logging()
    _enable_compile_cache()
    args = DriverArgs(argv if argv is not None else sys.argv[1:], OPTIONS, DEFAULTS, prog="train")
    print(args.banner())
    model = args.find("model").lower()
    ansatz = args.find("ansatz").lower()
    l = args.find("L", int)
    points = []
    for ver in args.mfind("ver", int):
        for nf in args.mfind("nf", int):
            for alpha in args.mfind("alpha", float):
                for theta in args.mfind("theta", float):
                    points.append((theta, alpha, ver, nf))
                    if model != "lich":
                        break  # theta sweep only applies to LICH
                if model != "lich":
                    break

    g = args.find("gridmesh", int)
    if g > 0 and len(points) > 1:
        # Grid-sweep parallelism: partition the device set into disjoint
        # g-device submeshes and run grid points concurrently, one point
        # per submesh (pod-scale throughput: the reference's mfind grids
        # run strictly serially, LICH-train_rbmtrsymm.cu:82-108). Threads
        # drive independent VMC host loops; they spend their time blocked
        # on device transfers, so dispatch overlaps across submeshes.
        from concurrent.futures import ThreadPoolExecutor
        from queue import Queue

        from jax.sharding import Mesh

        devices = jax.devices()
        n_groups = len(devices) // g
        if n_groups < 1:
            raise ValueError(f"gridmesh={g} exceeds the {len(devices)} available devices")
        slots: Queue = Queue()
        for i in range(n_groups):
            slots.put(Mesh(np.asarray(devices[i * g : (i + 1) * g]), ("walkers",)))

        def run_point(point):
            theta, alpha, ver, nf = point
            mesh = slots.get()
            try:
                return run_one(model, ansatz, l, nf, args, theta, alpha, ver, mesh_override=mesh)
            finally:
                slots.put(mesh)

        with ThreadPoolExecutor(max_workers=n_groups) as pool:
            return list(pool.map(run_point, points))

    return [run_one(model, ansatz, l, nf, args, theta, alpha, ver) for theta, alpha, ver, nf in points]


if __name__ == "__main__":
    main()
