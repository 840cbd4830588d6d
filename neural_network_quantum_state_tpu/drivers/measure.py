"""Generic measurement driver (reference meas_* mains + python meas_*.py).

    python -m neural_network_quantum_state_tpu.drivers.measure \
        -what=renyi -ansatz=rbmtrsymm -L=32 -nf=4 -ns=2048 \
        -prefix=./runs/RBMTrSymmLICH-L32NF4A2T2V1 -l=16 -niter=500

what: energy-free estimators over a trained checkpoint -
  renyi | renyi_inc | fidelity | smag | stag | corrratio | neel | zz | xx | overlap
(fidelity/overlap compare -prefix against -prefix2.)
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

from neural_network_quantum_state_tpu.drivers.common import build_machine, enable_cli_logging
from neural_network_quantum_state_tpu.measurements import (
    AmplitudeSampler,
    fidelity,
    neel_order,
    order_parameter,
    overlap_integral,
    renyi2_entropy,
    spin_x_correlation,
    spin_z_correlation,
    spontaneous_magnetization,
)
from neural_network_quantum_state_tpu.utils.checkpoint import load_reference_text
from neural_network_quantum_state_tpu.utils.cli import DriverArgs

OPTIONS = [
    ("what", "energy | renyi | renyi_inc | fidelity | smag | stag | corrratio | neel | zz | xx | overlap | opdm | density"),
    ("model", "energy only: Hamiltonian to evaluate (CH | LICH | SQ | TRI | CB "
              "| hubbard), with -theta/-alpha (LICH), -h/-J (others), -U/-t (hubbard)"),
    ("theta", "energy+LICH: J=sin(theta), h=-cos(theta)"),
    ("alpha", "energy+LICH: power-law decay exponent"),
    ("h", "energy, non-LICH: transverse field"),
    ("J", "energy, non-LICH: Ising coupling"),
    ("J2", "energy+CB: J2 diagonal coupling"),
    ("U", "energy+hubbard: onsite interaction"),
    ("t", "energy+hubbard: hopping"),
    ("trap", "energy+hubbard: harmonic-trap strength V (V*(i-(L-1)/2)^2, 0 = off)"),
    ("pbc", "energy: periodic boundary (1/0)"),
    ("ansatz", "machine family of the checkpoint"),
    ("L", "# of machine inputs"),
    ("nf", "# of hidden units / filters"),
    ("ns", "# of walkers"),
    ("prefix", "checkpoint prefix to load"),
    ("prefix2", "second checkpoint (fidelity/overlap)"),
    ("l", "renyi subregion size"),
    ("l0", "renyi_inc only: hybrid level offset - measure q_{l0} with the "
           "(tempered) swap estimator and the glued increment chain from "
           "level l0 up (0 = pure increment chain from the empty region). "
           "For deep-ordered states on translation/flip-symmetric ansatze "
           "prefer -l0=0 -z2q=1 (the swap base carries a residual bias "
           "there - RESULTS.md 6h); the hybrid is for ansatze that can "
           "freeze asymmetrically"),
    ("z2q", "renyi_inc only: in-chain Z2 orbit quadrature (1/0) - "
            "Rao-Blackwellize every increment level over global spin "
            "flips; exactly unbiased on deep-ordered cat-like states "
            "without the -l0 hybrid base (~14 extra forwards/measurement)"),
    ("niter", "# of measurement iterations"),
    ("mchunk", "max measurement iterations per device call (0 = one scan; "
               "bound it on remote-tunnel backends whose per-call watchdog "
               "kills minutes-long scans at large L)"),
    ("nms", "# of sweeps between measurements"),
    ("nwarm", "# of warm-up sweeps"),
    ("seed", "RNG seed"),
    ("dtype", "float32 | float64"),
    ("init", "walker start: random | neel (ordered states can be metastable - "
             "near criticality the two inits bound the estimator from both sectors)"),
    ("npar", "opdm only: n_up,n_down sector of the fermion state"),
    ("site", "opdm only: reference site n (rows OPDM(n, m) for m = 0..L-1-n)"),
    ("nbeta", "parallel-tempered estimator replicas (1 = off; 'auto' = pick "
              "from measured exchange acceptance; use for metastable "
              "ordered/near-critical states - ns/nbeta chains read out; "
              "fermion modes run the sector-preserving tempered Kawasaki "
              "exchange ladder)"),
    ("mesh", "# of devices for walker-sharded estimation (0 = single device)"),
    ("fused", "use the fused Pallas sweep kernel (1/0; f32; with -nbeta the "
              "replica-exchange chain runs in-kernel)"),
]
DEFAULTS = {
    "model": "None",
    "theta": "0",
    "alpha": "2",
    "h": "-1",
    "J": "-1",
    "J2": "0",
    "U": "4",
    "t": "1",
    "trap": "0",
    "pbc": "1",
    "prefix2": "None",
    "l": "0",
    "l0": "0",
    "z2q": "0",
    "niter": "500",
    "mchunk": "0",
    "nms": "3",
    "nwarm": "300",
    "seed": "0",
    "dtype": "float32",
    "init": "random",
    "npar": "1,1",
    "site": "0",
    "nbeta": "1",
    "mesh": "0",
    "fused": "0",
}


def main(argv=None):
    enable_cli_logging()
    args = DriverArgs(argv if argv is not None else sys.argv[1:], OPTIONS, DEFAULTS, prog="measure")
    print(args.banner())
    what = args.find("what").lower()
    # fermion (particle-conserving exchange-sampler) modes get the
    # sector-preserving tempered-exchange ladder instead of spin-flip PT
    fermion_mode = what in ("density", "opdm") or (
        what == "energy" and args.find("model").lower() == "hubbard"
    )
    dtype = jnp.float32 if args.find("dtype") == "float32" else jnp.float64
    n, nf, ns = args.find("L", int), args.find("nf", int), args.find("ns", int)
    seed = args.find("seed", int)
    niter, nms, nwarm = args.find("niter", int), args.find("nms", int), args.find("nwarm", int)

    machine = build_machine(args.find("ansatz").lower(), n, nf, dtype)
    params = load_reference_text(machine, args.find("prefix"))

    init_spins = None
    if args.find("init").lower() == "neel":
        neel_row = np.where(np.arange(n) % 2 == 0, 1.0, -1.0)
        init_spins = jnp.asarray(np.tile(neel_row, (ns, 1)), dtype)

    nbeta_raw = args.find("nbeta").lower()
    n_mesh = args.find("mesh", int)
    mesh = None
    if n_mesh > 0:
        from neural_network_quantum_state_tpu.parallel import make_mesh

        mesh = make_mesh(n_mesh)

    use_fused = bool(args.find("fused", int))

    if nbeta_raw == "auto" and not fermion_mode:
        # measured-acceptance ladder choice (tempering.tune_n_beta) on a
        # warmed single-device probe ensemble of this checkpoint
        from neural_network_quantum_state_tpu.sampler import tempering

        probe = AmplitudeSampler(machine, params, ns, key=seed + 13, init_spins=init_spins)
        probe.warm_up(nwarm)
        n_beta, diags = tempering.tune_n_beta(
            probe.work, probe.state, probe.schedule, n_devices=max(n_mesh, 1)
        )
        for cand, d in sorted(diags.items()):
            print(f"# nbeta=auto probe n_beta={cand}: swap/pair "
                  + "/".join(f"{a:.2f}" for a in d["swap"])
                  + "  flip/replica " + "/".join(f"{a:.2f}" for a in d["flip"]))
        print(f"# nbeta=auto -> n_beta={n_beta}")
    elif nbeta_raw == "auto":
        n_beta = 0  # sentinel: resolved by make_fermion_sampler's exchange probe
    else:
        n_beta = int(nbeta_raw)

    mchunk = args.find("mchunk", int)

    def with_chunk(s):
        s.scan_chunk = mchunk
        return s

    def make_fermion_sampler(key, n_up, n_down):
        """Fermion sampler with -nbeta wired: int > 1 = tempered Kawasaki
        exchange (kawasaki.tempered_exchange_sweeps, sector-preserving);
        'auto' = measured-ladder choice with the exchange dynamics (a
        spin-flip probe would leave the particle-number sector)."""
        from neural_network_quantum_state_tpu.measurements.fermion import FermionAmplitudeSampler

        nb = n_beta
        if nb == 0:
            from neural_network_quantum_state_tpu.sampler import kawasaki

            probe = FermionAmplitudeSampler(machine, params, ns, n_up, n_down, key=seed + 13)
            probe.warm_up(nwarm)
            nb, diags = kawasaki.tune_n_beta_exchange(
                probe.work, probe.state, probe.bonds, probe.n_unit_steps,
                n_devices=max(n_mesh, 1),
            )
            for cand, d in sorted(diags.items()):
                print(f"# nbeta=auto probe n_beta={cand}: swap/pair "
                      + "/".join(f"{a:.2f}" for a in d["swap"])
                      + "  exch/replica " + "/".join(f"{a:.2f}" for a in d["flip"]))
            print(f"# nbeta=auto -> n_beta={nb}")
        return with_chunk(FermionAmplitudeSampler(
            machine, params, ns, n_up, n_down, key=key, n_beta=nb,
            mesh=mesh, use_fused=use_fused,
        ))

    def make_sampler(key):
        return with_chunk(AmplitudeSampler(
            machine, params, ns, key=key, init_spins=init_spins, n_beta=n_beta,
            mesh=mesh, use_fused=use_fused,
        ))

    if what == "energy":
        # <H> +/- err of a trained checkpoint (free fn meas_energy,
        # cpu/include/measurements.hpp:123-144; the reference's CPU
        # meas drivers print it without retraining)
        from neural_network_quantum_state_tpu.drivers.common import build_hamiltonian, hamiltonian_kwargs
        from neural_network_quantum_state_tpu.measurements.estimators import measure_energy

        model = args.find("model").lower()
        if model == "none":
            raise ValueError("-what=energy requires -model (and its couplings)")
        # -L here is the machine width, i.e. 2*sites for the Hubbard chain
        l_sites = n // 2 if model == "hubbard" else n
        ham = build_hamiltonian(model, n, **hamiltonian_kwargs(model, l_sites, args))
        if model == "hubbard":
            n_up, n_down = args.mfind("npar", int)
            s1 = make_fermion_sampler(seed, n_up, n_down)
        else:
            s1 = make_sampler(seed)
        s1.warm_up(nwarm)
        e, err = measure_energy((s1, ham), niter, nms)
        print(f"# energy : {e.real:+.7f} +/- {err:.2e}  (imag {e.imag:+.2e})")
        return e, err
    if what == "renyi":
        s1, s2 = make_sampler(seed), make_sampler(seed + 987654321)
        s2_val = renyi2_entropy(s1, s2, args.find("l", int), niter, nms, nwarm)
        print(f"# Renyi entropy(-log(Tr[rho^2])) : {s2_val:.6f}")
        return s2_val
    if what == "renyi_inc":
        # increment-trick (glued-ensemble ratio) estimator: bias-free at
        # large l where the direct swap observable is heavy-tailed
        # (RESULTS.md 6c/6d). -ns = walkers PER LEVEL (levels run as one
        # batch; with -nbeta, ns/nbeta beta=1 chains per level read out).
        # -mesh shards the levels x walkers batch; -nbeta adds the glued
        # PT ladder inside each level block (both also reach the hybrid
        # -l0 swap base through make_sampler).
        from neural_network_quantum_state_tpu.measurements import renyi2_increment

        l_sub, l0 = args.find("l", int), args.find("l0", int)
        base_val, base_err = 0.0, 0.0
        if l0 > 0:
            # hybrid base: q_{l0} via the Z2-orbit-quadrature swap
            # estimator - at small l its observable is O(1), and the
            # global-flip Rao-Blackwellization restores the sector
            # ergodicity that chains lack on deep-ordered (cat-like)
            # states (exactly unbiased for any psi)
            from neural_network_quantum_state_tpu.measurements.renyi_increment import swap_base_z2

            sa, sb = make_sampler(seed + 17), make_sampler(seed + 987654341)
            base_val, base_err = swap_base_z2(sa, sb, l0, niter, nms, nwarm)
            print(f"# base: -ln q_{l0} = {base_val:.6f} +/- {base_err:.6f}  (Z2-quadrature swap, nbeta={n_beta})")
        inc_init = None
        if init_spins is not None:
            inc_init = (init_spins[0], init_spins[0])  # s1 = s2 = the Neel row
        s2_val, s2_err, per_level = renyi2_increment(
            machine, params, l_sub, niter, nms, nwarm,
            walkers_per_level=ns, key=seed, chunk=mchunk,
            level_offset=l0, init_spins=inc_init,
            z2_quadrature=bool(args.find("z2q", int)),
            n_beta=max(n_beta, 1), mesh=mesh,
        )
        # levels are INDEPENDENT chains, so the running sums give the whole
        # entanglement profile S2(l') for every l' <= l from this one
        # batched run (errors add in quadrature) - e.g. the Calabrese-Cardy
        # S2(l') curve for a central-charge fit needs a single driver call
        cum, cum_var = base_val, base_err**2
        for j, (lnr, lne, r) in enumerate(per_level, start=l0):
            cum -= lnr
            cum_var += lne**2
            print(f"# level {j:3d}: ln(q_{j+1}/q_{j}) = {lnr:+.6f} +/- {lne:.2e}  "
                  f"(Re ratio {r:.6f})  S2(l={j + 1}) = {cum:.6f} +/- {np.sqrt(cum_var):.6f}")
        total = base_val + s2_val
        total_err = float(np.sqrt(base_err**2 + s2_err**2))
        print(f"# Renyi entropy (increment trick) : {total:.6f} +/- {total_err:.6f}")
        return total, total_err
    if what in ("fidelity", "overlap"):
        machine2 = build_machine(args.find("ansatz").lower(), n, nf, dtype)
        params2 = load_reference_text(machine2, args.find("prefix2"))
        if what == "fidelity":
            s1 = make_sampler(seed)
            # same mesh: replicas must be co-sharded for device-local cross terms
            s2 = with_chunk(AmplitudeSampler(
                machine2, params2, ns, key=seed + 987654321, init_spins=init_spins,
                n_beta=n_beta, mesh=mesh, use_fused=use_fused,
            ))
            val, err = fidelity(s1, s2, niter, nwarm, nms)
            print(f"# fidelity : {val:.6f} +/- {err:.2e}")
            return val, err
        s1 = make_sampler(seed)
        val, re_err, im_err = overlap_integral(s1, machine2.make_work(params2), niter, nwarm, nms)
        print(f"# real part: {val.real:.6f} +/- {re_err:.2e}")
        print(f"# imag part: {val.imag:.6f} +/- {im_err:.2e}")
        return val
    if what == "smag":
        m1, m2, m4 = spontaneous_magnetization(make_sampler(seed), niter, nms, nwarm)
        print(f"# m1={m1:.6f} m2={m2:.6f} m4={m4:.6f}")
        return m1, m2, m4
    if what == "stag":
        # staggered magnetization m_s = (1/N) sum_i (-1)^i s_i - the AFM
        # chain's order parameter (the reference paper's headline observable).
        # Per-iteration moment trials feed a blocked-jackknife Binder error
        # (the reference's python/meas_smag.py:32-41 computes U point-only)
        from neural_network_quantum_state_tpu.measurements.estimators import binder_cumulant

        coeff = jnp.asarray(np.where(np.arange(n) % 2 == 0, 1.0, -1.0), dtype)
        m1_t, m2_t, m4_t = order_parameter(
            make_sampler(seed), coeff, niter, nms, nwarm, return_trials=True
        )
        m1, m2, m4 = float(np.mean(m1_t)), float(np.mean(m2_t)), float(np.mean(m4_t))
        binder, binder_err = binder_cumulant(m2_t, m4_t)
        print(
            f"# stag m1={m1:.6f} m2={m2:.6f} m4={m4:.6f} binder={binder:.6f}"
            f" binder_err={binder_err:.6f}"
        )
        return m1, m2, m4
    if what == "corrratio":
        # correlation ratio R_N = S(pi + 2pi/N)/S(pi) - a second crossing
        # observable for the FSS program, independent of the Binder
        # cumulant's moment ratios (new capability beyond the reference).
        from neural_network_quantum_state_tpu.measurements.estimators import correlation_ratio

        r, r_err, s_peak, s_nb = correlation_ratio(make_sampler(seed), niter, nms, nwarm)
        print(
            f"# corrratio R={r:.6f} R_err={r_err:.6f} "
            f"S_peak={s_peak:.6f} S_neighbor={s_nb:.6f}"
        )
        return r, r_err
    if what == "neel":
        side = int(round(n**0.5))
        m1, m2, m4 = neel_order(make_sampler(seed), side, niter, nms, nwarm)
        print(f"# neel m1={m1:.6f} m2={m2:.6f} m4={m4:.6f}")
        return m1, m2, m4
    if what == "opdm":
        # pair OPDM row <b+_{n+m} b_n> on a particle-conserving fermion
        # state (MeasOPDM drivers, gpu meas.cuh:251-283); -L is 2L machine
        # inputs, the sector comes from -npar
        from neural_network_quantum_state_tpu.measurements.fermion import opdm_pair

        n_up, n_down = args.mfind("npar", int)
        site = args.find("site", int)
        fs = make_fermion_sampler(seed, n_up, n_down)
        l = machine.n_inputs // 2
        row = [
            opdm_pair(fs, site, m, niter, nms, nwarm if m == 0 else 0)
            for m in range(l - site)
        ]
        out = np.asarray(row)
        np.savetxt(args.find("prefix") + f".opdm{site}.dat", np.c_[out.real, out.imag])
        print(f"# OPDM({site}, m=0..{l - site - 1}): " + " ".join(f"{v.real:+.6f}" for v in row))
        print(f"# wrote {args.find('prefix')}.opdm{site}.dat")
        return row
    if what == "density":
        # per-site occupations <n_i> of a particle-conserving fermion state
        # (the m = 0 OPDM diagonal for every site in one run - the trap
        # profile observable, fermi_hubbard_CH-train_rbm.cu:117-128)
        from neural_network_quantum_state_tpu.measurements.fermion import density_profile

        n_up, n_down = args.mfind("npar", int)
        fs = make_fermion_sampler(seed, n_up, n_down)
        occ = density_profile(fs, niter, nms, nwarm)
        l = machine.n_inputs // 2
        np.savetxt(args.find("prefix") + ".density.dat", np.c_[occ[:l], occ[l:]])
        print("# n_up  : " + " ".join(f"{v:.4f}" for v in occ[:l]))
        print("# n_down: " + " ".join(f"{v:.4f}" for v in occ[l:]))
        print(f"# sum n = {occ.sum():.4f}  wrote {args.find('prefix')}.density.dat")
        return occ
    if what == "zz":
        ss = spin_z_correlation(make_sampler(seed), niter, nms, nwarm)
        np.savetxt(args.find("prefix") + ".zz.dat", ss)
        print(f"# wrote {args.find('prefix')}.zz.dat")
        return ss
    if what == "xx":
        s, ss = spin_x_correlation(make_sampler(seed), niter, nms, nwarm)
        np.savetxt(args.find("prefix") + ".x.dat", s)
        np.savetxt(args.find("prefix") + ".xx.dat", ss)
        print(f"# wrote {args.find('prefix')}.x.dat / .xx.dat")
        return s, ss
    raise ValueError(f"unknown measurement '{what}'")


if __name__ == "__main__":
    main()
