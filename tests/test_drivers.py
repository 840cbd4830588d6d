"""Driver smoke tests: train a tiny model through the CLI, then measure it."""

import os

import numpy as np
import pytest

from neural_network_quantum_state_tpu.drivers import measure, train


def test_train_then_measure_roundtrip(tmp_path):
    res = train.main(
        [
            "-model=CH",
            "-ansatz=rbmtrsymm",
            "-L=8",
            "-nf=2",
            "-ns=128",
            "-niter=60",
            "-nwarm=60",
            "-lr=2e-2",
            "-dtype=float64",
            f"-path={tmp_path}",
            "-rsd=1e-9",
        ]
    )
    assert len(res) == 1
    prefix = res[0]["prefix"]
    assert os.path.exists(prefix)
    assert os.path.exists(prefix + ".metrics.jsonl")
    energies = [h["energy"] for h in res[0]["history"]]
    assert energies[-1] < energies[0]  # descending

    m1, m2, m4 = measure.main(
        [
            "-what=smag",
            "-ansatz=rbmtrsymm",
            "-L=8",
            "-nf=2",
            "-ns=256",
            f"-prefix={prefix}",
            "-niter=10",
            "-nms=2",
            "-nwarm=50",
            "-dtype=float64",
        ]
    )
    assert 0.0 <= m1 <= 1.0 and m2 <= 1.0 and m4 <= 1.0

    m1, m2, m4 = measure.main(
        [
            "-what=stag",
            "-ansatz=rbmtrsymm",
            "-L=8",
            "-nf=2",
            "-ns=256",
            f"-prefix={prefix}",
            "-niter=10",
            "-nms=2",
            "-nwarm=50",
            "-dtype=float64",
        ]
    )
    assert 0.0 <= m1 <= 1.0 and 0.0 <= m2 <= 1.0 and 0.0 <= m4 <= 1.0

    s2 = measure.main(
        [
            "-what=renyi",
            "-ansatz=rbmtrsymm",
            "-L=8",
            "-nf=2",
            "-ns=256",
            f"-prefix={prefix}",
            "-l=4",
            "-niter=10",
            "-nms=2",
            "-nwarm=50",
            "-dtype=float64",
        ]
    )
    assert np.isfinite(s2)


def test_train_grid_sweep(tmp_path):
    res = train.main(
        [
            "-model=LICH",
            "-ansatz=rbmtrsymm",
            "-L=8",
            "-nf=2",
            "-ns=64",
            "-niter=10",
            "-nwarm=20",
            "-theta=1.8,2.2",
            "-alpha=2",
            "-dtype=float64",
            f"-path={tmp_path}",
        ]
    )
    assert len(res) == 2
    prefixes = {r["prefix"] for r in res}
    assert len(prefixes) == 2  # theta encoded in names
    assert all("T1.8" in p or "T2.2" in p for p in prefixes)


def test_train_hubbard_smoke(tmp_path):
    res = train.main(
        [
            "-model=hubbard",
            "-ansatz=rbm",
            "-L=3",
            "-nf=8",
            "-ns=64",
            "-niter=15",
            "-nwarm=30",
            "-U=4",
            "-npar=1,1",
            "-dtype=float64",
            f"-path={tmp_path}",
        ]
    )
    assert os.path.exists(res[0]["prefix"] + "Dw.dat")


def test_train_hubbard_with_trap(tmp_path):
    """Hubbard CLI path incl. the harmonic-trap option
    (fermi_hubbard_CH-train_rbm.cu:117-128)."""
    res = train.main(
        [
            "-model=hubbard",
            "-ansatz=rbm",
            "-L=4",
            "-nf=8",
            "-ns=128",
            "-niter=15",
            "-nwarm=40",
            "-npar=1,1",
            "-U=4",
            "-trap=0.5",
            "-lr=1e-2",
            "-dtype=float64",
            f"-path={tmp_path}",
            "-rsd=1e-9",
        ]
    )
    assert len(res) == 1
    energies = [h["energy"] for h in res[0]["history"]]
    assert np.isfinite(energies).all()

    row = measure.main(
        [
            "-what=opdm",
            "-ansatz=rbm",
            "-L=8",
            "-nf=8",
            "-ns=128",
            f"-prefix={res[0]['prefix']}",
            "-npar=1,1",
            "-site=0",
            "-niter=8",
            "-nms=1",
            "-nwarm=30",
            "-dtype=float64",
        ]
    )
    assert len(row) == 4  # L=4 sites -> m = 0..3
    assert 0.0 <= row[0].real <= 1.0  # m=0 is a double occupancy


def test_measure_driver_on_mesh_matches_single_device(tmp_path):
    """drivers.measure -mesh=8: walker-sharded estimation through the CLI
    agrees with the single-device run to statistical error (VERDICT round-1
    item 4 done criterion)."""
    res = train.main(
        [
            "-model=CH",
            "-ansatz=rbmtrsymm",
            "-L=8",
            "-nf=2",
            "-ns=128",
            "-niter=60",
            "-nwarm=60",
            "-lr=2e-2",
            "-dtype=float64",
            f"-path={tmp_path}",
            "-rsd=1e-9",
        ]
    )
    prefix = res[0]["prefix"]
    common = [
        "-what=stag", "-ansatz=rbmtrsymm", "-L=8", "-nf=2", "-ns=1024",
        f"-prefix={prefix}", "-niter=25", "-nms=2", "-nwarm=100", "-dtype=float64",
    ]
    m1_s, _, _ = measure.main(common + ["-seed=3"])
    m1_m, _, _ = measure.main(common + ["-seed=4", "-mesh=8"])
    assert abs(m1_s - m1_m) < 0.05, (m1_s, m1_m)

    # two-replica estimator through the CLI on the mesh
    s2 = measure.main(
        [
            "-what=renyi", "-ansatz=rbmtrsymm", "-L=8", "-nf=2", "-ns=1024",
            f"-prefix={prefix}", "-l=4", "-niter=10", "-nms=2", "-nwarm=50",
            "-dtype=float64", "-mesh=8",
        ]
    )
    assert np.isfinite(s2)


@pytest.mark.slow
def test_train_driver_on_mesh(tmp_path):
    """drivers.train -mesh=8 + -solvedtype=float64: walker-sharded training
    with the mixed-precision solve through the CLI."""
    res = train.main(
        [
            "-model=CH",
            "-ansatz=rbmtrsymm",
            "-L=8",
            "-nf=2",
            "-ns=128",
            "-niter=40",
            "-nwarm=60",
            "-lr=2e-2",
            "-dtype=float32",
            "-solvedtype=float64",
            "-mesh=8",
            f"-path={tmp_path}",
            "-rsd=1e-9",
        ]
    )
    energies = [h["energy"] for h in res[0]["history"]]
    assert np.isfinite(energies[-1])
    assert energies[-1] < energies[0]


def test_train_grid_parallel_submeshes(tmp_path):
    """-gridmesh=4: two theta grid points train CONCURRENTLY on disjoint
    4-device submeshes of the 8-device virtual mesh; both converge and save
    distinct checkpoints."""
    res = train.main(
        [
            "-model=LICH",
            "-ansatz=rbmtrsymm",
            "-L=8",
            "-nf=2",
            "-ns=64",
            "-niter=40",
            "-nwarm=60",
            "-lr=2e-2",
            "-theta=0.5,1.2",
            "-alpha=2.5",
            "-dtype=float64",
            "-gridmesh=4",
            f"-path={tmp_path}",
            "-rsd=1e-9",
        ]
    )
    assert len(res) == 2
    prefixes = {r["prefix"] for r in res}
    assert len(prefixes) == 2
    for r in res:
        energies = [h["energy"] for h in r["history"]]
        assert np.isfinite(energies[-1])
        assert os.path.exists(r["prefix"])


def test_measure_fidelity_with_tempering(tmp_path):
    """Review regression: -what=fidelity -nbeta>1 must give both replicas
    the same replica layout (s2 previously dropped n_beta and crashed on a
    walker-count mismatch)."""
    from neural_network_quantum_state_tpu.drivers.common import build_machine
    from neural_network_quantum_state_tpu.utils.checkpoint import save_reference_text

    machine = build_machine("rbmtrsymm", 8, 2, np.float64)
    import jax

    p1 = machine.init_params(jax.random.PRNGKey(1))
    p2 = machine.init_params(jax.random.PRNGKey(2))
    save_reference_text(machine, p1, str(tmp_path / "ckptA"))
    save_reference_text(machine, p2, str(tmp_path / "ckptB"))
    val, err = measure.main(
        [
            "-what=fidelity", "-ansatz=rbmtrsymm", "-L=8", "-nf=2", "-ns=256",
            f"-prefix={tmp_path}/ckptA", f"-prefix2={tmp_path}/ckptB",
            "-niter=5", "-nms=1", "-nwarm=20", "-dtype=float64", "-nbeta=4",
        ]
    )
    assert np.isfinite(val) and np.isfinite(err)


def test_train_autosave_and_structured_resume(tmp_path):
    """Kill-and-resume (round-2 verdict item 2): periodic auto-save every
    -nrec iters writes the structured state; -resume restores params +
    optimizer step + RNG + walkers so the lambda schedule CONTINUES instead
    of replaying the 100*0.9^n transient."""
    import json

    common = [
        "-model=CH", "-ansatz=rbmtrsymm", "-L=8", "-nf=2", "-ns=128",
        "-nwarm=60", "-lr=2e-2", "-dtype=float64", f"-path={tmp_path}",
        "-rsd=1e-12", "-nrec=25",
    ]
    res = train.main(common + ["-niter=60"])
    prefix = res[0]["prefix"]
    assert os.path.exists(prefix + ".state.npz")  # auto-saved + final

    res2 = train.main(common + ["-niter=40", f"-resume={os.path.basename(prefix)}"])
    hist2 = res2[0]["history"]
    # resume continues the global step count (60..99), not a restart at 0
    assert hist2[0]["step"] == 60 and hist2[-1]["step"] == 99
    # the metrics file carries both segments, lambda continuing its decay:
    # at step 60 lambda = max(100*0.9^61, 1e-2) ~ 0.163, nowhere near the
    # lambda(0) = 90 a transient replay would show
    recs = [json.loads(line) for line in open(prefix + ".metrics.jsonl")]
    lam_by_step = {r["step"]: r["lam"] for r in recs}
    assert abs(lam_by_step[60] - 100.0 * 0.9**61) < 1e-3
    # energy keeps descending across the boundary (no re-equilibration shock)
    e1 = np.mean([h["energy"] for h in res[0]["history"][-10:]])
    e2 = np.mean([h["energy"] for h in hist2[-10:]])
    assert e2 <= e1 + 0.05


def test_vmc_collapse_auto_remediation():
    """A deliberately collapsed ensemble (all walkers pinned on the Neel
    configuration of a near-deterministic machine) must NOT freeze forever:
    run() detects the zero-variance signature and remediates automatically
    (round-2 verdict item 3; the N=128 scenario of RESULTS.md 5/5b)."""
    import jax
    import jax.numpy as jnp

    import neural_network_quantum_state_tpu as nqs
    from neural_network_quantum_state_tpu.hamiltonians import LITFIChain
    from neural_network_quantum_state_tpu.models import RBM
    from neural_network_quantum_state_tpu.ops.cplx import C

    n, k = 8, 64
    machine = RBM(n_inputs=n, n_hiddens=4, dtype=jnp.float64)
    ham = LITFIChain(n_sites=n, j=1.0, h=-0.01, alpha=2.5, pbc=True)
    cfg = nqs.VMCConfig(
        n_walkers=k, learning_rate=1e-3, solver="cg", seed=3,
        collapse_patience=2, collapse_escalate_nbeta=4,
        collapse_requil_sweeps=1, rsd_cutoff=1e-9,
    )
    vmc = nqs.VMC(machine, ham, cfg)
    params, state = vmc.init()
    # pin the ensemble: a strong Neel-aligned visible bias makes the plain
    # chain's flip-accept probability ~e^-12 (walkers freeze on the Neel
    # state; init_spins for j>0 already starts there) while the escalated
    # tempered replicas at beta=1/4 still mix (accept ~e^-3)
    neel = jnp.where(jnp.arange(n) % 2 == 0, 3.0, -3.0).astype(jnp.float64)
    params = dict(params)
    params["a"] = C(neel, jnp.zeros_like(neel))
    params, state, hist, _ = vmc.run(params, state, 30)
    assert vmc.n_remediations >= 1  # remediation fired (escalation, then reseeds)
    assert len(hist) == 30  # ... and the run completed, no freeze/stop
    assert all(np.isfinite(h["energy"]) for h in hist)
    # remediation restores nonzero estimator variance (a frozen run shows
    # rsd == 0.0 for every remaining step; this hand-pinned delta state
    # re-collapses after each rescue, so blips - not permanence - are the
    # correct expectation here)
    assert any(h["rsd"] > 0 for h in hist[3:])


def test_measure_energy_mode(tmp_path):
    """-what=energy: trained-state <H> without retraining (free fn
    meas_energy, cpu/include/measurements.hpp:123-144; round-2 verdict
    item 6). The measured energy must agree with the end-of-training
    energy and sit above (or near) the exact ground state."""
    from neural_network_quantum_state_tpu.utils.exact import ground_energy, tfi_chain_dense

    res = train.main(
        [
            "-model=CH", "-ansatz=rbmtrsymm", "-L=8", "-nf=2", "-ns=256",
            "-niter=150", "-nwarm=100", "-lr=2e-2", "-dtype=float64",
            f"-path={tmp_path}", "-rsd=1e-12",
        ]
    )
    prefix = res[0]["prefix"]
    e_train = np.mean([h["energy"] for h in res[0]["history"][-20:]])
    e, err = measure.main(
        [
            "-what=energy", "-model=CH", "-h=-1", "-J=-1", "-ansatz=rbmtrsymm",
            "-L=8", "-nf=2", "-ns=512", f"-prefix={prefix}",
            "-niter=30", "-nms=2", "-nwarm=100", "-dtype=float64",
        ]
    )
    assert abs(e.real - e_train) < 0.05
    e0 = ground_energy(tfi_chain_dense(8, h=-1.0, j=-1.0))
    assert abs(e.real - e0) / abs(e0) < 0.02


@pytest.mark.slow
def test_measure_density_profile_trap(tmp_path):
    """-what=density on a trapped Hubbard state: occupations sum to the
    particle number and peak toward the trap center (reference trap study,
    fermi_hubbard_CH-train_rbm.cu:117-128)."""
    res = train.main(
        [
            "-model=hubbard", "-ansatz=rbm", "-L=4", "-nf=8", "-ns=256",
            "-niter=120", "-nwarm=60", "-npar=1,1", "-U=4", "-trap=1.5",
            "-lr=2e-2", "-dtype=float64", f"-path={tmp_path}", "-rsd=1e-12",
        ]
    )
    prefix = res[0]["prefix"]
    occ = measure.main(
        [
            "-what=density", "-ansatz=rbm", "-L=8", "-nf=8", "-ns=512",
            f"-prefix={prefix}", "-npar=1,1", "-niter=40", "-nms=2",
            "-nwarm=100", "-dtype=float64",
        ]
    )
    assert occ.shape == (8,)
    assert abs(occ.sum() - 2.0) < 1e-6  # particle conservation is exact
    n_up = occ[:4]
    # strong trap: the two center sites hold more than the two edges
    assert n_up[1] + n_up[2] > n_up[0] + n_up[3]
    assert os.path.exists(prefix + ".density.dat")


def test_measure_energy_mode_hubbard_trap(tmp_path):
    """-what=energy with -trap: the measured <H> of a trapped Hubbard state
    must include the one-body trap term (same vector the train driver
    builds, train.py:125-131) and agree with the end-of-training energy."""
    res = train.main(
        [
            "-model=hubbard", "-ansatz=rbm", "-L=4", "-nf=8", "-ns=256",
            "-niter=120", "-nwarm=60", "-npar=1,1", "-U=4", "-trap=1.5",
            "-lr=2e-2", "-dtype=float64", f"-path={tmp_path}", "-rsd=1e-12",
        ]
    )
    prefix = res[0]["prefix"]
    e_train = np.mean([h["energy"] for h in res[0]["history"][-20:]])
    e, _err = measure.main(
        [
            "-what=energy", "-model=hubbard", "-U=4", "-t=1", "-trap=1.5",
            "-ansatz=rbm", "-L=8", "-nf=8", "-ns=512", f"-prefix={prefix}",
            "-npar=1,1", "-niter=40", "-nms=2", "-nwarm=100", "-dtype=float64",
        ]
    )
    assert abs(e.real - e_train) < 0.1
    # omitting -trap must measure a visibly different (lower 1-body) energy
    e_nt, _ = measure.main(
        [
            "-what=energy", "-model=hubbard", "-U=4", "-t=1",
            "-ansatz=rbm", "-L=8", "-nf=8", "-ns=512", f"-prefix={prefix}",
            "-npar=1,1", "-niter=40", "-nms=2", "-nwarm=100", "-dtype=float64",
        ]
    )
    assert e.real - e_nt.real > 0.2  # trap term is positive and material


def test_train_structured_resume_on_mesh(tmp_path):
    """-resume with -mesh: the restored params replicate
    (nqs.parallel.replicate_tree - an unexported symbol here crashed every
    multi-device resume) and the walker ensemble re-shards; a walker-count
    mismatch is rejected loudly instead of being silently replicated."""
    import pytest

    common = [
        "-model=CH", "-ansatz=rbmtrsymm", "-L=8", "-nf=2", "-ns=128",
        "-nwarm=40", "-lr=2e-2", "-dtype=float64", f"-path={tmp_path}",
        "-rsd=1e-12", "-nrec=20",
    ]
    res = train.main(common + ["-niter=20"])
    prefix = os.path.basename(res[0]["prefix"])

    res2 = train.main(common + ["-niter=10", f"-resume={prefix}", "-mesh=2"])
    assert res2[0]["history"][0]["step"] == 20

    bad = [a if not a.startswith("-ns=") else "-ns=256" for a in common]
    with pytest.raises(ValueError, match="walkers"):
        train.main(bad + ["-niter=10", f"-resume={prefix}", "-mesh=2"])


@pytest.mark.slow
def test_measure_renyi_increment_mode(tmp_path):
    """-what=renyi_inc: increment-trick S2 through the CLI agrees with the
    direct swap estimator on a small trained state."""
    res = train.main(
        [
            "-model=CH", "-ansatz=rbmtrsymm", "-L=8", "-nf=2", "-ns=128",
            "-niter=60", "-nwarm=60", "-lr=2e-2", "-dtype=float64",
            f"-path={tmp_path}", "-rsd=1e-9",
        ]
    )
    prefix = res[0]["prefix"]
    common = [
        "-ansatz=rbmtrsymm", "-L=8", "-nf=2", f"-prefix={prefix}",
        "-l=4", "-nms=2", "-nwarm=100", "-dtype=float64",
    ]
    s2_swap = measure.main(common + ["-what=renyi", "-ns=2048", "-niter=40", "-seed=5"])
    s2_inc, err = measure.main(common + ["-what=renyi_inc", "-ns=512", "-niter=40", "-seed=6", "-mchunk=16"])
    assert np.isfinite(s2_inc) and err < 0.2
    assert abs(s2_inc - s2_swap) < 0.1, (s2_inc, s2_swap)
    # -z2q=1 (in-chain Z2 orbit quadrature) through the CLI: same answer
    s2_q, err_q = measure.main(common + ["-what=renyi_inc", "-z2q=1", "-ns=512", "-niter=40", "-seed=8"])
    assert np.isfinite(s2_q) and err_q < 0.2
    assert abs(s2_q - s2_swap) < 0.1, (s2_q, s2_swap)


def test_train_j2_na_flags_wired(tmp_path):
    """-J2 reaches TFICheckerBoard.j2 and -na runs accumulated dense SR
    through the CLI (reference CB-train_ffnn.cpp:24,33). Fast wiring check;
    the convergence-vs-ED check is the slow test below."""
    from neural_network_quantum_state_tpu.drivers.common import build_hamiltonian, hamiltonian_kwargs
    from neural_network_quantum_state_tpu.utils.cli import DriverArgs

    args = DriverArgs(
        ["-model=CB", "-h=-1.5", "-J=-1", "-J2=0.3", "-what=energy",
         "-ansatz=ffnn", "-L=16", "-nf=32", "-ns=64", "-prefix=unused"],
        measure.OPTIONS, measure.DEFAULTS, prog="t",
    )
    ham = build_hamiltonian("cb", 16, **hamiltonian_kwargs("cb", 16, args))
    assert ham.j2 == 0.3 and ham.j1 == -1.0

    # -na=2 with a dense solver: the accumulated-SR path end to end
    res = train.main(
        [
            "-model=CH", "-ansatz=rbm", "-L=6", "-nf=6", "-ns=64",
            "-niter=8", "-nwarm=30", "-na=2", "-solver=lu",
            "-dtype=float64", f"-path={tmp_path}",
        ]
    )
    assert len(res) == 1
    assert np.isfinite(res[0]["history"][-1]["energy"])


@pytest.mark.slow
def test_train_cb_j1j2_converges_vs_exact(tmp_path):
    """CB J1-J2 driver run at L=4 vs the sparse-Lanczos ED oracle
    (verdict round-3 item 1b done criterion; couplings match
    test_lattices_2d.test_tficheckerboard_l4_vs_exact_sparse)."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spl

    from neural_network_quantum_state_tpu.hamiltonians import TFICheckerBoard
    from test_lattices_2d import _jfull_from_tables

    l, h = 4, -1.5
    n = l * l
    ham = TFICheckerBoard(n_sites=n, h=h, j1=-1.0, j2=0.3, pbc=True)
    jfull = _jfull_from_tables(ham, n)
    dim = 2**n
    idx = np.arange(dim)
    bits = (idx[:, None] >> np.arange(n)[None, :]) & 1
    s = 1.0 - 2.0 * bits
    diag = 0.5 * np.einsum("ki,ij,kj->k", s, jfull, s)
    rows, cols, vals = [idx], [idx], [diag]
    for i in range(n):
        rows.append(idx)
        cols.append(idx ^ (1 << i))
        vals.append(np.full(dim, h))
    hmat = sp.csr_matrix(
        (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))), shape=(dim, dim)
    )
    e_exact = float(spl.eigsh(hmat, k=1, which="SA", return_eigenvectors=False)[0])

    # rbm ansatz + the hyperparameters of the known-good direct-API test
    # (test_lattices_2d.py:74-76), through the CLI with -J2/-na wired
    res = train.main(
        [
            "-model=CB", "-ansatz=rbm", "-L=16", "-nf=32", "-ns=512",
            "-h=-1.5", "-J=-1", "-J2=0.3", "-na=2", "-solver=lu",
            "-niter=500", "-nwarm=150", "-lr=2e-2",
            "-dtype=float64", f"-path={tmp_path}",
        ]
    )
    e = float(np.mean([x["energy"] for x in res[0]["history"][-30:]]))
    assert abs(e - e_exact) / abs(e_exact) < 1e-2, (e, e_exact)


def test_train_orbax_autosave_and_resume(tmp_path):
    """-ckpt=orbax: periodic auto-save commits an .orbax directory and
    -resume restores params + step + RNG + walkers from it with the same
    semantics as the .state.npz path (round-3 verdict item 6: orbax wired
    into the driver, kill-and-resume parity)."""
    import json

    common = [
        "-model=CH", "-ansatz=rbmtrsymm", "-L=8", "-nf=2", "-ns=128",
        "-nwarm=60", "-lr=2e-2", "-dtype=float64", f"-path={tmp_path}",
        "-rsd=1e-12", "-nrec=25", "-ckpt=orbax",
    ]
    res = train.main(common + ["-niter=60"])
    prefix = res[0]["prefix"]
    assert os.path.isdir(prefix + ".orbax")  # atomic directory commit
    assert not os.path.exists(prefix + ".state.npz")  # orbax replaces npz

    res2 = train.main(common + ["-niter=40", f"-resume={os.path.basename(prefix)}"])
    hist2 = res2[0]["history"]
    # resume continues the global step count and the lambda schedule,
    # exactly like the npz path (test_train_autosave_and_structured_resume)
    assert hist2[0]["step"] == 60 and hist2[-1]["step"] == 99
    recs = [json.loads(line) for line in open(prefix + ".metrics.jsonl")]
    lam_by_step = {r["step"]: r["lam"] for r in recs}
    assert abs(lam_by_step[60] - 100.0 * 0.9**61) < 1e-3


def test_train_orbax_sharded_roundtrip_on_mesh(tmp_path):
    """-ckpt=orbax with -mesh: the walker ensemble is sharded over the
    device mesh when orbax saves it (each process writes only its shards)
    and a mesh-resumed run restores + re-shards it cleanly."""
    common = [
        "-model=CH", "-ansatz=rbmtrsymm", "-L=8", "-nf=2", "-ns=128",
        "-nwarm=40", "-lr=2e-2", "-dtype=float64", f"-path={tmp_path}",
        "-rsd=1e-12", "-nrec=20", "-ckpt=orbax", "-mesh=4",
    ]
    res = train.main(common + ["-niter=20"])
    prefix = os.path.basename(res[0]["prefix"])

    res2 = train.main(common + ["-niter=10", f"-resume={prefix}"])
    assert res2[0]["history"][0]["step"] == 20
    assert np.isfinite(res2[0]["history"][-1]["energy"])
