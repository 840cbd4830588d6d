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
