"""The top-level ``pynqs`` alias package + the reference's python measurement
scripts executed VERBATIM against the TPU backend.

The reference ships three NumPy measurement scripts that open with
``from pynqs import sampler`` (/root/reference/python/meas_renyi.py:3,
meas_smag.py:3) and re-implement the estimators over the binding's three
primitives (meas_renyi.py:30-59, meas_smag.py:32-41). Here we copy
meas_smag.py and meas_renyi.py into a tmpdir unmodified, point them at a
tiny trained RBMTrSymm checkpoint (written at the exact hardcoded
``./temp/build/RBMTrSymmCH-N16A4H{h}V1`` paths), run them as subprocesses,
and check their printed estimates against exact full-Hilbert-space values
computed from the same checkpoint (N=16 -> 65536 configs is tractable).
"""

import os
import re
import shutil
import subprocess
import sys

import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_SCRIPTS = "/root/reference/python"


def test_pynqs_alias_surface():
    import pynqs
    from pynqs import sampler

    from neural_network_quantum_state_tpu.api import sampler as api_sampler

    assert sampler.RBM is api_sampler.RBM
    assert sampler.FFNN is api_sampler.FFNN
    assert pynqs.__all__ == ["sampler"]
    # the reference import line, character for character (meas_renyi.py:3)
    ns: dict = {}
    exec("from pynqs import sampler", ns)
    assert ns["sampler"].RBM is api_sampler.RBM


@pytest.fixture(scope="module")
def trained_checkpoint(tmp_path_factory):
    """Train a tiny N=16 RBMTrSymm(alpha=4) TFI-chain ground state and save
    it (float32, reference text format) under BOTH hardcoded script paths.

    meas_smag.py's path differs from meas_renyi.py's only in the hfield
    string baked into the filename ('-1.1' vs '-1'); the scripts are
    API-parity tests, so one trained state serves both names."""
    import neural_network_quantum_state_tpu as nqs
    from neural_network_quantum_state_tpu.hamiltonians import TFIChain
    from neural_network_quantum_state_tpu.models import RBMTrSymm
    from neural_network_quantum_state_tpu.utils.checkpoint import save_reference_text

    root = tmp_path_factory.mktemp("pynqs_scripts")
    build = root / "temp" / "build"
    build.mkdir(parents=True)

    n = 16
    machine = RBMTrSymm(n_inputs=n, alpha=4, dtype=jnp.float32)
    ham = TFIChain(n_sites=n, h=-1.0, j=-1.0)
    cfg = nqs.VMCConfig(n_walkers=256, learning_rate=2e-2, solver="cg", seed=7)
    vmc = nqs.VMC(machine, ham, cfg)
    params, state = vmc.init()
    state = vmc.warm_up(params, state, 150)
    params, state, history, _ = vmc.run(params, state, 250)
    save_reference_text(machine, params, str(build / "RBMTrSymmCH-N16A4H-1V1"))
    save_reference_text(machine, params, str(build / "RBMTrSymmCH-N16A4H-1.1V1"))
    return root, machine, params


@pytest.fixture(scope="module")
def second_checkpoint(trained_checkpoint):
    """A second, genuinely different trained state (h=-0.9) saved under
    meas_fidelity.py's other hardcoded path (hfields = ['-0.9', '-1.1'],
    /root/reference/python/meas_fidelity.py:18)."""
    import neural_network_quantum_state_tpu as nqs
    from neural_network_quantum_state_tpu.hamiltonians import TFIChain
    from neural_network_quantum_state_tpu.models import RBMTrSymm
    from neural_network_quantum_state_tpu.utils.checkpoint import save_reference_text

    root, _, _ = trained_checkpoint
    n = 16
    machine = RBMTrSymm(n_inputs=n, alpha=4, dtype=jnp.float32)
    ham = TFIChain(n_sites=n, h=-0.9, j=-1.0)
    cfg = nqs.VMCConfig(n_walkers=256, learning_rate=2e-2, solver="cg", seed=11)
    vmc = nqs.VMC(machine, ham, cfg)
    params, state = vmc.init()
    state = vmc.warm_up(params, state, 150)
    params, state, history, _ = vmc.run(params, state, 250)
    save_reference_text(machine, params, str(root / "temp" / "build" / "RBMTrSymmCH-N16A4H-0.9V1"))
    return machine, params


def _exact_observables(machine, params):
    """Exact <|m|> and Renyi-2 S2(l=N/2) from the full wavefunction."""
    from neural_network_quantum_state_tpu.ops import cplx, engine
    from neural_network_quantum_state_tpu.utils.exact import _spins_table

    n = machine.n_inputs
    spins = jnp.asarray(_spins_table(n), machine.real_dtype)
    lnpsi = cplx.to_numpy_complex(engine.log_psi(machine.make_work(params), spins))
    lnpsi = lnpsi.astype(np.complex128)
    psi = np.exp(lnpsi - lnpsi.real.max())
    psi /= np.linalg.norm(psi)
    p = np.abs(psi) ** 2
    m_abs = float(np.sum(p * np.abs(np.asarray(_spins_table(n)).mean(axis=1))))
    # region A = sites [0, l): site bits are the LOW bits of the basis index
    # (_spins_table ordering), so psi.reshape(2^(N-l), 2^l) is (B, A)
    l = n // 2
    m = psi.reshape(2 ** (n - l), 2**l)
    sv = np.linalg.svd(m, compute_uv=False)
    s2 = float(-np.log(np.sum(sv**4)))
    return m_abs, s2


def _run_script(name: str, cwd) -> str:
    src = os.path.join(REF_SCRIPTS, name)
    dst = os.path.join(cwd, name)
    shutil.copyfile(src, dst)  # verbatim - no edits
    assert open(dst).read() == open(src).read()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, dst], cwd=cwd, env=env,
        capture_output=True, text=True, timeout=1500,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    return proc.stdout


@pytest.mark.slow
def test_meas_smag_verbatim(trained_checkpoint):
    root, machine, params = trained_checkpoint
    out = _run_script("meas_smag.py", str(root))
    mt = re.search(r"<\|m\|> : ([\d.E+-]+)\s+\+/- ([\d.E+-]+)", out)
    assert mt, out[-500:]
    m_script, m_err = float(mt.group(1)), float(mt.group(2))
    m_exact, _ = _exact_observables(machine, params)
    # the script's 2-sigma bar assumes independent samples; allow slack for
    # MCMC autocorrelation on top of it
    assert abs(m_script - m_exact) < max(5 * m_err, 0.02), (m_script, m_err, m_exact)


def _exact_fidelity(machine_a, params_a, machine_b, params_b):
    """Exact |<psi_a|psi_b>| over the full N=16 Hilbert space."""
    from neural_network_quantum_state_tpu.ops import cplx, engine
    from neural_network_quantum_state_tpu.utils.exact import _spins_table

    n = machine_a.n_inputs
    spins = jnp.asarray(_spins_table(n), machine_a.real_dtype)
    vecs = []
    for machine, params in ((machine_a, params_a), (machine_b, params_b)):
        lnpsi = cplx.to_numpy_complex(engine.log_psi(machine.make_work(params), spins))
        lnpsi = lnpsi.astype(np.complex128)
        psi = np.exp(lnpsi - lnpsi.real.max())
        vecs.append(psi / np.linalg.norm(psi))
    return float(abs(np.vdot(vecs[0], vecs[1])))


@pytest.mark.slow
def test_meas_fidelity_verbatim(trained_checkpoint, second_checkpoint):
    """meas_fidelity.py runs unmodified: loads the h=-0.9 and h=-1.1
    checkpoints (two PySampler-style instances), estimates
    F = |<psi0|psi1>| via the two-replica cross ratios
    (/root/reference/python/meas_fidelity.py:37-52), and must match the
    exact full-Hilbert-space overlap of the same two trained states."""
    root, machine_a, params_a = trained_checkpoint
    machine_b, params_b = second_checkpoint
    out = _run_script("meas_fidelity.py", str(root))
    mt = re.search(r"fidelity : ([\d.E+-]+)\s+\+/- ([\d.E+-]+)", out)
    assert mt, out[-500:]
    f_script, f2_err = float(mt.group(1)), float(mt.group(2))
    f_exact = _exact_fidelity(machine_a, params_a, machine_b, params_b)
    # the script's error bar is on F^2; propagate to F (dF = dF2 / 2F)
    f_err = f2_err / max(2.0 * f_script, 1e-6)
    assert abs(f_script - f_exact) < max(5 * f_err, 0.02), (f_script, f_err, f_exact)


@pytest.mark.slow
def test_meas_renyi_verbatim(trained_checkpoint):
    root, machine, params = trained_checkpoint
    out = _run_script("meas_renyi.py", str(root))
    mt = re.search(r"R.enyi: ([\d.E+-]+)\s+\+/- ([\d.E+-]+)", out)
    assert mt, out[-500:]
    s2_script, s2_err = float(mt.group(1)), float(mt.group(2))
    _, s2_exact = _exact_observables(machine, params)
    assert abs(s2_script - s2_exact) < max(5 * s2_err, 0.05), (s2_script, s2_err, s2_exact)
