"""pynqs-compat API test: run the reference's meas_renyi.py measurement
pattern verbatim against our backend and check it against the estimator."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_network_quantum_state_tpu.api import sampler as api_sampler
from neural_network_quantum_state_tpu.models import RBMTrSymm
from neural_network_quantum_state_tpu.utils.checkpoint import save_reference_text


def _make_ckpt(tmp_path, n, alpha, seed=0):
    machine = RBMTrSymm(n_inputs=n, alpha=alpha, dtype=jnp.float64)
    params = machine.init_params(jax.random.PRNGKey(seed))
    prefix = str(tmp_path / f"RBMTrSymmCH-N{n}A{alpha}")
    save_reference_text(machine, params, prefix)
    return machine, params, prefix


def test_pynqs_renyi_script_pattern(tmp_path):
    """The exact access pattern of python/meas_renyi.py:30-59."""
    n, alpha, n_chains = 8, 2, 512
    machine, params, prefix = _make_ckpt(tmp_path, n, alpha)

    kwargs = {
        "nInputs": n,
        "nHiddens": alpha,
        "nChains": n_chains,
        "seedDistance": 123456789,
        "init_mcmc_steps": 100,
        "path_to_load": prefix,
    }
    rbms = [api_sampler.RBM(floatType="float64", symmType="tr") for _ in range(2)]
    for i, rbm in enumerate(rbms):
        kwargs["seedNumber"] = (i + 1) * kwargs["seedDistance"]
        rbm.init(**kwargs)

    l = n // 2
    nmeas, nms = 30, 3
    tr2 = np.zeros(nmeas)
    for i in range(nmeas):
        rbms[0].do_mcmc_steps(nms)
        rbms[1].do_mcmc_steps(nms)
        spins0 = rbms[0].get_spinStates()
        spins1 = rbms[1].get_spinStates()
        lnpsi_0 = rbms[0].get_lnpsi()
        lnpsi_1 = rbms[1].get_lnpsi()
        spins2, spins3 = spins0.copy(), spins1.copy()
        spins2[:, :l] = spins1[:, :l]
        spins3[:, :l] = spins0[:, :l]
        lnpsi_2 = rbms[0].get_lnpsi_for_fixed_spins(spins2)
        lnpsi_3 = rbms[1].get_lnpsi_for_fixed_spins(spins3)
        tr2[i] = np.mean(np.exp(lnpsi_2 + lnpsi_3 - lnpsi_0 - lnpsi_1)).real
    renyi = -np.log(np.mean(tr2))

    # oracle: exact S2 of subsystem [0, l) by full enumeration
    from neural_network_quantum_state_tpu.ops import cplx, engine

    idx = np.arange(2**n)
    bits = (idx[:, None] >> np.arange(n)[None, :]) & 1
    all_spins = jnp.asarray(1.0 - 2.0 * bits, jnp.float64)
    psi = np.exp(np.asarray(cplx.to_complex(engine.log_psi(machine.make_work(params), all_spins))))
    psi /= np.linalg.norm(psi)
    psi_mat = psi.reshape(2 ** (n - l), 2**l)
    rho_a = psi_mat.T @ psi_mat.conj()
    s2_exact = -np.log(np.real(np.trace(rho_a @ rho_a)))
    assert abs(renyi - s2_exact) < 0.1, (renyi, s2_exact)


def test_api_shapes_and_load_warning(tmp_path, capsys):
    rbm = api_sampler.RBM(floatType="float32", symmType="None")
    rbm.init(
        nInputs=6,
        nHiddens=4,
        nChains=32,
        seedNumber=7,
        seedDistance=1,
        path_to_load=str(tmp_path / "missing"),
        init_mcmc_steps=10,
    )
    out = capsys.readouterr().out
    assert "is not exist" in out
    s = rbm.get_spinStates()
    assert s.shape == (32, 6) and set(np.unique(s)).issubset({-1.0, 1.0})
    ln = rbm.get_lnpsi()
    assert ln.shape == (32,) and np.iscomplexobj(ln)
    ln2 = rbm.get_lnpsi_for_fixed_spins(s)
    np.testing.assert_allclose(ln2, ln, rtol=1e-5, atol=1e-5)


def test_api_bad_dispatch():
    with pytest.raises(Exception):
        api_sampler.RBM(floatType="float16", symmType="None")
    with pytest.raises(Exception):
        api_sampler.FFNN(floatType="float32", symmType="z2pr")
