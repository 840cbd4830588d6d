"""Checkpoint round-trips (reference text format + npz), CLI parser, metrics."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_network_quantum_state_tpu.models import FFNN, RBM, RBMTrSymm, RBMZ2PrSymm
from neural_network_quantum_state_tpu.ops import cplx
from neural_network_quantum_state_tpu.utils.checkpoint import (
    load_npz,
    load_reference_text,
    save_npz,
    save_reference_text,
)
from neural_network_quantum_state_tpu.utils.cli import ArgParseError, DriverArgs
from neural_network_quantum_state_tpu.utils.metrics import MetricsLogger


@pytest.mark.parametrize(
    "machine",
    [
        RBM(n_inputs=6, n_hiddens=8, dtype=jnp.float64),
        FFNN(n_inputs=6, n_hiddens=8, dtype=jnp.float64),
        RBMTrSymm(n_inputs=6, alpha=2, dtype=jnp.float64),
        RBMZ2PrSymm(n_inputs=6, alpha=2, dtype=jnp.float64),
    ],
    ids=["RBM", "FFNN", "RBMTrSymm", "RBMZ2PrSymm"],
)
def test_reference_text_roundtrip(machine, tmp_path):
    params = machine.init_params(jax.random.PRNGKey(0))
    prefix = str(tmp_path / "ckpt")
    paths = save_reference_text(machine, params, prefix)
    assert all(os.path.exists(p) for p in paths)
    loaded = load_reference_text(machine, prefix)
    v0 = np.asarray(cplx.to_complex(machine.flatten_params(params)))
    v1 = np.asarray(cplx.to_complex(machine.flatten_params(loaded)))
    np.testing.assert_allclose(v0, v1, rtol=1e-12)


def test_reference_text_format_is_cpp_style(tmp_path):
    machine = RBMTrSymm(n_inputs=4, alpha=1, dtype=jnp.float64)
    params = machine.init_params(jax.random.PRNGKey(1))
    prefix = str(tmp_path / "fmt")
    save_reference_text(machine, params, prefix)
    text = open(prefix).read()
    # C++ operator<< complex format: (re,im) tokens
    assert text.strip().startswith("(")
    assert text.count("(") == machine.n_vars


def test_npz_roundtrip(tmp_path):
    machine = RBM(n_inputs=5, n_hiddens=7, dtype=jnp.float64)
    params = machine.init_params(jax.random.PRNGKey(2))
    spins = jnp.ones((4, 5))
    path = str(tmp_path / "state.npz")
    save_npz(path, machine, params, step=42, key=jax.random.PRNGKey(3), spins=spins)
    p2, step, key, sp = load_npz(path, machine)
    assert step == 42
    np.testing.assert_array_equal(np.asarray(sp), np.asarray(spins))
    v0 = np.asarray(cplx.to_complex(machine.flatten_params(params)))
    v1 = np.asarray(cplx.to_complex(machine.flatten_params(p2)))
    np.testing.assert_allclose(v0, v1, rtol=1e-12)


def test_orbax_roundtrip(tmp_path):
    from neural_network_quantum_state_tpu.utils.checkpoint import load_orbax, save_orbax

    machine = RBM(n_inputs=5, n_hiddens=7, dtype=jnp.float64)
    params = machine.init_params(jax.random.PRNGKey(2))
    spins = jnp.ones((4, 5))
    path = save_orbax(
        str(tmp_path / "orbax_ckpt"), machine, params, step=7,
        key=jax.random.PRNGKey(3), spins=spins, extra={"lnpsi_re": jnp.zeros((4,))},
    )
    p2, step, key, sp, extra = load_orbax(path, machine)
    assert step == 7 and key is not None
    np.testing.assert_array_equal(np.asarray(sp), np.asarray(spins))
    assert extra is not None and "lnpsi_re" in extra
    v0 = np.asarray(cplx.to_complex(machine.flatten_params(params)))
    v1 = np.asarray(cplx.to_complex(machine.flatten_params(p2)))
    np.testing.assert_allclose(v0, v1, rtol=1e-12)
    # cross-dtype restore: f64-saved checkpoint into an f32 machine
    m32 = RBM(n_inputs=5, n_hiddens=7, dtype=jnp.float32)
    p32, _, _, _, _ = load_orbax(path, m32)
    assert p32["w"].re.dtype == jnp.float32
    # wrong machine rejected
    with pytest.raises(ValueError):
        load_orbax(path, FFNN(n_inputs=5, n_hiddens=7, dtype=jnp.float64))


def test_npz_wrong_machine_rejected(tmp_path):
    m1 = RBM(n_inputs=5, n_hiddens=7, dtype=jnp.float64)
    m2 = FFNN(n_inputs=5, n_hiddens=7, dtype=jnp.float64)
    path = str(tmp_path / "s.npz")
    save_npz(path, m1, m1.init_params(jax.random.PRNGKey(0)))
    with pytest.raises(ValueError):
        load_npz(path, m2)


def test_driver_args():
    opts = [("L", "lattice size"), ("alpha", "decay exponents"), ("lr", "learning rate")]
    args = DriverArgs(["-L=64", "-alpha=1.5,2,2.5"], opts, defaults={"lr": "1e-2"})
    assert args.find("L", int) == 64
    assert args.mfind("alpha", float) == [1.5, 2.0, 2.5]
    assert args.find("lr", float) == 1e-2
    with pytest.raises(ArgParseError):
        DriverArgs(["-L=64"], opts, defaults={"lr": "1e-2"})  # alpha missing
    with pytest.raises(ArgParseError):
        DriverArgs(["-L=64", "-alpha=2", "-bogus=1"], opts, defaults={"lr": "1e-2"})


def test_metrics_logger(tmp_path):
    path = str(tmp_path / "m.jsonl")
    with MetricsLogger(path, echo=False) as log:
        log.log(0, energy=-1.25, rsd=0.1, cg_iters=7)
        log.log(1, energy=-1.30, rsd=0.05, cg_iters=6)
    recs = [json.loads(l) for l in open(path)]
    assert recs[0]["energy"] == -1.25 and recs[1]["step"] == 1


def test_tfi_exact_energy_matches_dense_ed():
    """Jordan-Wigner closed form (any even N) vs dense ED (small N)."""
    from neural_network_quantum_state_tpu.utils.exact import (
        ground_energy,
        tfi_chain_dense,
        tfi_chain_exact_energy,
    )

    for n in (4, 6, 8, 10):
        for (h, j) in ((-1.0, -1.0), (-0.7, -1.0), (-1.3, 1.0), (-0.3, -1.0)):
            ed = ground_energy(tfi_chain_dense(n, h=h, j=j))
            an = tfi_chain_exact_energy(n, h, j)
            assert abs(ed - an) < 1e-10, (n, h, j, ed, an)
