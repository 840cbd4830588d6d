"""End-to-end exactness: VMC ground-state energies vs exact diagonalization
(BASELINE.json config 1 in miniature; SURVEY.md 4 item 2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import neural_network_quantum_state_tpu as nqs
from neural_network_quantum_state_tpu.hamiltonians import LITFIChain, TFIChain
from neural_network_quantum_state_tpu.models import RBM, RBMTrSymm
from neural_network_quantum_state_tpu.utils.exact import (
    ground_energy,
    litfi_chain_dense,
    tfi_chain_dense,
)


def _final_energy(history, tail=15):
    return float(np.mean([h["energy"] for h in history[-tail:]]))


def test_tfi_chain_converges_to_exact():
    n = 8
    machine = RBM(n_inputs=n, n_hiddens=16, dtype=jnp.float64)
    ham = TFIChain(n_sites=n, h=-1.0, j=-1.0)
    cfg = nqs.VMCConfig(n_walkers=256, learning_rate=1e-2, solver="cg", seed=11)
    vmc = nqs.VMC(machine, ham, cfg)
    params, state = vmc.init()
    state = vmc.warm_up(params, state, 200)
    params, state, history, _ = vmc.run(params, state, 400)
    e_exact = ground_energy(tfi_chain_dense(n, h=-1.0, j=-1.0))
    rel = abs(_final_energy(history) - e_exact) / abs(e_exact)
    assert rel < 3e-3, (rel, _final_energy(history), e_exact)


def test_litfi_chain_converges_to_exact():
    """Long-range AFM chain (the paper's model) with the TrSymm RBM."""
    n = 8
    theta = 2.0  # J = sin(theta) > 0 AFM, h = -cos(theta)
    j, h = float(np.sin(theta)), float(-np.cos(theta))
    machine = RBMTrSymm(n_inputs=n, alpha=2, dtype=jnp.float64)
    ham = LITFIChain(n_sites=n, h=h, j=j, alpha=2.0, pbc=True)
    cfg = nqs.VMCConfig(n_walkers=256, learning_rate=2e-2, solver="cg", seed=3)
    vmc = nqs.VMC(machine, ham, cfg)
    params, state = vmc.init()
    state = vmc.warm_up(params, state, 200)
    params, state, history, _ = vmc.run(params, state, 1200)
    e_exact = ground_energy(litfi_chain_dense(n, h=h, j=j, alpha=2.0, pbc=True))
    rel = abs(_final_energy(history, tail=50) - e_exact) / abs(e_exact)
    assert rel < 1e-2, (rel, _final_energy(history, tail=50), e_exact)


def test_dense_sr_also_converges():
    n = 6
    machine = RBM(n_inputs=n, n_hiddens=12, dtype=jnp.float64)
    ham = TFIChain(n_sites=n, h=-1.0, j=-1.0)
    cfg = nqs.VMCConfig(n_walkers=256, learning_rate=1e-2, solver="cholesky", seed=2)
    vmc = nqs.VMC(machine, ham, cfg)
    params, state = vmc.init()
    state = vmc.warm_up(params, state, 150)
    params, state, history, _ = vmc.run(params, state, 300)
    e_exact = ground_energy(tfi_chain_dense(n, h=-1.0, j=-1.0))
    rel = abs(_final_energy(history) - e_exact) / abs(e_exact)
    assert rel < 5e-3, (rel, _final_energy(history), e_exact)


def test_sharded_run_matches_single_device():
    """Walker-sharded execution over the 8-device CPU mesh runs and
    converges (multi-chip path, SURVEY.md 4 item 4)."""
    n = 6
    machine = RBM(n_inputs=n, n_hiddens=12, dtype=jnp.float64)
    ham = TFIChain(n_sites=n, h=-1.0, j=-1.0)
    mesh = nqs.parallel.make_mesh()
    cfg = nqs.VMCConfig(n_walkers=256, learning_rate=1e-2, solver="cg", seed=4)
    vmc = nqs.VMC(machine, ham, cfg, mesh=mesh)
    params, state = vmc.init()
    state = vmc.warm_up(params, state, 150)
    params, state, history, _ = vmc.run(params, state, 250)
    e_exact = ground_energy(tfi_chain_dense(n, h=-1.0, j=-1.0))
    rel = abs(_final_energy(history) - e_exact) / abs(e_exact)
    assert rel < 5e-3, (rel, _final_energy(history), e_exact)
