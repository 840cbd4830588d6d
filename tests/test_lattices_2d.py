"""2D lattice Hamiltonians vs exact diagonalization: square (L=2),
triangular (L=3), checkerboard J1-J2 (L=4, sparse Lanczos)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import neural_network_quantum_state_tpu as nqs
from neural_network_quantum_state_tpu.hamiltonians import TFICheckerBoard, TFISQ, TFITRI
from neural_network_quantum_state_tpu.models import RBM
from neural_network_quantum_state_tpu.utils.exact import ground_energy, tfi_hamiltonian_dense


def _jfull_from_tables(ham, n):
    nnidx, jmat = ham._tables()
    jfull = np.zeros((n, n))
    for i in range(n):
        for a, jv in zip(nnidx[i], jmat[i]):
            jfull[i, a] += jv
    # diag = 0.5 sum_i s_i sum_n J[i,n] s_nn == 0.5 s.Jfull.s  (Jfull need
    # not be symmetrized further: both directed entries are in the table)
    return jfull


def _vmc_energy(machine, ham, iters=400, lr=1e-2, k=256, seed=3):
    cfg = nqs.VMCConfig(n_walkers=k, learning_rate=lr, solver="cg", seed=seed)
    vmc = nqs.VMC(machine, ham, cfg)
    params, state = vmc.init()
    state = vmc.warm_up(params, state, 150)
    params, state, hist, _ = vmc.run(params, state, iters)
    return float(np.mean([x["energy"] for x in hist[-30:]]))


def test_tfisq_l2_vs_exact():
    ham = TFISQ(n_sites=4, h=-1.0, j=-1.0)
    hmat = tfi_hamiltonian_dense(_jfull_from_tables(ham, 4), h=-1.0)
    e_exact = ground_energy(hmat)
    machine = RBM(n_inputs=4, n_hiddens=8, dtype=jnp.float64)
    e = _vmc_energy(machine, ham)
    assert abs(e - e_exact) / abs(e_exact) < 5e-3, (e, e_exact)


def test_tfitri_l3_vs_exact():
    ham = TFITRI(n_sites=9, h=-2.0, j=1.0)  # AFM triangular, strong field
    hmat = tfi_hamiltonian_dense(_jfull_from_tables(ham, 9), h=-2.0)
    e_exact = ground_energy(hmat)
    machine = RBM(n_inputs=9, n_hiddens=18, dtype=jnp.float64)
    e = _vmc_energy(machine, ham, iters=600, lr=2e-2)
    assert abs(e - e_exact) / abs(e_exact) < 1e-2, (e, e_exact)


@pytest.mark.slow
def test_tficheckerboard_l4_vs_exact_sparse():
    import scipy.sparse as sp
    import scipy.sparse.linalg as spl

    l, h = 4, -1.5
    ham = TFICheckerBoard(n_sites=l * l, h=h, j1=-1.0, j2=0.3, pbc=True)
    n = l * l
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
    hmat = sp.csr_matrix((np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))), shape=(dim, dim))
    e_exact = float(spl.eigsh(hmat, k=1, which="SA", return_eigenvectors=False)[0])
    machine = RBM(n_inputs=n, n_hiddens=32, dtype=jnp.float64)
    e = _vmc_energy(machine, ham, iters=500, lr=2e-2, k=512)
    assert abs(e - e_exact) / abs(e_exact) < 1e-2, (e, e_exact)
