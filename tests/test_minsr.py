"""minSR (kernel-trick SR, walker-space solve) correctness.

The push-through identity makes sr_minsr_solve EXACTLY equal to the dense
V-space solve with the same absolute ridge, for any K/V ratio - both
directions (V > K and K > V) are asserted against build_s_matrix + lu_solve,
and a short VMC run checks the solver trains end to end.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import pytest

from neural_network_quantum_state_tpu.ops import cplx
from neural_network_quantum_state_tpu.ops.cplx import C
from neural_network_quantum_state_tpu.optim.solvers import lu_solve
from neural_network_quantum_state_tpu.optim.sr import (
    build_s_matrix,
    force_vector,
    sr_minsr_solve,
)


def _random_system(key, k, v, dtype=jnp.float64):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    o_mat = C(
        jax.random.normal(k1, (k, v), dtype),
        jax.random.normal(k2, (k, v), dtype),
    )
    htilda = C(
        jax.random.normal(k3, (k,), dtype),
        0.1 * jax.random.normal(k4, (k,), dtype),
    )
    return o_mat, htilda


def _dense_absolute_ridge(o_mat, htilda, lam_abs):
    """V-space oracle: (S + lam_abs I) dx = F with the ISOTROPIC ridge."""
    f, a_o = force_vector(o_mat, htilda)
    s = build_s_matrix(o_mat, a_o)
    v = s.re.shape[0]
    s = C(s.re + jnp.eye(v, dtype=s.re.dtype) * lam_abs, s.im)
    return lu_solve(s, f)


@pytest.mark.parametrize("k,v", [(64, 24), (24, 64)])
def test_minsr_matches_dense_absolute_ridge(k, v):
    """Both regimes: more walkers than params, and params than walkers."""
    o_mat, htilda = _random_system(jax.random.PRNGKey(0), k, v)
    lam = jnp.asarray(0.05, jnp.float64)
    dx, lam_abs = sr_minsr_solve(o_mat, htilda, lam)
    ref = _dense_absolute_ridge(o_mat, htilda, lam_abs)
    num = jnp.sqrt(cplx.norm2(dx - ref))
    den = jnp.sqrt(cplx.norm2(ref))
    assert float(num / den) < 1e-9


def test_minsr_heavy_regularization_shrinks_step():
    """l -> large must shrink ||dx|| ~ 1/l (sanity of the ridge wiring)."""
    o_mat, htilda = _random_system(jax.random.PRNGKey(1), 48, 16)
    small, _ = sr_minsr_solve(o_mat, htilda, jnp.asarray(1e-3, jnp.float64))
    big, _ = sr_minsr_solve(o_mat, htilda, jnp.asarray(1e3, jnp.float64))
    assert float(cplx.norm2(big)) < 1e-3 * float(cplx.norm2(small))


def test_minsr_mesh_matches_single_device():
    """Walker-sharded o_mat/htilda give the same minSR step as replicated
    inputs: the KxK Gram build gathers the sharded rows (GSPMD) and the
    dense solve is replicated, so the answer must be bit-comparable."""
    import neural_network_quantum_state_tpu as nqs
    from neural_network_quantum_state_tpu.parallel import mesh as meshlib

    o_mat, htilda = _random_system(jax.random.PRNGKey(2), 64, 24)
    lam = jnp.asarray(0.05, jnp.float64)
    dx_single, _ = sr_minsr_solve(o_mat, htilda, lam)

    mesh = nqs.parallel.make_mesh()
    shard = meshlib.walker_sharding(mesh)
    o_sh = C(jax.device_put(o_mat.re, shard), jax.device_put(o_mat.im, shard))
    h_sh = C(jax.device_put(htilda.re, shard), jax.device_put(htilda.im, shard))
    dx_mesh, _ = jax.jit(lambda o, h: sr_minsr_solve(o, h, lam))(o_sh, h_sh)
    num = jnp.sqrt(cplx.norm2(dx_mesh - dx_single))
    den = jnp.sqrt(cplx.norm2(dx_single))
    assert float(num / den) < 1e-10


def test_minsr_vmc_converges_tfi():
    """End-to-end: tiny TFI chain trains to the exact ground state with
    solver='minsr' (same tolerance class as the CG path in test_e2e)."""
    import neural_network_quantum_state_tpu as nqs
    from neural_network_quantum_state_tpu.hamiltonians import TFIChain
    from neural_network_quantum_state_tpu.models import RBM
    from neural_network_quantum_state_tpu.utils.exact import (
        ground_energy,
        tfi_chain_dense,
    )

    n = 8
    machine = RBM(n_inputs=n, n_hiddens=2 * n, dtype=jnp.float64)
    ham = TFIChain(n_sites=n, h=-1.0, j=-1.0)
    cfg = nqs.VMCConfig(n_walkers=256, learning_rate=1e-2, seed=3, solver="minsr")
    vmc = nqs.VMC(machine, ham, cfg)
    params, state = vmc.init()
    state = vmc.warm_up(params, state, 200)
    params, state, history, _ = vmc.run(params, state, 500)
    e = sum(h["energy"] for h in history[-20:]) / 20
    e_exact = ground_energy(tfi_chain_dense(n, h=-1.0, j=-1.0))
    assert abs(e - e_exact) / abs(e_exact) < 5e-3
