"""Fused Pallas sweeps under shard_map on the 8-device virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np

import neural_network_quantum_state_tpu as nqs
from neural_network_quantum_state_tpu.hamiltonians import TFIChain
from neural_network_quantum_state_tpu.models import RBMTrSymm
from neural_network_quantum_state_tpu.ops import cplx, engine
from neural_network_quantum_state_tpu.sampler import metropolis


def test_sharded_fused_sweeps_consistent():
    n, k = 16, 512
    machine = RBMTrSymm(n_inputs=n, alpha=2, dtype=jnp.float32)
    params = machine.init_params(jax.random.PRNGKey(0))
    work = machine.make_work(params)
    mesh = nqs.parallel.make_mesh()
    ham = TFIChain(n_sites=n, h=-1.0, j=-1.0)
    spins = ham.init_spins(jax.random.PRNGKey(1), k, jnp.float32)
    state = metropolis.init_state(work, spins, jax.random.PRNGKey(2))
    state = nqs.parallel.shard_walker_tree(state, mesh, k)
    params_s = nqs.parallel.shard_walker_tree(params, mesh, k)
    work = machine.make_work(params_s)

    fused = metropolis.make_fused_sharded_sweeps(mesh, interpret=True)
    sched = jnp.asarray(ham.schedule())
    st = fused(work, state, sched, 3)
    # cache consistency across the shard boundary
    ref_cache, ref_ln = engine.full_forward(work, st.cache.spins)
    np.testing.assert_allclose(np.asarray(st.lnpsi.re), np.asarray(ref_ln.re), atol=2e-4)
    np.testing.assert_allclose(np.asarray(st.cache.y.re), np.asarray(ref_cache.y.re), atol=2e-5)
    assert float(st.n_accepted) > 0
    assert bool(jnp.all(jnp.abs(st.cache.spins) == 1.0))


def test_vmc_mesh_fused_end_to_end():
    n = 12
    machine = RBMTrSymm(n_inputs=n, alpha=2, dtype=jnp.float32)
    ham = TFIChain(n_sites=n, h=-1.0, j=-1.0)
    mesh = nqs.parallel.make_mesh()
    cfg = nqs.VMCConfig(n_walkers=256, learning_rate=1e-2, solver="cg",
                        use_fused_sweeps=True, seed=4)
    vmc = nqs.VMC(machine, ham, cfg, mesh=mesh)
    params, state = vmc.init()
    state = vmc.warm_up(params, state, 20)
    params, state, hist, _ = vmc.run(params, state, 15)
    # NOTE: the interpreter's Pallas PRNG yields zeros (accept-all), so the
    # sampling statistics are wrong off-TPU; this checks the sharded program
    # compiles, runs and stays finite. Convergence is validated on hardware
    # (verify skill) and by the single-device XLA-path e2e tests.
    assert all(np.isfinite(h["energy"]) for h in hist)
