"""Scaled sampling (BASELINE config 5): N=128 chain, RBM alpha=4, 4096
walkers sharded across a device mesh with psum'd SR.

On real multi-chip hardware this runs as-is; on a single-chip or CPU-only
host it demonstrates the same sharded program on virtual devices:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python examples/scale_n128_mesh.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

import neural_network_quantum_state_tpu as nqs
from neural_network_quantum_state_tpu.hamiltonians import LITFIChain
from neural_network_quantum_state_tpu.models import RBM

N, ALPHA = 128, 4
mesh = nqs.parallel.make_mesh()
on_cpu = mesh.devices.ravel()[0].platform == "cpu"
# full production size on accelerators; a lighter but identically-sharded
# program on the CPU demo backend
K = 512 if on_cpu else 4096
n_warm, n_iter = (5, 3) if on_cpu else (200, 50)

machine = RBM(n_inputs=N, n_hiddens=ALPHA * N, dtype=jnp.float32)
ham = LITFIChain(n_sites=N, h=-0.42, j=0.91, alpha=2.5, pbc=True)
print(f"devices: {len(mesh.devices.ravel())} x {mesh.devices.ravel()[0].platform}; K={K}")

cfg = nqs.VMCConfig(n_walkers=K, learning_rate=1e-2, solver="cg",
                    cg_max_iters=100 if on_cpu else 1000,
                    steps_per_host_loop=1 if on_cpu else 10, seed=0)
vmc = nqs.VMC(machine, ham, cfg, mesh=mesh)
params, state = vmc.init()
print(f"n_vars = {machine.n_vars}; walker shards: "
      f"{state.cache.spins.sharding}")

t0 = time.time()
state = vmc.warm_up(params, state, n_warm)
params, state, hist, el = vmc.run(params, state, n_iter)
print(f"{n_iter} sharded SR iterations in {el:.1f}s; "
      f"E/site trace: {[round(h['energy'], 4) for h in hist[::3]]}")
assert all(np.isfinite(h["energy"]) for h in hist)
print("ok")
