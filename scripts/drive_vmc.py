import sys
mode = sys.argv[1] if len(sys.argv) > 1 else "cpu"
import os
if mode == "cpu":
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax
if mode == "cpu":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import neural_network_quantum_state_tpu as nqs
from neural_network_quantum_state_tpu.models import RBM
from neural_network_quantum_state_tpu.hamiltonians import TFIChain
from neural_network_quantum_state_tpu.utils.exact import tfi_chain_dense, ground_energy

N = 10
dtype = jnp.float64 if mode == "cpu" else jnp.float32
machine = RBM(n_inputs=N, n_hiddens=2 * N, dtype=dtype)
ham = TFIChain(n_sites=N, h=-1.0, j=-1.0)
vmc = nqs.VMC(machine, ham, nqs.VMCConfig(n_walkers=512, learning_rate=1e-2, seed=7))
params, state = vmc.init()
state = vmc.warm_up(params, state, 300)
params, state, history, _ = vmc.run(params, state, 800)
e = sum(h["energy"] for h in history[-20:]) / 20
e_exact = ground_energy(tfi_chain_dense(N, h=-1.0, j=-1.0))
print("rel_err", abs(e - e_exact) / abs(e_exact))
