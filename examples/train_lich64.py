"""Flagship run: N=64 long-range AFM Ising chain ground state (paper config).

Reproduces the reference's LICH-train_rbmtrsymm.cu workflow (J = sin(theta),
h = -cos(theta), J_ij = J/d^alpha, PBC, RBMTrSymm) on one TPU chip with the
fused Pallas sampler and 50-iteration device chunks. Writes a
reference-format checkpoint and a metrics JSONL next to -path.

    python examples/train_lich64.py [theta] [alpha] [niter]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import neural_network_quantum_state_tpu as nqs
from neural_network_quantum_state_tpu.hamiltonians import LITFIChain
from neural_network_quantum_state_tpu.measurements import AmplitudeSampler, order_parameter
from neural_network_quantum_state_tpu.models import RBMTrSymm
from neural_network_quantum_state_tpu.utils.checkpoint import save_reference_text
from neural_network_quantum_state_tpu.utils.metrics import MetricsLogger

N, NF, K = 64, 4, 8192
theta = float(sys.argv[1]) if len(sys.argv) > 1 else 2.0
alpha_j = float(sys.argv[2]) if len(sys.argv) > 2 else 2.5
niter = int(sys.argv[3]) if len(sys.argv) > 3 else 20000

j, h = float(np.sin(theta)), float(-np.cos(theta))
machine = RBMTrSymm(n_inputs=N, alpha=NF, dtype=jnp.float32)
ham = LITFIChain(n_sites=N, h=h, j=j, alpha=alpha_j, pbc=True)
cfg = nqs.VMCConfig(
    n_walkers=K,
    learning_rate=1e-2,
    solver="cg",
    rsd_cutoff=1e-3,
    steps_per_host_loop=50,
    use_fused_sweeps=True,
    seed=7,
)
vmc = nqs.VMC(machine, ham, cfg)
params, state = vmc.init()
t0 = time.time()
state = vmc.warm_up(params, state, 500)

prefix = f"RBMTrSymmLICH-L{N}NF{NF}A{alpha_j:g}T{theta:g}V1"
log = MetricsLogger(prefix + ".metrics.jsonl", echo=False)


def cb(n, stats):
    log.log(n, energy=float(stats.energy.re), rsd=float(stats.rsd), cg=int(stats.cg_iters))
    if n % 1000 == 999:
        print(f"iter {n + 1}: E/site = {float(stats.energy.re):+.6f}  rsd = {float(stats.rsd):.3e}",
              flush=True)


def ckpt(n, cur_params, cur_state):
    save_reference_text(machine, cur_params, prefix)


params, state, hist, el = vmc.run(params, state, niter, callback=cb,
                                  checkpoint_fn=ckpt, checkpoint_every=1000)
save_reference_text(machine, params, prefix)
e = float(np.mean([x["energy"] for x in hist[-500:]]))
print(f"converged E/site = {e:.6f} after {len(hist)} iters in {time.time() - t0:.0f}s")

smp = AmplitudeSampler(machine, params, 4096, key=99)
stag = jnp.asarray((-1.0) ** np.arange(N), jnp.float32)
m1, m2, m4 = order_parameter(smp, stag, n_iterations=50, n_sweeps=2, n_warmup=300)
print(f"staggered magnetization: m1={m1:.4f} m2={m2:.4f} m4={m4:.4f} "
      f"binder={1 - m4 / (3 * m2 * m2):.4f}")
