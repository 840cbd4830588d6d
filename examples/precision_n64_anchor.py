"""N=64 LR-AFM precision anchor (BASELINE north star, VERDICT round-1 item 2).

The reference trains in double end-to-end (every driver instantiates
<double>, e.g. /root/reference/gpu/src/LICH-train_rbmtrsymm.cu:91); there is
no exact diagonalization at N=64, so the anchor is a full-f64 on-chip SR run
and the claim is that the MIXED-PRECISION mode (f32 sampling + f64
estimators/solve, VMCConfig.solve_dtype) reproduces it to <=1e-4 relative
energy.

Runs both from the round-1 flagship checkpoint (warm start) and prints a
JSON summary line. The two arms can run in separate processes (the f64
anchor on the f64-native CPU backend, the mixed arm on the chip - on-chip
f64 transcendentals are emulated and ~70x slower):

    python examples/precision_n64_anchor.py both  [niter] [ntail]
    python examples/precision_n64_anchor.py f64   [niter] [ntail]  # writes .anchor_f64.json
    python examples/precision_n64_anchor.py mixed [niter] [ntail]  # writes .anchor_mixed.json
    python examples/precision_n64_anchor.py report                 # combines the two files
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import neural_network_quantum_state_tpu as nqs  # noqa: E402
from neural_network_quantum_state_tpu.hamiltonians import LITFIChain  # noqa: E402
from neural_network_quantum_state_tpu.models import RBMTrSymm  # noqa: E402
from neural_network_quantum_state_tpu.utils.checkpoint import load_reference_text  # noqa: E402

import math  # noqa: E402

import os  # noqa: E402

# round-1 trained flagship state, resolved relative to the repo root so the
# documented `python examples/precision_n64_anchor.py` works from anywhere
CKPT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "runs", "RBMTrSymmLICH-L64NF4A2.5T2V1")


def run(mode: str, niter: int, ntail: int) -> float:
    n, alpha, theta, alpha_j = 64, 4, 2.0, 2.5
    j, h = math.sin(theta), -math.cos(theta)
    k = 4096
    if mode == "f64":
        machine = RBMTrSymm(n_inputs=n, alpha=alpha, dtype=jnp.float64)
        cfg = nqs.VMCConfig(n_walkers=k, learning_rate=1e-2, solver="cg",
                            steps_per_host_loop=25, seed=11)
    else:  # mixed: f32 machine/sampling, f64 estimators + solve
        machine = RBMTrSymm(n_inputs=n, alpha=alpha, dtype=jnp.float32)
        cfg = nqs.VMCConfig(n_walkers=k, learning_rate=1e-2, solver="cg",
                            solve_dtype=jnp.float64, steps_per_host_loop=25,
                            use_fused_sweeps=jax.devices()[0].platform != "cpu",
                            seed=12)
    ham = LITFIChain(n_sites=n, h=h, j=j, alpha=alpha_j, pbc=True)
    vmc = nqs.VMC(machine, ham, cfg)
    params, state = vmc.init()
    params = load_reference_text(machine, CKPT)
    state = vmc.warm_up(params, state, 500)
    params, state, history, elapsed = vmc.run(params, state, niter)
    tail = [hh["energy"] for hh in history[-ntail:]]
    e = float(np.mean(tail))
    sem = float(np.std(tail) / np.sqrt(len(tail)))
    print(f"# {mode}: E/site = {e:+.6f} +/- {sem:.2e}  ({elapsed:.0f}s, "
          f"{elapsed / max(len(history), 1) * 1e3:.1f} ms/iter)")
    return e


def _report(e64: float, emix: float) -> None:
    rel = abs(emix - e64) / abs(e64)
    print(json.dumps({
        "metric": "N64_LICH_energy_mixed_vs_f64_anchor_rel_err",
        "anchor_f64": e64,
        "mixed": emix,
        "value": float(f"{rel:.3g}"),
        "unit": "rel_err",
    }))


def main():
    arm = sys.argv[1] if len(sys.argv) > 1 else "both"
    niter = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    ntail = int(sys.argv[3]) if len(sys.argv) > 3 else 500
    here = os.path.dirname(os.path.abspath(__file__))
    if arm == "report":
        e64 = json.load(open(os.path.join(here, ".anchor_f64.json")))["energy"]
        emix = json.load(open(os.path.join(here, ".anchor_mixed.json")))["energy"]
        _report(e64, emix)
        return
    if arm == "both":
        _report(run("f64", niter, ntail), run("mixed", niter, ntail))
        return
    e = run(arm, niter, ntail)
    with open(os.path.join(here, f".anchor_{arm}.json"), "w") as f:
        json.dump({"arm": arm, "energy": e, "niter": niter, "ntail": ntail}, f)


if __name__ == "__main__":
    main()
