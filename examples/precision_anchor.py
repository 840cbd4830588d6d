"""North-star precision anchor at the largest ED-checkable sizes.

Round-3 verdict item 5: the <= 1e-4 relative-energy bar was proven on-chip
at N=16 (TFI, 1.58e-6) and transferred to N=64 through a 4.6e-4 mixed-vs-f64
cross-check - weaker than the bar itself. This script anchors the
mixed-precision (f32 sampling + f64 estimators/solve) LITFI training
directly against exact diagonalization at N=20 (in-core Lanczos) and N=24
(chunked-diagonal Lanczos), the paper's model (theta=2, alpha_J=2.5 -
reference gpu/src/LICH-train_rbmtrsymm.cu conventions: J=sin theta,
h=-cos theta, per-site 1/L scale).

Stages (separate so the CPU ED and the TPU training run concurrently):

    python examples/precision_anchor.py ed 20          # CPU, exact E0
    python examples/precision_anchor.py ed 24          # CPU, chunked
    python examples/precision_anchor.py train 20       # TPU, VMC energy
    python examples/precision_anchor.py train 24
    python examples/precision_anchor.py report         # rel errs vs 1e-4

Each stage writes logs/precision_anchor_{ed,vmc}_N{n}.json.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

THETA = 2.0
ALPHA_J = 2.5
CHUNK = 1 << 20


def _j_matrix(n: int) -> "np.ndarray":
    import numpy as np

    i, k = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    d = np.abs(i - k).astype(np.float64)
    d = np.minimum(d, n - d)  # PBC circular distance
    with np.errstate(divide="ignore"):
        jm = math.sin(THETA) * d**-ALPHA_J
    np.fill_diagonal(jm, 0.0)
    return jm


def run_ed(n: int) -> float:
    """Exact per-site ground energy by matrix-free Lanczos with a
    chunk-computed diagonal (the scripts/binder_exact_n24.py pattern;
    N=24 holds only the 2^24 f64 diagonal + flip tables in RAM)."""
    import numpy as np
    from scipy.sparse.linalg import LinearOperator, eigsh

    t0 = time.time()
    dim = 1 << n
    jm = _j_matrix(n)
    hn = -math.cos(THETA) / n
    diag = np.empty(dim, np.float64)
    for lo in range(0, dim, CHUNK):
        hi = min(lo + CHUNK, dim)
        bits = (np.arange(lo, hi)[:, None] >> np.arange(n)[None, :]) & 1
        s = (1.0 - 2.0 * bits).astype(np.float64)
        diag[lo:hi] = (0.5 / n) * np.einsum("ki,ki->k", s @ jm, s)
    idx = np.arange(dim, dtype=np.int32)
    flips = [(idx ^ np.int32(1 << b)) for b in range(n)]

    def matvec(v):
        out = diag * v
        for f in flips:
            out += hn * v[f]
        return out

    op = LinearOperator((dim, dim), matvec=matvec, dtype=np.float64)
    w = eigsh(op, k=1, which="SA", tol=1e-10, return_eigenvectors=False)
    e0 = float(w[0])
    out = {"n": n, "theta": THETA, "alpha": ALPHA_J, "e0": e0,
           "seconds": round(time.time() - t0, 1)}
    with open(f"{REPO}/logs/precision_anchor_ed_N{n}.json", "w") as f:
        json.dump(out, f)
    print(json.dumps(out))
    return e0


def run_train(n: int, seed: int = 11) -> float:
    """On-chip mixed-precision LITFI training (f32 sampling, f64
    estimators/solve - the production config the N=64 north star uses) and
    the tail-averaged energy. H = 4N is not a 128-lane multiple at these
    sizes, so the XLA sweep path is used (the fused-kernel A/B lives at
    the flagship N=64 shape in bench.py). Two-stage learning rate: the
    deep-ordered theta=2 state converges into an SR noise floor at fixed
    lr (a first 3000 x 2e-2 pass read 5.5e-4 rel err at N=20; the 2-stage
    2e-2 -> 5e-3 protocol read 1.4e-5 at N=20 but 1.1e-4 at N=24); the
    third 2e-3 stage plus a 1000-iteration tail average takes the larger
    size below the 1e-4 bar too."""
    import dataclasses

    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    import neural_network_quantum_state_tpu as nqs
    from neural_network_quantum_state_tpu.hamiltonians import LITFIChain
    from neural_network_quantum_state_tpu.models import RBMTrSymm

    t0 = time.time()
    machine = RBMTrSymm(n_inputs=n, alpha=4, dtype=jnp.float32)
    ham = LITFIChain(n_sites=n, h=-math.cos(THETA), j=math.sin(THETA),
                     alpha=ALPHA_J, pbc=True)
    cfg = nqs.VMCConfig(
        n_walkers=8192,
        learning_rate=2e-2,
        solver="cg",
        solve_dtype=jnp.float64,
        steps_per_host_loop=50,
        seed=seed,
    )
    vmc = nqs.VMC(machine, ham, cfg)
    params, state = vmc.init()
    state = vmc.warm_up(params, state, 500)
    params, state, _, _ = vmc.run(params, state, 3000)
    vmc2 = nqs.VMC(machine, ham, dataclasses.replace(cfg, learning_rate=5e-3))
    params, state, _, _ = vmc2.run(params, state, 3000, start_step=3000)
    vmc3 = nqs.VMC(machine, ham, dataclasses.replace(cfg, learning_rate=2e-3))
    params, state, history, _ = vmc3.run(params, state, 2000, start_step=6000)
    e = float(np.mean([h["energy"] for h in history[-1000:]]))
    out = {"n": n, "theta": THETA, "alpha": ALPHA_J, "e_vmc": e,
           "n_iter": 8000, "seed": seed,
           "seconds": round(time.time() - t0, 1)}
    with open(f"{REPO}/logs/precision_anchor_vmc_N{n}.json", "w") as f:
        json.dump(out, f)
    print(json.dumps(out))
    return e


def report() -> None:
    rows = []
    for n in (20, 24):
        try:
            ed = json.load(open(f"{REPO}/logs/precision_anchor_ed_N{n}.json"))
            vmc = json.load(open(f"{REPO}/logs/precision_anchor_vmc_N{n}.json"))
        except FileNotFoundError as e:
            print(f"N={n}: missing stage output ({e.filename})")
            continue
        rel = abs(vmc["e_vmc"] - ed["e0"]) / abs(ed["e0"])
        rows.append({"n": n, "e0": ed["e0"], "e_vmc": vmc["e_vmc"],
                     "rel_err": rel, "pass_1e-4": rel <= 1e-4})
        print(f"N={n}: E0={ed['e0']:.8f}  VMC={vmc['e_vmc']:.8f}  "
              f"rel_err={rel:.3g}  {'PASS' if rel <= 1e-4 else 'FAIL'} (bar 1e-4)")
    if rows:
        with open(f"{REPO}/logs/precision_anchor_report.json", "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    stage = sys.argv[1] if len(sys.argv) > 1 else "report"
    if stage == "ed":
        run_ed(int(sys.argv[2]))
    elif stage == "train":
        run_train(int(sys.argv[2]), seed=int(sys.argv[3]) if len(sys.argv) > 3 else 11)
    else:
        report()
