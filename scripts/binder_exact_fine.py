"""Refine the exact Binder pair crossings on a fine theta grid.

The coarse ED grids (logs/binder_exact_pairs.json at 0.025 spacing,
logs/binder_exact_n1224.json) give pair crossings (8,16)=0.9243,
(10,20)=0.9110, (12,24)=0.9151 - non-monotone because linear
interpolation on a 0.025-spaced grid carries ~0.005-0.01 error where U(theta)
is strongly curved. This script computes the crossing-bracketing thetas at
0.005 spacing for each fixed-ratio pair and writes one ED-grid JSON per pair
(binder_crossing.py format), seeding each grid with the already-computed
coarse values at 0.9/0.925 so the crossing scan sees a full bracket.

Run on CPU (single core): N<=20 points are seconds-to-minutes; each N=24
point is ~10-20 min (chunked matrix-free Lanczos, scripts/binder_exact_n24.py
machinery). Pairs run cheapest-first and every point is flushed to disk
incrementally, so partial progress is usable.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scripts.binder_exact_n24 import binder_exact_large  # noqa: E402

LOGS = os.path.join(REPO, "logs")

# seed values from the committed coarse grids
with open(os.path.join(LOGS, "binder_exact_pairs.json")) as f:
    COARSE = json.load(f)
with open(os.path.join(LOGS, "binder_exact_n1224.json")) as f:
    COARSE1224 = json.load(f)


def coarse_u(n: int, theta: float) -> float:
    grid = COARSE1224 if n in (12, 24) else COARSE
    i = grid["thetas"].index(theta)
    return grid["U"][str(n)][i]


# (small, big): fine thetas to compute; 0.9/0.925 seeded from coarse
PAIRS = [
    ((8, 16), [0.91, 0.915, 0.92, 0.93]),
    ((10, 20), [0.905, 0.91, 0.915, 0.92]),
    ((12, 24), [0.905, 0.91, 0.915, 0.92]),
]


def main() -> None:
    for (ns, nb), fine in PAIRS:
        thetas = sorted([0.9, 0.925] + fine)
        out = {
            "thetas": thetas,
            "U": {str(ns): [None] * len(thetas), str(nb): [None] * len(thetas)},
        }
        path = os.path.join(LOGS, f"binder_exact_fine_{ns}_{nb}.json")
        for n in (ns, nb):
            for i, t in enumerate(thetas):
                if t in (0.9, 0.925):
                    out["U"][str(n)][i] = coarse_u(n, t)
                    continue
                t0 = time.time()
                r = binder_exact_large(n, t, 2.5)
                out["U"][str(n)][i] = r["U"]
                print(
                    f"pair ({ns},{nb}) N={n} theta={t}: U={r['U']:.6f} "
                    f"[{time.time() - t0:.0f}s]",
                    flush=True,
                )
                with open(path, "w") as f:
                    json.dump(out, f, indent=1)
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
