"""Exact correlation-ratio crossings R_N(theta) for the LITFI chain.

Computes R_N = S(pi + 2pi/N)/S(pi) on the ED ground state over a theta
grid for fixed-ratio-2 size pairs, writing one JSON per pair in the
binder_crossing.py ED-grid format (with "R" in place of "U" consumers
can pick either - every point carries m*, U, S_peak, S_nb, R from
scripts.binder_exact_n24.binder_exact_large).

The correlation ratio is an INDEPENDENT crossing observable from the
Binder cumulant (different moments of the same order parameter vs the
structure-factor neighborhood of the Bragg peak), so its pair crossings
give a methodology cross-check on theta_c. VMC counterparts are measured
by scripts/corrratio_measure.sh via drivers.measure -what=corrratio.

Pairs (8,16) and (10,20) by default (~45 CPU-min, dominated by N=20
Lanczos); pass -pair=12,24 for the expensive third pair (~2 h). Points
flush incrementally; completed points are skipped on re-run.

Usage: python scripts/corrratio_exact.py [-pair=8,16] [-grid=0.85:1.0:0.0125]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scripts.binder_exact_n24 import binder_exact_large  # noqa: E402

LOGS = os.path.join(REPO, "logs")
ALPHA = 2.5
DEFAULT_PAIRS = [(8, 16), (10, 20)]


def theta_grid(spec: str) -> list[float]:
    lo, hi, step = (float(x) for x in spec.split(":"))
    out, t = [], lo
    while t <= hi + 1e-9:
        out.append(round(t, 4))
        t += step
    return out


def run_pair(ns: int, nb: int, thetas: list[float]) -> None:
    path = os.path.join(LOGS, f"corrratio_exact_{ns}_{nb}.json")
    data = {"alpha": ALPHA, "thetas": [], "points": {str(ns): {}, str(nb): {}}}
    if os.path.exists(path):
        with open(path) as f:
            data = json.load(f)
    for n in (ns, nb):
        for t in thetas:
            key = repr(t)
            if key in data["points"][str(n)]:
                continue
            data["points"][str(n)][key] = binder_exact_large(n, t, ALPHA)
            if t not in data["thetas"]:
                data["thetas"].append(t)
            with open(path, "w") as f:  # incremental flush
                json.dump(data, f, indent=1)
    print(f"pair ({ns},{nb}) complete -> {path}")


def main() -> None:
    args = sys.argv[1:]
    pairs = list(DEFAULT_PAIRS)
    grid = "0.85:1.0:0.0125"
    for a in args:
        if a.startswith("-pair="):
            pairs = [tuple(int(x) for x in a[6:].split(","))]
        elif a.startswith("-grid="):
            grid = a[6:]
    thetas = theta_grid(grid)
    print(f"# pairs {pairs}, thetas {thetas}")
    for ns, nb in pairs:
        run_pair(ns, nb, thetas)


if __name__ == "__main__":
    main()
