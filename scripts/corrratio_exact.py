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
DEFAULT_PAIRS = [(8, 16), (10, 20), (12, 24)]


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


def analyze(pairs, verbose: bool = True) -> list[tuple[int, int, float, float]]:
    """Print the R_N(theta) tables and every R crossing per pair; returns
    [(ns, nb, tc, err)] with err = the interpolation half-step systematic
    (R is exact; the crossing is linearly interpolated on the grid)."""
    from examples.binder_crossing import crossings

    out = []
    for ns, nb in pairs:
        path = os.path.join(LOGS, f"corrratio_exact_{ns}_{nb}.json")
        if not os.path.exists(path):
            if verbose:
                print(f"# note: missing {os.path.basename(path)}")
            continue
        with open(path) as f:
            data = json.load(f)
        da, db = data["points"][str(ns)], data["points"][str(nb)]
        common = sorted(float(t) for t in set(da) & set(db))
        if verbose:
            print(f"\n# pair ({ns},{nb}):  theta   R({ns})   R({nb})")
            for t in common:
                print(f"#   {t:6.4f}  {da[repr(t)]['R']:.4f}  {db[repr(t)]['R']:.4f}")
        ra = [da[repr(t)]["R"] for t in common]
        rb = [db[repr(t)]["R"] for t in common]
        found = crossings(common, ra, rb, [0.0] * len(common), [0.0] * len(common), direction=-1)
        for t0, t1, tc, terr, _sig in found:
            err = max(terr, (t1 - t0) / 4)
            if verbose:
                print(f"# R crossing in ({t0}, {t1}): theta_c ~ {tc:.4f} +/- {err:.4f}")
            out.append((ns, nb, tc, err))
    return out


def main() -> None:
    args = sys.argv[1:]
    pairs = list(DEFAULT_PAIRS)
    grid = "0.85:1.0:0.0125"
    analyze_only = "-analyze" in args
    for a in args:
        if a.startswith("-pair="):
            pairs = [tuple(int(x) for x in a[6:].split(","))]
        elif a.startswith("-grid="):
            grid = a[6:]
    if analyze_only:
        analyze(pairs)
        return
    thetas = theta_grid(grid)
    print(f"# pairs {pairs}, thetas {thetas}")
    for ns, nb in pairs:
        run_pair(ns, nb, thetas)
    analyze(pairs)


if __name__ == "__main__":
    main()
