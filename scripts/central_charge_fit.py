"""Central-charge fit from an increment-estimator entanglement profile.

Parses `drivers.measure -what=renyi_inc` output and fits the
periodic-chain Calabrese-Cardy form for Renyi index n=2:

    S2(l) = (c/4) * ln[(N/pi) sin(pi l / N)] + const

The fit runs in INCREMENT space: the per-level ln(q_{j+1}/q_j) readings
are statistically independent chains (unlike the running-sum profile,
whose errors are cumulative and correlated), the constant drops out, and

    -ln(q_{j+1}/q_j) = (c/4) * [x(j+1) - x(j)],
    x(l) = ln[(N/pi) sin(pi l / N)]

is a one-parameter weighted least squares. For the short-range Ising
universality class c = 1/2; the LICH alpha=2.5 long-range chain may
deviate - that is the measurement.

Usage:
    python scripts/central_charge_fit.py LOGFILE -N=64 [-lmin=4] [-json=PATH]

LOGFILE should contain one renyi_inc run (the last run wins if several).
"""

from __future__ import annotations

import json
import math
import re
import sys

import numpy as np

LEVEL = re.compile(r"level\s+(\d+): ln\(q_\d+/q_\d+\) = ([+-]?[\d.]+) \+/- ([\d.eE+-]+)")
PROF = re.compile(r"S2\(l=(\d+)\) = ([+-]?[\d.]+) \+/- ([\d.eE+-]+)")


def parse(path: str):
    """Last run's per-level increments {j: (ln_ratio, err)} and profile."""
    inc: dict[int, tuple[float, float]] = {}
    prof: dict[int, tuple[float, float]] = {}
    for line in open(path):
        m = LEVEL.search(line)
        if m:
            j = int(m.group(1))
            if j in inc:  # a new run restarts the maps
                inc, prof = {}, {}
            inc[j] = (float(m.group(2)), float(m.group(3)))
        m = PROF.search(line)
        if m:
            prof[int(m.group(1))] = (float(m.group(2)), float(m.group(3)))
    return inc, prof


def fit_c(inc, n_sites: int, lmin: int):
    x = lambda l: math.log((n_sites / math.pi) * math.sin(math.pi * l / n_sites))
    js = np.array(sorted(j for j in inc if lmin <= j and j + 1 <= n_sites // 2))
    if js.size < 3:
        raise SystemExit(f"need >= 3 increments with {lmin} <= j < {n_sites // 2}, got {js.size}")
    y = np.array([-inc[j][0] for j in js])  # dS2(j -> j+1)
    e = np.array([max(inc[j][1], 1e-12) for j in js])
    d = np.array([x(j + 1) - x(j) for j in js])
    w = 1.0 / e**2
    a = float((w * d * y).sum() / (w * d * d).sum())  # a = c/4
    a_err = float(math.sqrt(1.0 / (w * d * d).sum()))
    chi2 = float((w * (y - a * d) ** 2).sum() / max(js.size - 1, 1))
    return {
        "c": 4.0 * a, "c_err": 4.0 * a_err, "chi2_dof": chi2,
        "n_points": int(js.size), "j_window": [int(js[0]), int(js[-1])],
    }


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    kw = dict(a[1:].split("=", 1) for a in sys.argv[1:] if a.startswith("-"))
    if not args:
        raise SystemExit(__doc__)
    n_sites = int(kw.get("N", "64"))
    lmin = int(kw.get("lmin", "4"))
    inc, prof = parse(args[0])
    res = fit_c(inc, n_sites, lmin)
    res["profile"] = {int(l): list(v) for l, v in sorted(prof.items())}
    print(f"# c = {res['c']:.4f} +/- {res['c_err']:.4f}   chi2/dof = {res['chi2_dof']:.2f}   "
          f"({res['n_points']} increments, j in {res['j_window']})")
    if "json" in kw:
        with open(kw["json"], "w") as f:
            json.dump(res, f, indent=1)
        print(f"# wrote {kw['json']}")


if __name__ == "__main__":
    main()
