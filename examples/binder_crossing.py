"""Assemble the finite-size Binder-cumulant table across the QPT.

The reference paper's headline analysis (README.md:2 - the long-range AFM
Ising chain study) locates the quantum phase transition from the crossing
of Binder cumulants U_N(theta) = 1 - m4/(3 m2^2) at different system sizes:
U grows with N in the ordered phase and shrinks with N in the disordered
phase, so curves for different N cross at theta_c.

Inputs: the stag-measurement outputs of drivers.measure (-what=stag with
-nbeta tempered estimation) over the trained theta grids:
  N=32: runs/RBMTrSymmLICH-L32NF4A2.5T{theta}V7 (round 1)
  N=64: runs/RBMTrSymmLICH-L64NF4A2.5T{theta}V9 (round 2, 16k iters each)

Usage: python examples/binder_crossing.py <measure_log_N64> [<measure_log_N32>]
parses '# stag m1=... m2=... m4=... binder=...' lines in theta order and
prints the combined table plus the bracketed crossing estimate.
"""

from __future__ import annotations

import re
import sys

THETAS = [0.4, 0.7, 0.9, 1.1, 1.2, 1.3, 1.4, 1.5, 1.57]

# N=32 Binder values measured in round 1 (RESULTS.md config 3b, nbeta-free
# plain estimation validated against tempered on this grid)
BINDER_N32 = [0.04, 0.07, 0.12, 0.23, 0.32, 0.44, 0.53, 0.59, 0.62]
M1_N32 = [0.17, 0.21, 0.27, 0.38, 0.47, 0.59, 0.72, 0.83, 0.89]


def parse_stag(path: str):
    rows = []
    pat = re.compile(r"# stag m1=([-\d.e]+) m2=([-\d.e]+) m4=([-\d.e]+) binder=([-\d.e]+)")
    for line in open(path):
        m = pat.search(line)
        if m:
            rows.append(tuple(float(g) for g in m.groups()))
    return rows


def main():
    rows64 = parse_stag(sys.argv[1])
    if len(rows64) != len(THETAS):
        raise SystemExit(f"expected {len(THETAS)} stag rows, got {len(rows64)}")
    if len(sys.argv) > 2:
        rows32 = parse_stag(sys.argv[2])
        b32 = [r[3] for r in rows32]
        m32 = [r[0] for r in rows32]
    else:
        b32, m32 = BINDER_N32, M1_N32
    print(f"{'theta':>6} {'m1(32)':>8} {'U(32)':>7} {'m1(64)':>8} {'U(64)':>7}")
    crossing = None
    for i, t in enumerate(THETAS):
        m1_64, _, _, b64 = rows64[i]
        print(f"{t:6.2f} {m32[i]:8.3f} {b32[i]:7.3f} {m1_64:8.3f} {b64:7.3f}")
        if i > 0 and (rows64[i - 1][3] - b32[i - 1]) * (b64 - b32[i]) < 0:
            crossing = (THETAS[i - 1], t)
    if crossing:
        print(f"# Binder crossing bracketed in theta = ({crossing[0]}, {crossing[1]})")
    else:
        print("# no crossing inside the grid (curves do not intersect here)")


if __name__ == "__main__":
    main()
