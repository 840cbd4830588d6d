"""Assemble the finite-size Binder-cumulant table across the QPT.

The reference paper's headline analysis (README.md:2 - the long-range AFM
Ising chain study) locates the quantum phase transition from the crossing
of Binder cumulants U_N(theta) = 1 - m4/(3 m2^2) at different system sizes:
U grows with N in the ordered phase and shrinks with N in the disordered
phase, so curves for different N cross at theta_c (python/meas_smag.py:32-41
computes U; the crossing analysis itself is the paper's, not the code's).

Inputs: measurement logs of drivers.measure (-what=stag with tempered
-nbeta=8 -fused=1 estimation) over the trained theta grids - each log is a
sequence of '=== theta=X ===' headers followed by
'# stag m1=... m2=... m4=... binder=... binder_err=...' lines (binder_err
is the blocked-jackknife error, estimators.binder_cumulant).

Usage:
    python examples/binder_crossing.py [--pairs] [LABEL:PATH ...]

With --pairs the inputs are taken two at a time as fixed-ratio (small, big)
size pairs - e.g. 8:ED 16:ED 12:ED 24:ED 32:VMC 64:VMC - and the crossing
scan runs per pair instead of per consecutive input, which is the right
structure for the finite-size-scaling fit (the pair crossing theta_c(N, rN)
drifts ~ 1/N toward theta_c(inf) at fixed ratio r).

where PATH is either a measure-driver log or an exact-diagonalization
grid JSON ({"thetas": [...], "U": {"<N>": [...]}}, produced by
utils.exact.litfi_binder_exact sweeps) — for a JSON input, LABEL must be
the size key to pull (errors are exact zeros).  Inputs may cover
different theta grids: the table shows the union, crossings are computed
per consecutive size pair over that pair's common grid.

Defaults to the committed round-3 FINAL measurement passes (latest
two-sided-converged checkpoint per theta, tempered fused estimator):
    32:logs/measure_stag_N32_final.log  64:logs/measure_stag_N64_final.log

Prints the combined U_N(theta) table and, for each size pair, every
sign change of U_big - U_small with a linearly interpolated crossing
estimate and propagated error.
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
def _logs(*names: str) -> list[str]:
    """Existing files among logs/<names>, in the given (chronological)
    order - later passes supersede earlier readings per theta."""
    paths = [os.path.join(REPO, "logs", n) for n in names]
    return [p for p in paths if os.path.exists(p)]


DEFAULT_INPUTS = [
    (label, paths)
    for label, paths in (
        ("32", _logs("measure_stag_N32_final.log")),
        # the targeted redo passes (r3k theta=1.1, r3l theta=0.9/1.1) come
        # after the full final pass so their tightened values win
        ("64", _logs(
            "measure_stag_N64_final.log",
            "measure_stag_N64_T11_redo.log",
            "measure_stag_N64_T11_redo2.log",
            "measure_stag_N64_T09_redo.log",
            "measure_stag_N64_T09_redo3.log",
            "measure_stag_N64_T09_V11_r3n.log",
        )),
        ("96", _logs(
            "measure_stag_N96_final.log",
            "measure_stag_N96_final2.log",
            "measure_stag_N96_final3.log",
        )),
        ("128", _logs("measure_stag_N128_final.log")),
    )
    if paths
]

_HDR = re.compile(r"=== theta=([\d.]+) ===")
_ROW = re.compile(
    r"# stag m1=([-\d.e]+) m2=([-\d.e]+) m4=([-\d.e]+) binder=([-\d.e]+)"
    r"(?: binder_err=([-\d.e]+))?"
)


def parse_log(path: str) -> dict[float, dict]:
    """{theta: {m1, m2, m4, U, err}} from a measure-driver log."""
    out: dict[float, dict] = {}
    theta = None
    for line in open(path):
        h = _HDR.search(line)
        if h:
            theta = float(h.group(1))
            continue
        m = _ROW.search(line)
        if m and theta is not None:
            m1, m2, m4, u = (float(g) for g in m.groups()[:4])
            err = float(m.group(5)) if m.group(5) else float("nan")
            out[theta] = {"m1": m1, "m2": m2, "m4": m4, "U": u, "err": err}
            theta = None
    return out


def parse_exact_json(path: str, size: str) -> dict[float, dict]:
    """{theta: {U, err=0}} for one size key of an ED-grid JSON."""
    import json

    with open(path) as f:
        grid = json.load(f)
    us = grid["U"][size]
    nan = float("nan")
    return {
        float(t): {"m1": nan, "m2": nan, "m4": nan, "U": u, "err": 0.0}
        for t, u in zip(grid["thetas"], us)
    }


def parse_input(label: str, path) -> dict[float, dict]:
    """One size's curve. ``path`` may be a list of log files (or a
    comma-joined string of them): parsed in order, later files supersede
    earlier readings per theta."""
    if isinstance(path, str) and "," in path:
        path = path.split(",")
    if isinstance(path, (list, tuple)):
        out: dict[float, dict] = {}
        for p in path:
            out.update(parse_input(label, p))
        return out
    if path.endswith(".json"):
        return parse_exact_json(path, label)
    return parse_log(path)


U_SATURATED = 0.66  # within ~1% of the fully-ordered 2/3 plateau


def crossings(thetas, ua, ub, ea, eb, direction=1, saturated=U_SATURATED):
    """Sign changes of D = ub - ua over the theta grid -> list of
    (theta_lo, theta_hi, theta_c, theta_c_err, status).  Status is
    "ok" only for the physical FSS crossing shape: D changes sign in
    the `direction` the observable dictates (+1: negative -> positive
    with increasing theta, the Binder cumulant - U shrinks with N in
    the disordered phase, grows with N in the ordered phase; -1 the
    reverse, e.g. the correlation ratio R which falls to 0 with N in
    the ordered phase; 0: no direction constraint) with both bracketing
    differences outside their own propagated 1-sigma errors, away from
    the saturated plateau.  Everything else is still reported, flagged:
    "not significant" (inside the error band, or non-finite errors),
    "wrong direction" (re-crossings from residual per-point convergence
    systematics), or "saturated" (all four bracketing values above
    `saturated` - for U, the 2/3 plateau where curve ordering is
    statistical noise; pass saturated=None to disable)."""
    found = []
    for i in range(1, len(thetas)):
        d0, d1 = ub[i - 1] - ua[i - 1], ub[i] - ua[i]
        if d0 == 0.0 or d0 * d1 >= 0:
            continue
        t0, t1 = thetas[i - 1], thetas[i]
        tc = t0 + (t1 - t0) * (-d0) / (d1 - d0)
        # propagate the jackknife errors of D at the bracketing points
        # through the linear interpolation
        s0 = (ea[i - 1] ** 2 + eb[i - 1] ** 2) ** 0.5
        s1 = (ea[i] ** 2 + eb[i] ** 2) ** 0.5
        slope = abs(d1 - d0) / (t1 - t0)
        terr = ((s0**2 + s1**2) / 2) ** 0.5 / max(slope, 1e-12)
        if not (abs(d0) > s0 and abs(d1) > s1):  # also catches NaN errors
            status = "not significant"
        elif direction != 0 and not (direction * d0 < 0.0 < direction * d1):
            status = "wrong direction"
        elif saturated is not None and min(ua[i - 1], ub[i - 1], ua[i], ub[i]) > saturated:
            status = "saturated"
        else:
            status = "ok"
        found.append((t0, t1, tc, terr, status))
    return found


def main():
    args = sys.argv[1:]
    pair_mode = "--pairs" in args
    args = [a for a in args if a != "--pairs"]
    inputs = DEFAULT_INPUTS
    if args:
        inputs = []
        for arg in args:
            label, path = arg.split(":", 1)
            inputs.append((label, path))
    if pair_mode and len(inputs) % 2 != 0:
        raise SystemExit("--pairs needs an even number of LABEL:PATH inputs")
    data = [(label, parse_input(label, path)) for label, path in inputs]
    for label, d in data:
        if not d:
            # a measurement pass may be mid-write (banner, no rows yet) -
            # drop the size rather than abort the whole table
            print(f"# note: no stag rows parsed for N={label}, skipped")
    data = [(label, d) for label, d in data if d]
    if not data:
        raise SystemExit("no stag rows parsed from any input")

    thetas = sorted(set.union(*(set(d) for _, d in data)))
    hdr = f"{'theta':>6}"
    for label, _ in data:
        hdr += f" {'m1(' + label + ')':>9} {'U(' + label + ')':>8} {'+/-':>8}"
    print(hdr)
    blank = f" {'-':>9} {'-':>8} {'-':>8}"
    for t in thetas:
        row = f"{t:6.3f}"
        for _, d in data:
            r = d.get(t)
            row += f" {r['m1']:9.4f} {r['U']:8.4f} {r['err']:8.1e}" if r else blank
        print(row)

    pair_crossings = []  # (N_small, theta_c, err) of significant crossings
    if pair_mode:
        pair_indices = [(i, i + 1) for i in range(0, len(data), 2)]
    else:
        pair_indices = [(i, i + 1) for i in range(len(data) - 1)]
    for i, j in pair_indices:
        (la, da), (lb, db) = data[i], data[j]
        common = sorted(set(da) & set(db))
        if len(common) < 2:
            print(f"# <2 common thetas for the ({la}, {lb}) pair - no crossing scan")
            continue
        ua = [da[t]["U"] for t in common]
        ub = [db[t]["U"] for t in common]
        ea = [da[t]["err"] for t in common]
        eb = [db[t]["err"] for t in common]
        found = crossings(common, ua, ub, ea, eb)
        if not found:
            print(f"# no U({lb})-U({la}) crossing inside the grid")
        for t0, t1, tc, terr, status in found:
            note = "" if status == "ok" else f"  [{status} - excluded from FSS]"
            print(
                f"# U({lb}) x U({la}) crossing in ({t0}, {t1}): "
                f"theta_c ~ {tc:.4f} +/- {terr:.4f}{note}"
            )
            if status == "ok":
                pair_crossings.append((float(la), tc, terr))

    # Finite-size-scaling extrapolation: the pair crossing theta_c(N, 2N)
    # drifts as theta_c(N) = theta_c(inf) + a/N to leading order; with two
    # or more significant pair crossings, fit U-weighted least squares in
    # x = 1/N_small and report the intercept.
    if len(pair_crossings) >= 2 and len({n for n, _, _ in pair_crossings}) >= 2:
        # (>= 2 distinct sizes: multiple crossings of ONE pair - e.g.
        # statistical sign flips where both curves ride the U = 2/3
        # plateau - share an x and cannot constrain a drift line)
        xs = [1.0 / n for n, _, _ in pair_crossings]
        ys = [tc for _, tc, _ in pair_crossings]
        ws = [1.0 / max(e, 1e-4) ** 2 for _, _, e in pair_crossings]
        sw = sum(ws)
        mx = sum(w * x for w, x in zip(ws, xs)) / sw
        my = sum(w * y for w, y in zip(ws, ys)) / sw
        sxx = sum(w * (x - mx) ** 2 for w, x in zip(ws, xs))
        a = sum(w * (x - mx) * (y - my) for w, x, y in zip(ws, xs, ys)) / sxx
        b = my - a * mx
        berr = (1.0 / sw + mx**2 / sxx) ** 0.5
        print(
            f"# FSS extrapolation over {len(pair_crossings)} pair crossings: "
            f"theta_c(inf) ~ {b:.4f} +/- {berr:.4f}  (drift slope a={a:.3f})"
        )
        print(
            "# (errors here are jackknife-only; scripts/binder_fss_final.py "
            "folds in two-sided convergence systematics and the ED pairs)"
        )


if __name__ == "__main__":
    main()
