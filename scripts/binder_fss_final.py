"""Final Binder finite-size-scaling analysis: one theta_c with error bars.

Combines
  (a) the VMC two-sided convergence campaign (scripts/binder_assemble.py
      over the campaign logs): U(L, theta) = midpoint of the
      below/above-annealed converged values, error = halfspread
      (systematic) - for L in {32, 64, 96, 128} where trained;
  (b) the exact-diagonalization fine grids (logs/binder_exact_fine_*.json)
      for the fixed-ratio pairs (8,16), (10,20), (12,24);
computes every fixed-ratio-2 pair crossing with propagated errors
(examples.binder_crossing.crossings), and fits the 1/N drift
theta_c(N) = theta_c(inf) + a/N weighted by each crossing's error.

Usage: python scripts/binder_fss_final.py [-json OUT.json]
(campaign logs are discovered in chronological order; missing inputs are
skipped with a note, so the script runs on partial campaign state.)
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from examples.binder_crossing import crossings, parse_exact_json  # noqa: E402
from scripts.binder_assemble import assemble, parse_logs  # noqa: E402

LOGS = os.path.join(REPO, "logs")
# chronological (later blocks supersede earlier ones)
CAMPAIGN_LOGS = [
    "converge_r3.log",
    "binder_campaign_r3b.log",
    "binder_campaign_r3c.log",
    "binder_campaign_r3e.log",
    "binder_campaign_r3g.log",
    "binder_campaign_r3j.log",
    "binder_n96_r3h.log",
    "binder_n128_r3i.log",
    "r3l_queue.log",
    "r3m_queue.log",
    "r3n_queue.log",
    "r3o_queue.log",
    "r3q_queue.log",
    "r4_n128_queue.log",
    "r5_n128_queue.log",
    "r5c_points.log",
    "r5d_points.log",
]
ED_PAIRS = [(8, 16), (10, 20), (12, 24)]
# realizable pairs over the trained sizes {32, 64, 96, 128}; (64, 96) and
# (96, 128) are not fixed-ratio-2 like the ED pairs, but every pair
# crossing is still a consistent finite-size theta_c estimate and the
# drift fit is error-weighted (the near-exact ED crossings pin the
# intercept; the VMC crossings are the NQS-machinery demonstration)
VMC_PAIRS = [(32, 64), (64, 96), (64, 128), (96, 128)]


def vmc_table() -> dict:
    paths = [os.path.join(LOGS, p) for p in CAMPAIGN_LOGS]
    found = [p for p in paths if os.path.exists(p)]
    for p in set(paths) - set(found):
        print(f"# note: campaign log missing, skipped: {os.path.basename(p)}")
    return assemble(parse_logs(found))


def pair_crossing(thetas, ua, ub, ea, eb, direction=1, saturated=None):
    """Physical ("ok") crossings only; returns (tc, err) or None.

    direction follows examples.binder_crossing.crossings (+1 Binder U,
    -1 correlation ratio R). The Binder callers here pass saturated=None
    because the two-sided table already folds convergence systematics
    into the per-point errors (a plateau re-crossing shows up as
    not-significant instead)."""
    all_found = crossings(thetas, ua, ub, ea, eb, direction=direction, saturated=saturated)
    found = [c for c in all_found if c[4] == "ok"]
    if not found:
        # fall back to any right-direction crossing, flagged by a widened error
        found = [
            (t0, t1, tc, max(terr, (t1 - t0) / 2), s)
            for t0, t1, tc, terr, s in all_found
            if s != "wrong direction"
        ]
    if not found:
        return None
    t0, t1, tc, terr, _ = found[0]
    return tc, terr


def drift_fit(points) -> tuple[float, float, float, float, float]:
    """Error-weighted linear fit theta_c(N) = theta_c(inf) + a/N_small over
    (n_small, n_big, tc, err, source) crossings.

    Returns (theta_c_inf, err, slope, chi2/dof, err_scale). The leading 1/N
    drift is a model: the near-exact ED crossings scatter about it by more
    than their formal (floored-at-1e-4) errors, i.e. higher-order
    corrections are resolved. The parameter error is therefore inflated by
    sqrt(chi2/dof) (the standard scale-factor treatment) so the quoted
    theta_c error covers that systematic, not just the input noise."""
    xs = [1.0 / ns for ns, _, _, _, _ in points]
    ys = [tc for _, _, tc, _, _ in points]
    ws = [1.0 / max(e, 1e-4) ** 2 for _, _, _, e, _ in points]
    sw = sum(ws)
    mx = sum(w * x for w, x in zip(ws, xs)) / sw
    my = sum(w * y for w, y in zip(ws, ys)) / sw
    sxx = sum(w * (x - mx) ** 2 for w, x in zip(ws, xs))
    a = sum(w * (x - mx) * (y - my) for w, x, y in zip(ws, xs, ys)) / sxx
    b = my - a * mx
    berr = (1.0 / sw + mx**2 / sxx) ** 0.5
    dof = len(points) - 2
    chi2 = sum(w * (y - (b + a * x)) ** 2 for w, x, y in zip(ws, xs, ys))
    chi2_dof = chi2 / dof if dof > 0 else float("nan")
    scale = max(1.0, chi2_dof**0.5) if dof > 0 else 1.0
    return b, berr * scale, a, chi2_dof, scale


def drift_fit2(points) -> tuple[float, float, float, float, float, float]:
    """Two-correction drift fit theta_c(N) = theta_c(inf) + a/N + b/N^2.

    The ED pair crossings are numerically exact (errors are grid-floored
    at 1e-4), so the pure-1/N model's huge chi2 (~1e3/dof) measures a real
    higher-order correction, not noise. Adding the 1/N^2 term absorbs it.
    Weighted normal equations on the 3-parameter linear model; parameter
    error from the covariance diagonal, inflated by sqrt(chi2/dof) like
    drift_fit. Returns (theta_c_inf, err, a, b, chi2/dof, err_scale);
    falls back to drift_fit when fewer than 4 points."""
    if len(points) < 4:
        b0, berr, a, chi2_dof, scale = drift_fit(points)
        return b0, berr, a, 0.0, chi2_dof, scale
    ws = [1.0 / max(e, 1e-4) ** 2 for _, _, _, e, _ in points]
    xs = [1.0 / ns for ns, _, _, _, _ in points]
    ys = [tc for _, _, tc, _, _ in points]
    # design matrix columns: [1, x, x^2]
    import numpy as _np

    A = _np.array([[1.0, x, x * x] for x in xs])
    W = _np.diag(ws)
    ata = A.T @ W @ A
    atb = A.T @ W @ _np.array(ys)
    coef = _np.linalg.solve(ata, atb)
    cov = _np.linalg.inv(ata)
    resid = _np.array(ys) - A @ coef
    chi2 = float(resid @ W @ resid)
    dof = len(points) - 3
    chi2_dof = chi2 / dof if dof > 0 else float("nan")
    scale = max(1.0, chi2_dof**0.5) if dof > 0 else 1.0
    return (
        float(coef[0]),
        float(cov[0, 0] ** 0.5) * scale,
        float(coef[1]),
        float(coef[2]),
        chi2_dof,
        scale,
    )


def drift_fit_power(points) -> tuple[float, float, float, float, float, float]:
    """Free-exponent drift fit theta_c(N) = theta_c(inf) + a * N_small^-omega.

    omega is scanned over [0.25, 3.0] (step 0.005); at each omega the
    problem is the weighted LINEAR fit of drift_fit with x = N^-omega, so
    the scan picks the global chi2 minimum without a nonlinear solver.
    Returns (theta_c_inf, err, slope, omega, chi2/dof, err_scale) with the
    same sqrt(chi2/dof) error inflation as drift_fit; dof = n - 3 because
    omega is fitted. Falls back to omega = 1 when n < 4 (dof would be < 1).
    """
    if len(points) < 4:
        b, berr, a, chi2_dof, scale = drift_fit(points)
        return b, berr, a, 1.0, chi2_dof, scale

    ys = [tc for _, _, tc, _, _ in points]
    ws = [1.0 / max(e, 1e-4) ** 2 for _, _, _, e, _ in points]
    ns_ = [ns for ns, _, _, _, _ in points]
    sw = sum(ws)

    def linfit(omega: float):
        xs = [n ** -omega for n in ns_]
        mx = sum(w * x for w, x in zip(ws, xs)) / sw
        my = sum(w * y for w, y in zip(ws, ys)) / sw
        sxx = sum(w * (x - mx) ** 2 for w, x in zip(ws, xs))
        a = sum(w * (x - mx) * (y - my) for w, x, y in zip(ws, xs, ys)) / sxx
        b = my - a * mx
        chi2 = sum(w * (y - (b + a * x)) ** 2 for w, x, y in zip(ws, xs, ys))
        berr = (1.0 / sw + mx**2 / sxx) ** 0.5
        return chi2, b, berr, a

    best = None
    omega = 0.25
    while omega <= 3.0 + 1e-12:
        fit = linfit(omega)
        if best is None or fit[0] < best[0][0]:
            best = (fit, omega)
        omega += 0.005
    (chi2, b, berr, a), omega = best
    dof = len(points) - 3
    chi2_dof = chi2 / dof if dof > 0 else float("nan")
    scale = max(1.0, chi2_dof**0.5) if dof > 0 else 1.0
    return b, berr * scale, a, omega, chi2_dof, scale


def ed_curves() -> dict:
    """{N: {theta: U}} from the exact fine-grid JSONs (both pair members)."""
    out: dict = {}
    for ns, nb in ED_PAIRS:
        path = os.path.join(LOGS, f"binder_exact_fine_{ns}_{nb}.json")
        if not os.path.exists(path):
            continue
        for n in (ns, nb):
            d = parse_exact_json(path, str(n))
            out[n] = {t: e["U"] for t, e in d.items() if e["U"] is not None}
    return out


def pair_bracket(theta, u_small, u_big, e_small, e_big, direction=1):
    """One-common-theta size-ordering bracket: no crossing can be
    interpolated, but the sign of D = U_big - U_small at that theta still
    localizes theta_c. For the Binder cumulant (direction=+1) U grows with
    N in the ordered phase, so D < 0 => theta < theta_c (crossing above
    theta) and D > 0 => theta_c below; the correlation ratio flips
    (direction=-1). Returns (side, significance) with side in
    {"above", "below"} meaning where theta_c sits relative to theta."""
    d = (u_big - u_small) * direction
    err = (e_small**2 + e_big**2) ** 0.5
    side = "above" if d < 0 else "below"
    return side, abs(d) / max(err, 1e-12)


def window_bracket(common, u_small, u_big, e_small, e_big, direction=1):
    """No-sign-change window exclusion over >=2 common thetas: when
    D = (U_big - U_small) * direction keeps one sign across the whole
    scanned window no crossing can be interpolated, but theta_c is still
    localized OUTSIDE the window - above max(theta) when D < 0 everywhere
    (same sign convention as pair_bracket), below min(theta) when D > 0.
    Returns (theta_edge, side, nsigma at that edge), or None on mixed
    signs (a crossing exists; pair_crossing handles it)."""
    ds = [(u_big[i] - u_small[i]) * direction for i in range(len(common))]
    # sign test tolerating exact ties (duplicate-valued readings give d = 0,
    # which is consistent with EITHER one-sided ordering): the window keeps
    # one sign when every non-zero d agrees and at least one is strict
    if all(d <= 0 for d in ds) and any(d < 0 for d in ds):
        i, side = len(common) - 1, "above"
    elif all(d >= 0 for d in ds) and any(d > 0 for d in ds):
        i, side = 0, "below"
    else:
        return None
    err = (e_small[i] ** 2 + e_big[i] ** 2) ** 0.5
    return common[i], side, abs(ds[i]) / max(err, 1e-12)


def collect_points(verbose: bool = True):
    """Assemble every fixed-pair crossing from ED fine grids + the VMC
    two-sided campaign table.

    Returns (points, table, brackets) with points = [(n_small, n_big, tc,
    err, source)], table = the assembled VMC {(L, theta): {u, err,
    status}}, and brackets = [(n_small, n_big, theta, side, nsigma,
    source)] for pairs with exactly one common theta (the trimmed-session
    N=128 points land here until a second theta is trained).
    """
    points = []  # (n_small, n_big, tc, err, source)
    brackets = []  # (n_small, n_big, theta, side, nsigma, source)

    for ns, nb in ED_PAIRS:
        path = os.path.join(LOGS, f"binder_exact_fine_{ns}_{nb}.json")
        if not os.path.exists(path):
            if verbose:
                print(f"# note: missing {os.path.basename(path)}")
            continue
        da = parse_exact_json(path, str(ns))
        db = parse_exact_json(path, str(nb))
        common = sorted(t for t in set(da) & set(db) if da[t]["U"] is not None and db[t]["U"] is not None)
        if len(common) < 2:
            if verbose:
                print(f"# note: ED pair ({ns},{nb}) incomplete ({len(common)} common thetas)")
            continue
        c = pair_crossing(
            common,
            [da[t]["U"] for t in common],
            [db[t]["U"] for t in common],
            [0.0] * len(common),
            [0.0] * len(common),
        )
        if c:
            points.append((ns, nb, c[0], c[1], "ED"))

    table = vmc_table()
    sizes = sorted({ell for (ell, _t) in table})
    if verbose:
        print("# VMC two-sided table:")
        for (ell, theta), e in sorted(table.items()):
            print(f"#   L={ell} theta={theta}: U={e['u']:.4f} +/- {e['err']:.4f} [{e['status']}]")
    for ns, nb in VMC_PAIRS:
        if ns not in sizes or nb not in sizes:
            continue
        common = sorted(t for t in {th for (l2, th) in table if l2 == ns} & {th for (l2, th) in table if l2 == nb})
        if len(common) < 1:
            if verbose:
                print(f"# note: VMC pair ({ns},{nb}): no common thetas")
            continue
        ea = [table[(ns, t)]["err"] for t in common]
        eb = [table[(nb, t)]["err"] for t in common]
        # one-sided points have err=nan; treat as a loose 0.02 systematic
        ea = [0.02 if e != e else e for e in ea]
        eb = [0.02 if e != e else e for e in eb]
        if len(common) == 1:
            t = common[0]
            side, nsig = pair_bracket(t, table[(ns, t)]["u"], table[(nb, t)]["u"], ea[0], eb[0])
            brackets.append((ns, nb, t, side, nsig, "VMC"))
            if verbose:
                print(
                    f"# note: VMC pair ({ns},{nb}): one common theta -> "
                    f"bracket theta_c {side} {t} ({nsig:.1f} sigma)"
                )
            continue
        ua = [table[(ns, t)]["u"] for t in common]
        ub = [table[(nb, t)]["u"] for t in common]
        c = pair_crossing(common, ua, ub, ea, eb)
        if c:
            points.append((ns, nb, c[0], c[1], "VMC"))
        else:
            w = window_bracket(common, ua, ub, ea, eb)
            if w:
                t, side, nsig = w
                brackets.append((ns, nb, t, side, nsig, "VMC"))
                if verbose:
                    print(
                        f"# note: VMC pair ({ns},{nb}): no crossing in "
                        f"[{common[0]}, {common[-1]}] -> theta_c {side} {t} ({nsig:.1f} sigma)"
                    )
    return points, table, brackets


R_LOG_SIZES = [32, 64, 96, 128]


def parse_corrratio_log(path: str) -> dict[float, tuple[float, float]]:
    """logs/corrratio_N{L}.log (scripts/corrratio_measure.sh output) ->
    {theta: (R, R_err)}, keeping the last reading per theta block."""
    out: dict[float, tuple[float, float]] = {}
    theta = None
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("=== theta="):
                theta = float(line.split("theta=")[1].split()[0])
            elif line.startswith("# corrratio R=") and theta is not None:
                toks = dict(tok.split("=", 1) for tok in line[2:].split() if "=" in tok)
                out[theta] = (float(toks["R"]), float(toks["R_err"]))
    return out


def vmc_corrratio_points(
    verbose: bool = True,
) -> tuple[
    list[tuple[int, int, float, float, str]],
    list[tuple[int, int, float, str, float, str]],
]:
    """Correlation-ratio pair crossings from the VMC measurement passes.

    R_N(theta) = S(pi + 2pi/N)/S(pi) crosses at theta_c exactly like the
    Binder cumulant (it is the other standard dimensionless FSS
    observable), so the same interpolated sign-change scan applies. These
    extend the ED-R drift fit from the exact sizes (<= 24) to the NQS
    sizes, entirely independent of the Binder moments.

    Returns (points, brackets) like collect_points: interpolated crossings
    plus one-common-theta / no-sign-change size-ordering brackets."""
    tables: dict[int, dict[float, tuple[float, float]]] = {}
    for n in R_LOG_SIZES:
        path = os.path.join(LOGS, f"corrratio_N{n}.log")
        if os.path.exists(path):
            d = parse_corrratio_log(path)
            # one theta is enough for a size-ordering bracket (the
            # trimmed N=128 session measured only the window center)
            if len(d) >= 1:
                tables[n] = d
    pts = []
    brackets = []
    for ns, nb in VMC_PAIRS:
        if ns not in tables or nb not in tables:
            continue
        common = sorted(set(tables[ns]) & set(tables[nb]))
        if len(common) < 1:
            continue
        if len(common) == 1:
            t = common[0]
            side, nsig = pair_bracket(
                t, tables[ns][t][0], tables[nb][t][0], tables[ns][t][1], tables[nb][t][1], direction=-1
            )
            brackets.append((ns, nb, t, side, nsig, "VMC-R"))
            if verbose:
                print(
                    f"# note: corr-ratio VMC pair ({ns},{nb}): one common theta -> "
                    f"bracket theta_c {side} {t} ({nsig:.1f} sigma)"
                )
            continue
        ra = [tables[ns][t][0] for t in common]
        rb = [tables[nb][t][0] for t in common]
        rea = [tables[ns][t][1] for t in common]
        reb = [tables[nb][t][1] for t in common]
        # R falls with N in the ordered phase: D flips + -> -
        c = pair_crossing(common, ra, rb, rea, reb, direction=-1)
        if c:
            pts.append((ns, nb, c[0], c[1], "VMC-R"))
        else:
            w = window_bracket(common, ra, rb, rea, reb, direction=-1)
            if w:
                t, side, nsig = w
                brackets.append((ns, nb, t, side, nsig, "VMC-R"))
                if verbose:
                    print(
                        f"# note: corr-ratio VMC pair ({ns},{nb}): no crossing in "
                        f"[{common[0]}, {common[-1]}] -> theta_c {side} {t} ({nsig:.1f} sigma)"
                    )
    return pts, brackets


def main() -> None:
    json_out = None
    args = sys.argv[1:]
    if "-json" in args:
        json_out = args[args.index("-json") + 1]

    points, _table, u_brackets = collect_points()
    if not points:
        raise SystemExit("no pair crossings available yet")

    print(f"\n{'pair':>10} {'theta_c':>9} {'+/-':>8}  source")
    for ns, nb, tc, terr, src in points:
        print(f"({ns:3d},{nb:3d}) {tc:9.4f} {terr:8.4f}  {src}")

    b, berr, a, chi2_dof, scale = drift_fit(points)
    print(
        f"\n# FSS fit over {len(points)} pair crossings: "
        f"theta_c(inf) = {b:.4f} +/- {berr:.4f} (drift slope a = {a:.3f}, "
        f"chi2/dof = {chi2_dof:.1f}, err scale x{scale:.1f})"
    )
    bp, bperr, ap, omega, chi2p, scalep = drift_fit_power(points)
    print(
        f"# free-exponent fit: theta_c(inf) = {bp:.4f} +/- {bperr:.4f} "
        f"(a = {ap:.3f}, omega = {omega:.2f}, chi2/dof = {chi2p:.1f}, "
        f"err scale x{scalep:.1f})"
    )
    b2, b2err, a2, c2, chi22, scale2 = drift_fit2(points)
    print(
        f"# two-correction fit (1/N + 1/N^2): theta_c(inf) = {b2:.4f} +/- "
        f"{b2err:.4f} (a = {a2:.3f}, b = {c2:.1f}, chi2/dof = {chi22:.1f}, "
        f"err scale x{scale2:.1f})"
    )

    # Independent observable: exact correlation-ratio crossings R_N(theta)
    # (scripts/corrratio_exact.py grids). Same drift model, separate fit -
    # agreement between theta_c^U and theta_c^R is the consistency check.
    from scripts.corrratio_exact import DEFAULT_PAIRS as R_PAIRS
    from scripts.corrratio_exact import analyze as r_analyze

    r_points = [(ns, nb, tc, err, "ED-R") for ns, nb, tc, err in r_analyze(R_PAIRS, verbose=False)]
    r_vmc, r_brackets = vmc_corrratio_points()
    r_points += r_vmc

    all_brackets = u_brackets + r_brackets
    if all_brackets:
        print("\n# size-ordering brackets (one-theta pairs + no-crossing windows):")
        for ns, nb, t, side, nsig, src in all_brackets:
            print(f"#   ({ns},{nb}) [{src}]: theta_c {side} {t} ({nsig:.1f} sigma)")
    r_fit = None
    if r_points:
        print(f"\n{'pair':>10} {'theta_c':>9} {'+/-':>8}  source")
        for ns, nb, tc, terr, src in r_points:
            print(f"({ns:3d},{nb:3d}) {tc:9.4f} {terr:8.4f}  {src}")
        if len(r_points) >= 3:
            rb, rberr, ra, rchi2, rscale = drift_fit(r_points)
            r_fit = {"theta_c_inf": rb, "theta_c_inf_err": rberr, "slope": ra, "chi2_dof": rchi2}
            print(
                f"# corr-ratio FSS fit over {len(r_points)} crossings: "
                f"theta_c(inf) = {rb:.4f} +/- {rberr:.4f} (a = {ra:.3f}, "
                f"chi2/dof = {rchi2:.1f}, err scale x{rscale:.1f})"
            )
        else:
            print("# corr-ratio: <3 crossings, drift fit skipped (crossing values above)")

    if json_out:
        with open(json_out, "w") as f:
            json.dump(
                {
                    "pair_crossings": [
                        {"n_small": ns, "n_big": nb, "theta_c": tc, "err": terr, "source": src}
                        for ns, nb, tc, terr, src in points
                    ],
                    "theta_c_inf": b,
                    "theta_c_inf_err": berr,
                    "drift_slope": a,
                    "power_fit": {
                        "theta_c_inf": bp,
                        "theta_c_inf_err": bperr,
                        "slope": ap,
                        "omega": omega,
                        "chi2_dof": chi2p,
                    },
                    "two_correction_fit": {
                        "theta_c_inf": b2,
                        "theta_c_inf_err": b2err,
                        "a": a2,
                        "b": c2,
                        "chi2_dof": chi22,
                    },
                    "corrratio_crossings": [
                        {"n_small": ns, "n_big": nb, "theta_c": tc, "err": terr}
                        for ns, nb, tc, terr, _src in r_points
                    ],
                    "corrratio_fit": r_fit,
                    "brackets": [
                        {
                            "n_small": ns,
                            "n_big": nb,
                            "theta": t,
                            "theta_c_side": side,
                            "nsigma": nsig,
                            "source": src,
                        }
                        for ns, nb, t, side, nsig, src in all_brackets
                    ],
                },
                f,
                indent=1,
            )
        print(f"wrote {json_out}")


if __name__ == "__main__":
    main()
