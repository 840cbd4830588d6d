"""Render the Binder finite-size-scaling figure (two panels, PNG).

Panel (a): U_N(theta) curves - ED fine grids (N = 8..24, exact) and the
VMC two-sided campaign values (N = 32..128, error bars = convergence
halfspread) - the curves cross near theta_c.
Panel (b): every fixed-pair crossing theta_c(N) vs 1/N_small with the
error-weighted 1/N drift fit and the free-exponent fit from
scripts/binder_fss_final.py; the extrapolated theta_c(inf) sits on the
1/N = 0 axis with its (scale-factor-inflated) error band.

Runs on partial campaign state (same input discovery as binder_fss_final).

Usage: python scripts/binder_fss_figure.py [-out docs/figures/binder_fss.png]
"""

from __future__ import annotations

import os
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scripts.binder_fss_final import (  # noqa: E402
    collect_points,
    drift_fit,
    drift_fit_power,
    ed_curves,
)

# validated light-mode palette (ordinal blue ramp steps 250..700 for the
# ordered system-size series; categorical slots 1/2 for ED-vs-VMC identity)
ORDINAL = ["#86b6ef", "#6da7ec", "#5598e7", "#3987e5", "#2a78d6",
           "#256abf", "#1c5cab", "#184f95", "#104281", "#0d366b"]
BLUE, ORANGE = "#2a78d6", "#eb6834"
SURFACE, INK, INK2, GRID = "#fcfcfb", "#0b0b0b", "#52514e", "#e7e6e2"


def style_axis(ax):
    ax.set_facecolor(SURFACE)
    for side in ("top", "right"):
        ax.spines[side].set_visible(False)
    for side in ("left", "bottom"):
        ax.spines[side].set_color(GRID)
    ax.tick_params(colors=INK2, labelsize=8)
    ax.grid(True, color=GRID, linewidth=0.6)
    ax.set_axisbelow(True)


def main() -> None:
    out = os.path.join(REPO, "docs", "figures", "binder_fss.png")
    args = sys.argv[1:]
    if "-out" in args:
        out = args[args.index("-out") + 1]

    points, table, _brackets = collect_points(verbose=False)
    if not points:
        raise SystemExit("no pair crossings available yet")
    curves = ed_curves()
    vmc_sizes = sorted({ell for (ell, _t) in table})
    sizes = sorted(curves) + vmc_sizes
    color = {n: ORDINAL[round(i * (len(ORDINAL) - 1) / max(len(sizes) - 1, 1))]
             for i, n in enumerate(sizes)}

    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(10.6, 4.2), dpi=200)
    fig.patch.set_facecolor(SURFACE)

    # ---- panel (a): U_N(theta) ----
    for n in sorted(curves):
        ts = sorted(curves[n])
        ax1.plot(ts, [curves[n][t] for t in ts], color=color[n], lw=1.4,
                 label=f"N={n} (ED)", zorder=2)
    for n in vmc_sizes:
        ts = sorted(t for (ell, t) in table if ell == n)
        us = [table[(n, t)]["u"] for t in ts]
        es = [table[(n, t)]["err"] for t in ts]
        es = [0.02 if e != e else e for e in es]  # one-sided -> loose syst.
        ax1.errorbar(ts, us, yerr=es, color=color[n], lw=1.8, marker="o",
                     ms=4.5, mfc=color[n], mec=SURFACE, mew=0.8, capsize=2,
                     elinewidth=1.0, label=f"N={n} (VMC)", zorder=3)
    ax1.axhline(2 / 3, color=INK2, lw=0.8, ls=":", zorder=1)
    ax1.annotate("U = 2/3 (ordered)", xy=(0.64, 2 / 3 + 0.012),
                 xycoords=("axes fraction", "data"), fontsize=7.5,
                 color=INK2)
    ax1.set_xlabel(r"$\theta$   ($J=\sin\theta$, $h=-\cos\theta$)",
                   fontsize=9, color=INK)
    ax1.set_ylabel(r"Binder cumulant  $U_N = 1 - m_4/3m_2^2$", fontsize=9,
                   color=INK)
    ax1.set_title("(a) Binder curves cross at the QPT", fontsize=10,
                  color=INK, loc="left")
    ax1.legend(fontsize=7, frameon=False, ncol=2, loc="upper left",
               labelcolor=INK2)
    style_axis(ax1)

    # ---- panel (b): crossing drift + extrapolation ----
    b, berr, a, chi2_dof, scale = drift_fit(points)
    bp, bperr, ap, omega, chi2p, scalep = drift_fit_power(points)
    for src, col, mk in (("ED", BLUE, "o"), ("VMC", ORANGE, "s")):
        pts = [(1.0 / ns, tc, err) for ns, _nb, tc, err, s in points if s == src]
        if not pts:
            continue
        xs, ys, es = zip(*pts)
        ax2.errorbar(xs, ys, yerr=es, color=col, marker=mk, ms=5.5, ls="none",
                     mec=SURFACE, mew=0.8, capsize=2.5, elinewidth=1.2,
                     label=f"{src} pair crossings (Binder U)", zorder=3)
    # correlation-ratio crossings (independent observable, same drift axis)
    from scripts.corrratio_exact import DEFAULT_PAIRS, analyze as r_analyze

    r_points = r_analyze(DEFAULT_PAIRS, verbose=False)
    if r_points:
        xs = [1.0 / ns for ns, _nb, _tc, _e in r_points]
        ys = [tc for _ns, _nb, tc, _e in r_points]
        es = [e for *_rest, e in r_points]
        ax2.errorbar(xs, ys, yerr=es, color=BLUE, marker="^", ms=6, ls="none",
                     mfc=SURFACE, mec=BLUE, mew=1.2, capsize=2.5,
                     elinewidth=1.0, label="ED crossings (corr. ratio R)",
                     zorder=3)
    from scripts.binder_fss_final import vmc_corrratio_points

    rv_points, _rv_brackets = vmc_corrratio_points(verbose=False)
    if rv_points:
        xs = [1.0 / ns for ns, _nb, _tc, _e, _s in rv_points]
        ys = [tc for _ns, _nb, tc, _e, _s in rv_points]
        es = [e for _ns, _nb, _tc, e, _s in rv_points]
        ax2.errorbar(xs, ys, yerr=es, color=ORANGE, marker="^", ms=6,
                     ls="none", mfc=SURFACE, mec=ORANGE, mew=1.2, capsize=2.5,
                     elinewidth=1.0, label="VMC crossings (corr. ratio R)",
                     zorder=3)
    xmax = max(1.0 / ns for ns, *_ in points) * 1.12
    xs_fit = [i * xmax / 200 for i in range(201)]
    ax2.plot(xs_fit, [b + a * x for x in xs_fit], color=INK2, lw=1.6,
             label=rf"$1/N$ fit: $\theta_c = {b:.3f} \pm {berr:.3f}$",
             zorder=2)
    ax2.plot(xs_fit, [bp + ap * x**omega for x in xs_fit], color=INK2,
             lw=1.4, ls="--",
             label=rf"$N^{{-\omega}}$ fit ($\omega={omega:.2f}$): "
                   rf"${bp:.3f} \pm {bperr:.3f}$", zorder=2)
    ax2.axvline(0.0, color=GRID, lw=1.0)
    ax2.axhspan(b - berr, b + berr, xmax=0.06, color=INK2, alpha=0.25,
                zorder=1)
    ax2.set_xlim(-0.006, xmax)
    ax2.set_xlabel(r"$1/N_\mathrm{small}$ of the crossing pair", fontsize=9,
                   color=INK)
    ax2.set_ylabel(r"pair crossing  $\theta_c(N)$", fontsize=9, color=INK)
    ax2.set_title("(b) Finite-size drift of the crossing", fontsize=10,
                  color=INK, loc="left")
    ax2.legend(fontsize=7, frameon=False, loc="lower right", labelcolor=INK2)
    style_axis(ax2)

    fig.suptitle(
        "Long-range AFM Ising chain: Binder-cumulant finite-size scaling "
        r"($\alpha_J = 2.5$)", fontsize=11, color=INK, x=0.01, ha="left")
    fig.tight_layout(rect=(0, 0, 1, 0.94))
    os.makedirs(os.path.dirname(out), exist_ok=True)
    fig.savefig(out, facecolor=SURFACE)
    print(f"wrote {out}  ({len(points)} crossings; "
          f"linear theta_c = {b:.4f} +/- {berr:.4f}, chi2/dof = {chi2_dof:.1f}; "
          f"power omega = {omega:.2f}, theta_c = {bp:.4f} +/- {bperr:.4f})")


if __name__ == "__main__":
    main()
