"""Render the entanglement-profile figure: S2(l') from the increment runs.

One panel: the Renyi-2 profile S2(l') for the trained N=64 V9 states at a
few theta, from the increment-trick estimator (RESULTS 6e) - near the
critical point the profile follows the periodic-chain Calabrese-Cardy
form S2(l) = (c/4) ln[(N/pi) sin(pi l/N)] + const (overlaid fit from
scripts/central_charge_fit.py), while deep in the ordered phase it is
FLAT: all the entanglement is the single shared Neel-sector qubit.

theta values are encoded as an ordered (sequential) blue ramp - theta
orders the phases - with direct labels at the line ends in addition to
the legend, so identity never rides on color alone.

Inputs: logs/r3n_queue.log (sectioned renyi_inc runs, seed 21 used) and,
when present, logs/renyi_profile_N64_T09.log (the heavy theta=0.9 run)
which supersedes the light theta=0.9 section.

Usage: python scripts/renyi_profile_figure.py [-out docs/figures/renyi_profile.png]
"""

from __future__ import annotations

import math
import os
import re
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scripts.central_charge_fit import PROF, fit_c, parse  # noqa: E402

LOGS = os.path.join(REPO, "logs")
HEADER = re.compile(r"renyi_inc N=(\d+) theta=([\d.]+) .*seed=(\d+)")
BASE = re.compile(r"base: -ln q_1 = ([\d.]+) \+/- ([\d.eE+-]+)")
LEVEL_FULL = re.compile(
    r"level\s+(\d+): ln\(q_\d+/q_\d+\) = ([+-]?[\d.]+) \+/- ([\d.eE+-]+)"
)

# validated light-mode palette (same constants as binder_fss_figure.py);
# theta series use ordinal ramp steps - a sequential encoding of theta
ORDINAL = ["#86b6ef", "#5598e7", "#2a78d6", "#184f95", "#0d366b"]
SURFACE, INK, INK2, GRID = "#fcfcfb", "#0b0b0b", "#52514e", "#e7e6e2"


def parse_sections(path: str) -> dict:
    """{(theta, seed): {"base": (v, e) | None, "inc": {j: (v, e)},
    "prof": {l: (v, e)}}} from a multi-run queue log."""
    out: dict = {}
    cur = None
    for line in open(path):
        m = HEADER.search(line)
        if m:
            cur = {"base": None, "inc": {}, "prof": {}}
            out[(float(m.group(2)), int(m.group(3)))] = cur
            continue
        if cur is None:
            continue
        m = BASE.search(line)
        if m:
            cur["base"] = (float(m.group(1)), float(m.group(2)))
            continue
        m = LEVEL_FULL.search(line)
        if m:
            cur["inc"][int(m.group(1))] = (float(m.group(2)), float(m.group(3)))
        m = PROF.search(line)
        if m:
            cur["prof"][int(m.group(1))] = (float(m.group(2)), float(m.group(3)))
    return out


def main() -> None:
    out_png = os.path.join(REPO, "docs", "figures", "renyi_profile.png")
    for a in sys.argv[1:]:
        if a.startswith("-out"):
            out_png = a.split("=", 1)[1] if "=" in a else a[4:].lstrip("=")

    n = 64
    sections = parse_sections(os.path.join(LOGS, "r3n_queue.log"))
    thetas = [0.9, 1.2, 1.3, 1.57]
    series = {}
    for th in thetas:
        sec = sections.get((th, 21))
        if sec and sec["prof"]:
            series[th] = sec

    heavy_path = os.path.join(LOGS, "renyi_profile_N64_T09.log")
    heavy_inc = None
    if os.path.exists(heavy_path):
        inc, prof = parse(heavy_path)
        if prof:
            base = None
            for line in open(heavy_path):
                m = BASE.search(line)
                if m:
                    base = (float(m.group(1)), float(m.group(2)))
            series[0.9] = {"base": base, "inc": inc, "prof": prof}
            heavy_inc = inc
            print(f"# theta=0.9 profile from heavy run {os.path.basename(heavy_path)}")

    if not series:
        raise SystemExit("no renyi_inc sections found")

    fig, ax = plt.subplots(figsize=(6.4, 4.4), dpi=200)
    fig.patch.set_facecolor(SURFACE)
    ax.set_facecolor(SURFACE)
    for side in ("top", "right"):
        ax.spines[side].set_visible(False)
    for side in ("left", "bottom"):
        ax.spines[side].set_color(GRID)
    ax.tick_params(colors=INK2, labelsize=8)
    ax.grid(True, color=GRID, linewidth=0.6)
    ax.set_axisbelow(True)

    color = {th: ORDINAL[1 + round(i * 3 / max(len(thetas) - 1, 1))]
             for i, th in enumerate(thetas)}
    for th in thetas:
        sec = series.get(th)
        if not sec:
            continue
        ls = sorted(sec["prof"])
        # prepend the base point S2(l=1) when the hybrid base was measured
        xs, ys, es = [], [], []
        if sec["base"]:
            xs.append(1), ys.append(sec["base"][0]), es.append(sec["base"][1])
        xs += ls
        ys += [sec["prof"][l][0] for l in ls]
        es += [sec["prof"][l][1] for l in ls]
        c = color[th]
        ax.errorbar(xs, ys, yerr=es, color=c, lw=1.6, marker="o", ms=3.2,
                    mfc=c, mec=SURFACE, mew=0.6, capsize=0, elinewidth=0.9,
                    label=rf"$\theta = {th}$", zorder=3)
        ax.annotate(rf"$\theta={th}$", xy=(xs[-1] + 0.4, ys[-1]),
                    fontsize=7.5, color=c, va="center")

    # Calabrese-Cardy fit overlay for the near-critical profile
    th_fit = 0.9
    c_vmc = None
    sec = series.get(th_fit)
    if sec and len(sec["inc"]) >= 6:
        lmin = 4
        try:
            res = fit_c(sec["inc"], n, lmin)
            c_fit, c_err, chi2dof = res["c"], res["c_err"], res["chi2_dof"]
            c_vmc = (c_fit, c_err)
            x = lambda l: math.log((n / math.pi) * math.sin(math.pi * l / n))
            # anchor the constant on the measured profile over the fit window
            ls = [l for l in sec["prof"] if l >= lmin]
            const = sum(sec["prof"][l][0] - (c_fit / 4) * x(l) for l in ls) / len(ls)
            grid = [l / 4 for l in range(4 * lmin, 4 * (n // 2) + 1)]
            ax.plot(grid, [(c_fit / 4) * x(l) + const for l in grid],
                    color=INK2, lw=1.2, ls="--", zorder=2,
                    label=rf"CC fit: $c = {c_fit:.3f} \pm {c_err:.3f}$")
            print(f"# CC fit theta={th_fit}: c = {c_fit:.4f} +/- {c_err:.4f} "
                  f"(chi2/dof = {chi2dof:.2f})")
        except SystemExit as e:
            print(f"# CC fit skipped: {e}")

    ax.axhline(math.log(2), color=INK2, lw=0.8, ls=":", zorder=1)
    ax.annotate(r"$\ln 2$ (symmetric cat)", xy=(33.5, math.log(2) + 0.012),
                fontsize=7.5, color=INK2)
    ax.set_xlabel(r"subsystem size $l'$", fontsize=9, color=INK)
    ax.set_ylabel(r"Renyi-2 entropy  $S_2(l')$", fontsize=9, color=INK)
    ax.set_title(f"Entanglement profile of trained N={n} states "
                 "(increment estimator)", fontsize=10, color=INK, loc="left")
    ax.set_xlim(0, n // 2 + 5.5)
    ax.legend(fontsize=7, frameon=False, loc="upper left", labelcolor=INK2)

    # central-charge inset: exact ED ladder c(N) at theta=0.9
    # (scripts/central_charge_exact.py) + the VMC N=64 fit above
    exact_json = os.path.join(LOGS, "central_charge_exact_T09.json")
    if os.path.exists(exact_json):
        import json as _json

        ed = _json.load(open(exact_json))["sizes"]
        ns = sorted(int(k) for k in ed)
        axi = ax.inset_axes([0.585, 0.1, 0.385, 0.31])
        axi.set_facecolor(SURFACE)
        for side in ("top", "right"):
            axi.spines[side].set_visible(False)
        for side in ("left", "bottom"):
            axi.spines[side].set_color(GRID)
        axi.tick_params(colors=INK2, labelsize=6)
        axi.grid(True, color=GRID, linewidth=0.5)
        axi.set_axisbelow(True)
        axi.plot([1.0 / v for v in ns], [ed[str(v)]["c"] for v in ns],
                 color=ORDINAL[3], lw=1.2, marker="o", ms=2.8,
                 mfc=ORDINAL[3], mec=SURFACE, mew=0.5, zorder=3)
        if c_vmc is not None:
            axi.errorbar([1.0 / n], [c_vmc[0]], yerr=[c_vmc[1]],
                         color="#eb6834", marker="D", ms=3.4, mec=SURFACE,
                         mew=0.5, elinewidth=0.9, capsize=0, zorder=4)
            axi.annotate("VMC N=64", xy=(1.0 / n, c_vmc[0]), xytext=(3, -8),
                         textcoords="offset points", fontsize=5.8,
                         color="#eb6834")
        axi.axhline(0.5, color=INK2, lw=0.7, ls=":", zorder=1)
        axi.annotate(r"Ising $c=\frac{1}{2}$", xy=(0.002, 0.503),
                     fontsize=5.8, color=INK2)
        axi.set_xlabel(r"$1/N$", fontsize=6.5, color=INK2, labelpad=1)
        axi.set_title(r"central charge at $\theta=0.9$ (ED + VMC)",
                      fontsize=6.5, color=INK2)
        axi.set_xlim(0, 1.0 / min(ns) + 0.01)

    fig.tight_layout()
    os.makedirs(os.path.dirname(out_png), exist_ok=True)
    fig.savefig(out_png, facecolor=SURFACE)
    print(f"wrote {out_png}")


if __name__ == "__main__":
    main()
