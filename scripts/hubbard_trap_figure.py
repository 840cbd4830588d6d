"""Render the Hubbard harmonic-trap figure (two panels, PNG).

Panel (a): per-site, per-spin density profile of the trained L=32-site
Fermi-Hubbard chain (U=4, t=1, 5+5 particles, V(i) = 0.05 (i-15.5)^2),
with the normalized trap profile as a background reference curve (one
axis - the trap is indexed to its edge value, not a second scale).
Panel (b): one-particle density-matrix row |OPDM(16, 16+k)| on log y -
the off-diagonal coherence decay out of the trap center.

Inputs: runs/RBMHB-L32U4V2.density.dat (n_up, n_down columns) and
runs/RBMHB-L32U4V2.opdm16.dat (re, im columns), written by
drivers.measure -what=density / -what=opdm (equilibrated r3p pass).

Usage: python scripts/hubbard_trap_figure.py [-out docs/figures/hubbard_trap.png]
"""

from __future__ import annotations

import os
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# validated light-mode palette (same constants as binder_fss_figure.py)
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
    out_png = os.path.join(REPO, "docs", "figures", "hubbard_trap.png")
    for a in sys.argv[1:]:
        if a.startswith("-out"):
            out_png = a.split("=", 1)[1]

    dens = np.loadtxt(os.path.join(REPO, "runs", "RBMHB-L32U4V2.density.dat"))
    opdm = np.loadtxt(os.path.join(REPO, "runs", "RBMHB-L32U4V2.opdm16.dat"))
    n_sites = dens.shape[0]
    sites = np.arange(n_sites)
    trap = 0.05 * (sites - (n_sites - 1) / 2) ** 2
    trap_norm = trap / trap.max()

    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(10.2, 4.0), dpi=200)
    fig.patch.set_facecolor(SURFACE)
    for ax in (ax1, ax2):
        style_axis(ax)

    ymax = 1.12 * float((dens[:, 0] + dens[:, 1]).max())
    ax1.fill_between(sites, trap_norm * ymax, color=GRID, alpha=0.55,
                     zorder=1, lw=0)
    ax1.annotate("trap profile $V(i)$\n(normalized)", xy=(1.2, 0.78 * ymax),
                 fontsize=7.5, color=INK2)
    ax1.plot(sites, dens[:, 0] + dens[:, 1], color=INK2, lw=1.2, ls="--",
             marker="", label=r"$\langle n_i \rangle$ total", zorder=2)
    ax1.plot(sites, dens[:, 0], color=BLUE, lw=1.8, marker="o", ms=3.6,
             mfc=BLUE, mec=SURFACE, mew=0.6,
             label=r"$\langle n_{i\uparrow} \rangle$", zorder=3)
    ax1.plot(sites, dens[:, 1], color=ORANGE, lw=1.8, marker="s", ms=3.4,
             mfc=ORANGE, mec=SURFACE, mew=0.6,
             label=r"$\langle n_{i\downarrow} \rangle$", zorder=3)
    ax1.set_xlabel("site $i$", fontsize=9, color=INK)
    ax1.set_ylabel(r"density $\langle n_{i\sigma} \rangle$", fontsize=9,
                   color=INK)
    ax1.set_title("(a) Trapped Fermi-Hubbard density profile "
                  "(L=32, U=4, 5+5)", fontsize=10, color=INK, loc="left")
    ax1.set_ylim(0, ymax)
    ax1.legend(fontsize=7.5, frameon=False, loc="upper right",
               labelcolor=INK2)

    k = np.arange(opdm.shape[0])
    mag = np.abs(opdm[:, 0] + 1j * opdm[:, 1])
    ax2.semilogy(k, np.maximum(mag, 1e-6), color=BLUE, lw=1.8, marker="o",
                 ms=4.0, mfc=BLUE, mec=SURFACE, mew=0.6, zorder=3)
    ax2.set_xlabel("separation $k$  (site $16 \\to 16+k$)", fontsize=9,
                   color=INK)
    ax2.set_ylabel(r"$|\mathrm{OPDM}(16, 16+k)|$", fontsize=9, color=INK)
    ax2.set_title("(b) Off-diagonal coherence decay from the trap center",
                  fontsize=10, color=INK, loc="left")

    fig.tight_layout()
    os.makedirs(os.path.dirname(out_png), exist_ok=True)
    fig.savefig(out_png, facecolor=SURFACE)
    print(f"wrote {out_png}")


if __name__ == "__main__":
    main()
