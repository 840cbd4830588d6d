"""Assemble the two-sided Binder convergence campaign into one table.

Parses every binder_converge(-retry) block in the given campaign logs -
    point L=32 T=0.95 V11: U0=...
    ext 1: U=... (prev ..., |dU|=...)
    converged: U=... after 2 extensions   |   NOT converged after N ...
- keyed by (L, theta, version), keeping the LAST block per key (later
campaign stages supersede earlier ones). The version encodes the approach
side: the convergence protocol anneals from the disordered phase upward
("below": an under-ordered, U-too-low start) or from the ordered phase
downward ("above": U-too-high start), so [U_below, U_above] from the two
lineages brackets the equilibrium value and their midpoint/halfspread give
the quoted U and its systematic error.

Usage:
    python scripts/binder_assemble.py logs/binder_campaign_r3c.log \
        logs/binder_campaign_r3e.log logs/binder_campaign_r3g.log ... \
        [-json OUT.json]

Prints per (L, theta): U_below, U_above, the two-sided mean +/- halfspread
(or the one-sided value flagged), and convergence status.
"""

from __future__ import annotations

import json
import re
import sys

# version lineage -> approach side (see scripts/binder_campaign_r3*.sh,
# binder_supplement_r3f.sh, binder_n96_r3h.sh)
SIDE = {
    # N=32/64 grids
    9: "below",  # cold/extended round-2 grid (disordered-side starts)
    10: "below",
    11: "above",
    12: "below",
    13: "below",
    14: "below",
    15: "above",
    16: "below",  # block-move redo of trapped from-below points (r3h A0)
    # N=96 ladders
    1: "below",
    2: "above",
}

_POINT = re.compile(r"point L=(\d+) T=([\d.]+) V(\d+): U0=([-\d.]+)")
_EXT = re.compile(r"ext (\d+): U=([-\d.]+)")
_CONV = re.compile(r"converged: U=([-\d.]+) after (\d+) extensions")
_NOTCONV = re.compile(r"NOT converged after (\d+) extensions: U=([-\d.]+)")


def parse_logs(paths: list[str]) -> dict:
    """{(L, theta, ver): {u, converged, n_ext, u0}} - last block per key wins."""
    blocks: dict = {}
    cur_key = None
    for path in paths:
        for line in open(path):
            m = _POINT.search(line)
            if m:
                cur_key = (int(m.group(1)), float(m.group(2)), int(m.group(3)))
                blocks[cur_key] = {
                    "u0": float(m.group(4)),
                    "u": float(m.group(4)),
                    "converged": False,
                    "n_ext": 0,
                }
                continue
            if cur_key is None:
                continue
            m = _EXT.search(line)
            if m:
                blocks[cur_key]["u"] = float(m.group(2))
                blocks[cur_key]["n_ext"] = int(m.group(1))
                continue
            m = _CONV.search(line)
            if m:
                blocks[cur_key].update(u=float(m.group(1)), converged=True)
                cur_key = None
                continue
            m = _NOTCONV.search(line)
            if m:
                blocks[cur_key].update(u=float(m.group(2)), converged=False)
                cur_key = None
    return blocks


def assemble(blocks: dict) -> dict:
    """{(L, theta): {below: {...}, above: {...}, u, err, status}}"""
    out: dict = {}
    for (ell, theta, ver), b in sorted(blocks.items()):
        side = SIDE.get(ver)
        if side is None:
            continue
        entry = out.setdefault((ell, theta), {})
        # later versions on the same side supersede (sorted order: higher V last)
        entry[side] = {"u": b["u"], "converged": b["converged"], "ver": ver, "n_ext": b["n_ext"]}
    for key, entry in out.items():
        lo, hi = entry.get("below"), entry.get("above")
        if lo and hi:
            entry["u"] = 0.5 * (lo["u"] + hi["u"])
            entry["err"] = 0.5 * abs(hi["u"] - lo["u"])
            entry["status"] = "two-sided" + (
                "" if lo["converged"] and hi["converged"] else " (UNCONVERGED side)"
            )
        else:
            one = lo or hi
            entry["u"] = one["u"]
            entry["err"] = float("nan")
            entry["status"] = ("below" if lo else "above") + "-only" + (
                "" if one["converged"] else " UNCONVERGED"
            )
    return out


def main() -> None:
    args = sys.argv[1:]
    json_out = None
    if "-json" in args:
        i = args.index("-json")
        json_out = args[i + 1]
        del args[i : i + 2]
    if not args:
        raise SystemExit(__doc__)
    table = assemble(parse_logs(args))
    print(f"{'L':>4} {'theta':>7} {'U_below':>9} {'U_above':>9} {'U':>9} {'+/-':>8}  status")
    for (ell, theta), e in sorted(table.items()):
        lo = f"{e['below']['u']:9.4f}" if "below" in e else f"{'-':>9}"
        hi = f"{e['above']['u']:9.4f}" if "above" in e else f"{'-':>9}"
        print(f"{ell:4d} {theta:7.3f} {lo} {hi} {e['u']:9.4f} {e['err']:8.4f}  {e['status']}")
    if json_out:
        ser = {
            f"{ell}:{theta}": e for (ell, theta), e in sorted(table.items())
        }
        with open(json_out, "w") as f:
            json.dump(ser, f, indent=1)
        print(f"wrote {json_out}")


if __name__ == "__main__":
    main()
