"""Unit tests for the Binder-crossing analysis (examples/binder_crossing.py).

The crossing table is the round's headline physics deliverable (reference
README.md:2 - the paper's finite-size-scaling analysis); this guards the
log/ED-grid parsers, the sign-change crossing scan with error propagation,
and the 1/N finite-size-scaling extrapolation against hand-checkable
synthetic data.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def bc():
    spec = importlib.util.spec_from_file_location(
        "binder_crossing", os.path.join(REPO, "examples", "binder_crossing.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["binder_crossing"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_parse_log(bc, tmp_path):
    log = tmp_path / "m.log"
    log.write_text(
        "=== theta=0.9 ===\n"
        "# prefix: runs/X\n"
        "# stag m1=0.4018 m2=0.2 m4=0.05 binder=0.5833 binder_err=1.2e-03\n"
        "=== theta=1.0 ===\n"
        "junk line\n"
        "# stag m1=0.8425 m2=0.72 m4=0.53 binder=0.6593\n"
    )
    d = bc.parse_log(str(log))
    assert set(d) == {0.9, 1.0}
    assert d[0.9]["U"] == pytest.approx(0.5833)
    assert d[0.9]["err"] == pytest.approx(1.2e-3)
    assert d[0.9]["m1"] == pytest.approx(0.4018)
    # missing binder_err parses as nan, not a crash
    assert d[1.0]["U"] == pytest.approx(0.6593)
    assert d[1.0]["err"] != d[1.0]["err"]


def test_parse_exact_json(bc, tmp_path):
    grid = {"thetas": [0.9, 0.925], "U": {"12": [0.54, 0.58], "24": [0.52, 0.59]}}
    p = tmp_path / "g.json"
    p.write_text(json.dumps(grid))
    d = bc.parse_exact_json(str(p), "24")
    assert d[0.925]["U"] == pytest.approx(0.59)
    assert d[0.9]["err"] == 0.0
    # the generic dispatcher routes .json to the ED parser
    assert bc.parse_input("12", str(p))[0.9]["U"] == pytest.approx(0.54)


def test_crossing_linear_interpolation(bc):
    # U_small = 0.5 flat; U_big crosses it linearly between 0.9 and 1.0 at
    # exactly 0.94: D = ub - ua goes -0.02 -> +0.03
    thetas = [0.8, 0.9, 1.0]
    ua = [0.5, 0.5, 0.5]
    ub = [0.40, 0.48, 0.53]
    found = bc.crossings(thetas, ua, ub, [0.001] * 3, [0.001] * 3)
    assert len(found) == 1
    t0, t1, tc, terr, status = found[0]
    assert (t0, t1) == (0.9, 1.0)
    assert tc == pytest.approx(0.94)
    assert status == "ok"  # |D| = 0.02 and 0.03 both >> 1.4e-3 propagated sigma
    assert terr < 0.01


def test_crossing_significance_flag(bc):
    # same geometry but with errors larger than the bracketing differences:
    # the crossing must be reported yet flagged not-significant
    thetas = [0.9, 1.0]
    found = bc.crossings(thetas, [0.5, 0.5], [0.48, 0.53], [0.05, 0.05], [0.05, 0.05])
    assert len(found) == 1
    assert found[0][4] == "not significant"
    # ... as must a crossing whose bracketing point carries a NaN error
    nan = float("nan")
    found = bc.crossings(thetas, [0.5, 0.5], [0.48, 0.53], [nan, 0.001], [0.001, 0.001])
    assert found[0][4] == "not significant"


def test_crossing_direction_and_saturation_flags(bc):
    # + -> - re-crossing (convergence systematics): wrong direction for U
    found = bc.crossings([0.9, 1.0], [0.5, 0.5], [0.53, 0.48], [0.001] * 2, [0.001] * 2)
    assert found[0][4] == "wrong direction"
    # ...but it is the PHYSICAL direction for the correlation ratio R
    found = bc.crossings([0.9, 1.0], [0.5, 0.5], [0.53, 0.48], [0.001] * 2, [0.001] * 2, direction=-1)
    assert found[0][4] == "ok"
    # sign flip with every bracketing value on the 2/3 plateau: saturated
    found = bc.crossings(
        [1.4, 1.5], [0.6662, 0.6666], [0.6645, 0.6667], [1e-5] * 2, [1e-5] * 2
    )
    assert found[0][4] == "saturated"
    # the same geometry passes with the plateau check disabled
    found = bc.crossings(
        [1.4, 1.5], [0.6662, 0.6666], [0.6645, 0.6667], [1e-5] * 2, [1e-5] * 2, saturated=None
    )
    assert found[0][4] == "ok"


def test_no_crossing_on_monotone_gap(bc):
    found = bc.crossings([0.9, 1.0, 1.1], [0.5] * 3, [0.6, 0.62, 0.64], [0.01] * 3, [0.01] * 3)
    assert found == []


def test_fss_extrapolation_recovers_intercept(bc, capsys, tmp_path, monkeypatch):
    # synthetic drift theta_c(N) = 0.90 + 0.3/N sampled through one ED-grid
    # input holding three sizes: the consecutive pair crossings are
    # tc(8,16) = 0.9375 and tc(16,32) = 0.91875, and the 1/N_small-weighted
    # FSS fit through (1/8, 0.9375), (1/16, 0.91875) has intercept exactly
    # 0.90. Linear U curves with slope prop. to N, constructed so each pair
    # crosses at its target: U32/U16 anchored at tc(16,32), U8 anchored to
    # pass through U16 at tc(8,16).
    a1, a2 = 0.90 + 0.3 / 8, 0.90 + 0.3 / 16
    u16 = lambda t: 0.5 + 1.6 * (t - a2)  # noqa: E731
    u32 = lambda t: 0.5 + 3.2 * (t - a2)  # noqa: E731
    u8 = lambda t: u16(a1) + 0.8 * (t - a1)  # noqa: E731
    thetas = [0.85, 0.9, 0.95, 1.0]
    grid = {
        "thetas": thetas,
        "U": {
            "8": [u8(t) for t in thetas],
            "16": [u16(t) for t in thetas],
            "32": [u32(t) for t in thetas],
        },
    }
    p = tmp_path / "grid.json"
    p.write_text(json.dumps(grid))

    monkeypatch.setattr(sys, "argv", ["bc", f"8:{p}", f"16:{p}", f"32:{p}"])
    bc.main()
    out = capsys.readouterr().out
    assert "theta_c ~ 0.9375" in out
    assert "theta_c ~ 0.9187" in out or "theta_c ~ 0.9188" in out
    import re

    m = re.search(r"theta_c\(inf\) ~ ([\d.]+)", out)
    assert m, out
    assert abs(float(m.group(1)) - 0.90) < 1e-3


def test_drift_fit_error_inflation():
    """binder_fss_final.drift_fit: exact-line inputs recover the intercept
    with no inflation; scattered near-exact points inflate the error by
    sqrt(chi2/dof) so the quoted theta_c error covers the model systematic."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from scripts.binder_fss_final import drift_fit

    # exact 1/N line: tc = 0.9 + 0.3/N, generous errors -> scale 1
    exact = [(n, 2 * n, 0.9 + 0.3 / n, 0.01, "ED") for n in (8, 10, 12, 32)]
    b, berr, a, chi2_dof, scale = drift_fit(exact)
    assert abs(b - 0.9) < 1e-9 and abs(a - 0.3) < 1e-9
    assert scale == 1.0 and chi2_dof < 1e-6

    # same line + one 0.02-scattered point with a tiny formal error:
    # chi2/dof >> 1 must inflate the quoted error to cover the residual
    scattered = list(exact)
    scattered[1] = (10, 20, 0.9 + 0.3 / 10 + 0.02, 0.0, "ED")
    b2, berr2, a2, chi2_dof2, scale2 = drift_fit(scattered)
    assert chi2_dof2 > 2 and scale2 > 1.5
    assert berr2 > 2 * berr
    # the inflated error should cover the true intercept
    assert abs(b2 - 0.9) < 3 * berr2


def test_drift_fit_power_recovers_exponent():
    """binder_fss_final.drift_fit_power: data generated with omega=2 is
    recovered (intercept + exponent) where the 1/N model is biased; with
    < 4 points it falls back to the linear model (omega pinned to 1)."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from scripts.binder_fss_final import drift_fit, drift_fit_power

    pts = [(n, 2 * n, 0.9 + 2.0 / n**2, 0.001, "ED") for n in (8, 10, 12, 32, 64)]
    b, berr, a, omega, chi2_dof, scale = drift_fit_power(pts)
    assert abs(omega - 2.0) < 0.01
    assert abs(b - 0.9) < 1e-4 and abs(a - 2.0) < 0.05
    assert scale == 1.0  # exact model -> no inflation
    # the forced-1/N fit on the same data misses the intercept by more
    b1, berr1, *_ = drift_fit(pts)
    assert abs(b1 - 0.9) > 5 * abs(b - 0.9)

    # n < 4 -> linear fallback
    b3, _, _, omega3, _, _ = drift_fit_power(pts[:3])
    assert omega3 == 1.0


def test_vmc_corrratio_crossings(tmp_path, monkeypatch):
    """binder_fss_final.vmc_corrratio_points: parses the
    corrratio_measure.sh log format (driver banner noise included) and
    finds the R(32) x R(64) crossing of synthetic curves that cross at
    theta = 0.9; a single-theta N=96 log cannot yield a crossing but DOES
    feed the size-ordering bracket path (returned alongside the points)."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import scripts.binder_fss_final as fss

    def write_log(n, slope, offset):
        # R -> 1 on the disordered (small-theta) side, -> 0 in the ordered
        # phase, falling faster for bigger N (the physical orientation the
        # direction=-1 scan in vmc_corrratio_points requires)
        lines = []
        for t in (0.85, 0.875, 0.9, 0.925, 0.95):
            r = offset + slope * (t - 0.9)
            lines += [
                f"=== theta={t} ===",
                f"# prefix: runs/RBMTrSymmLICH-L{n}NF4A2.5T{t}V9",
                "# what : corrratio",
                f"# corrratio R={r:.6f} R_err=0.002000 S_peak=1.0 S_neighbor={r:.6f}",
            ]
        lines.append("# skip theta=1.05 (no checkpoint)")
        (tmp_path / f"corrratio_N{n}.log").write_text("\n".join(lines) + "\n")

    # lines cross where 0.5 - 2 dt = 0.52 - 4 dt -> dt = 0.01, tc = 0.91
    write_log(32, -2.0, 0.5)
    write_log(64, -4.0, 0.52)
    # N=96 log exists but has a single theta -> no crossing, only a
    # (64,96) size-ordering bracket
    (tmp_path / "corrratio_N96.log").write_text(
        "=== theta=0.9 ===\n# corrratio R=0.5 R_err=0.002 S_peak=1 S_neighbor=0.5\n"
    )
    monkeypatch.setattr(fss, "LOGS", str(tmp_path))

    d = fss.parse_corrratio_log(str(tmp_path / "corrratio_N32.log"))
    assert set(d) == {0.85, 0.875, 0.9, 0.925, 0.95}
    assert d[0.85] == (pytest.approx(0.6), pytest.approx(0.002))

    pts, brackets = fss.vmc_corrratio_points(verbose=False)
    assert len(pts) == 1
    ns, nb, tc, terr, src = pts[0]
    assert (ns, nb, src) == (32, 64, "VMC-R")
    assert tc == pytest.approx(0.91, abs=1e-6)
    assert 0 < terr < 0.01
    assert any(b[0] == 64 and b[1] == 96 for b in brackets)


def test_drift_fit2_recovers_two_corrections():
    """binder_fss_final.drift_fit2: data generated with theta_c + a/N +
    b/N^2 is recovered exactly (the pure-1/N fit is biased on it); with
    < 4 points it falls back to the linear model (b pinned to 0)."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from scripts.binder_fss_final import drift_fit, drift_fit2

    pts = [(n, 2 * n, 0.9 + 0.5 / n - 12.0 / n**2, 0.001, "ED") for n in (8, 10, 12, 32, 64)]
    b0, berr, a, b2, chi2_dof, scale = drift_fit2(pts)
    assert abs(b0 - 0.9) < 1e-6 and abs(a - 0.5) < 1e-4 and abs(b2 + 12.0) < 1e-2
    assert scale == 1.0  # exact model -> no inflation
    b1, *_ = drift_fit(pts)
    assert abs(b1 - 0.9) > 100 * abs(b0 - 0.9)

    # n < 4 -> linear fallback with b = 0
    b3, _, _, b2_3, _, _ = drift_fit2(pts[:3])
    assert b2_3 == 0.0


def test_central_charge_fit_roundtrip(tmp_path):
    """scripts/central_charge_fit.py recovers c from a synthetic
    renyi_inc driver log (locks the parser to the driver's line format)."""
    import math

    import numpy as np

    from scripts.central_charge_fit import fit_c, parse

    n_sites, c = 64, 0.5
    x = lambda l: math.log((n_sites / math.pi) * math.sin(math.pi * l / n_sites))
    rng = np.random.default_rng(0)
    cum = 0.3
    lines = []
    for j in range(1, 32):
        e = 2e-4
        v = -((c / 4) * (x(j + 1) - x(j)) + rng.normal(0, e))
        cum -= v
        lines.append(
            f"# level {j:3d}: ln(q_{j+1}/q_{j}) = {v:+.6f} +/- {e:.2e}  "
            f"(Re ratio 1.0)  S2(l={j+1}) = {cum:.6f} +/- {e:.6f}"
        )
    p = tmp_path / "prof.log"
    p.write_text("\n".join(lines))
    inc, prof = parse(str(p))
    assert len(inc) == 31 and len(prof) == 31
    res = fit_c(inc, n_sites, lmin=4)
    assert abs(res["c"] - c) < 5 * res["c_err"] + 0.01, res


def test_exact_s2_profile():
    """scripts/central_charge_exact.exact_s2_profile: Bell pair gives
    S2 = ln 2; a product state gives 0; a random state matches the
    reduced-density-matrix oracle at every cut."""
    import numpy as np

    from scripts.central_charge_exact import exact_s2_profile

    bell = np.zeros(4)
    bell[0] = bell[3] = 1 / np.sqrt(2)
    np.testing.assert_allclose(exact_s2_profile(bell, 2), [np.log(2)], atol=1e-12)

    prod = np.kron([1.0, 0.0], np.kron([0.6, 0.8], [0.0, 1.0]))
    np.testing.assert_allclose(exact_s2_profile(prod, 3), 0.0, atol=1e-12)

    rng = np.random.default_rng(3)
    n = 6
    psi = rng.normal(size=2**n) + 1j * rng.normal(size=2**n)
    psi /= np.linalg.norm(psi)
    prof = exact_s2_profile(psi, n)
    for l in range(1, n):
        mat = psi.reshape(2 ** (n - l), 2**l)
        rho = mat.T @ mat.conj()
        want = -np.log(np.real(np.trace(rho @ rho)))
        np.testing.assert_allclose(prof[l - 1], want, atol=1e-10)


def test_window_bracket_localizes_theta_c_outside_scanned_window():
    """scripts/binder_fss_final.window_bracket: a pair whose size-ordering
    never flips across the scanned thetas yields an exclusion bracket at
    the constraining window edge (the trimmed N=128 session's case)."""
    from scripts.binder_fss_final import window_bracket

    # Binder (direction=+1): U_big < U_small everywhere -> disordered
    # throughout the window -> theta_c above the TOP edge.
    t, side, nsig = window_bracket(
        [0.7, 0.9], [0.0245, 0.4659], [0.0145, 0.2391],
        [0.02, 0.1216], [0.02, 0.2076],
    )
    assert (t, side) == (0.9, "above")
    assert abs(nsig - abs(0.2391 - 0.4659) / (0.1216**2 + 0.2076**2) ** 0.5) < 1e-12

    # Ordered throughout (U_big > U_small everywhere) -> theta_c below
    # the BOTTOM edge.
    t, side, _ = window_bracket(
        [0.9, 1.1], [0.40, 0.60], [0.50, 0.66], [0.01, 0.01], [0.01, 0.01]
    )
    assert (t, side) == (0.9, "below")

    # Correlation ratio flips the phase convention (direction=-1):
    # R_big > R_small everywhere -> disordered -> theta_c above top edge.
    t, side, _ = window_bracket(
        [0.9], [0.0659], [0.6169], [0.0002], [0.3708], direction=-1
    )
    assert (t, side) == (0.9, "above")

    # A sign change means a crossing exists: no bracket.
    assert window_bracket(
        [0.8, 1.0], [0.2, 0.6], [0.1, 0.7], [0.01, 0.01], [0.01, 0.01]
    ) is None
