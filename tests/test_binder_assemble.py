"""Parsers + two-sided bracketing of scripts/binder_assemble.py."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.binder_assemble import assemble, parse_logs  # noqa: E402

LOG = """\
#### N=32 theta=0.9 V11 converge ####
point L=32 T=0.9 V11: U0=0.400916
ext 1: U=0.455649 (prev 0.400916, |dU|=0.054733)
ext 2: U=0.482636 (prev 0.455649, |dU|=0.026987)
converged: U=0.482636 after 2 extensions
#### N=32 theta=0.9 V10 from-below converge ####
point L=32 T=0.9 V10: U0=0.300000
ext 1: U=0.470000 (prev 0.300000, |dU|=0.17)
NOT converged after 1 extensions: U=0.470000
#### stale earlier block that must be superseded ####
point L=64 T=0.95 V10: U0=0.50
ext 1: U=0.572300 (prev 0.50, |dU|=0.07)
NOT converged after 1 extensions: U=0.572300
"""

LOG_LATER = """\
point L=64 T=0.95 V10: U0=0.60
ext 1: U=0.639800 (prev 0.60, |dU|=0.04)
converged: U=0.639800 after 1 extensions
"""


def _write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


def test_parse_and_supersede(tmp_path):
    p1 = _write(tmp_path, "a.log", LOG)
    p2 = _write(tmp_path, "b.log", LOG_LATER)
    blocks = parse_logs([p1, p2])
    # V11 converged value
    assert blocks[(32, 0.9, 11)]["u"] == 0.482636
    assert blocks[(32, 0.9, 11)]["converged"] is True
    assert blocks[(32, 0.9, 11)]["n_ext"] == 2
    # V10 not converged
    assert blocks[(32, 0.9, 10)]["converged"] is False
    # chronologically later block supersedes
    assert blocks[(64, 0.95, 10)]["u"] == 0.6398
    assert blocks[(64, 0.95, 10)]["converged"] is True


def test_two_sided_bracket(tmp_path):
    p1 = _write(tmp_path, "a.log", LOG)
    table = assemble(parse_logs([p1]))
    e = table[(32, 0.9)]
    # below = V10 (0.47), above = V11 (0.482636)
    assert abs(e["u"] - 0.5 * (0.47 + 0.482636)) < 1e-12
    assert abs(e["err"] - 0.5 * abs(0.482636 - 0.47)) < 1e-12
    assert e["status"].startswith("two-sided")
    assert "UNCONVERGED" in e["status"]  # the below side did not converge
    # one-sided entry flagged
    e64 = table[(64, 0.95)]
    assert e64["status"].startswith("below-only")
