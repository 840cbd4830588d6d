"""Driver entry points: single-chip compile + 8-device dry run (CI copy of
what the external driver does)."""

import sys

import jax
import numpy as np


def test_entry_compiles_and_runs():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    re, im = out
    assert re.shape == (1024,)
    assert bool(np.isfinite(np.asarray(re)).all())


def test_dryrun_multichip_8():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
