"""Driver entry points: single-chip compile + 8-device dry run (CI copy of
what the external driver does)."""

import sys

import jax
import numpy as np
import pytest


def test_entry_compiles_and_runs():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    re, im = out
    assert re.shape == (1024,)
    assert bool(np.isfinite(np.asarray(re)).all())


def test_dryrun_multichip_8_toy():
    """Fast-lane copy: 1D + 2D-mesh training steps on toy shapes. The
    production-shape leg (N=128, 4096 walkers, 10 SR steps x 3 layouts,
    ~30 min single-core) runs in the slow lane below and in the external
    driver's own dryrun_multichip(8) call."""
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8, production=False)


@pytest.mark.slow
def test_dryrun_multichip_8_production():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
