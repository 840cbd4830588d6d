"""Auto n_beta selection from measured replica-exchange acceptance.

Beyond-reference instrumentation: the reference's PT sampler
(impl_mcmc_sampler.hpp:157-188) tracks no swap statistics, so its nBeta is
a blind manual choice. tempering.swap_acceptance_probe measures the
per-adjacent-pair exchange acceptance and tempering.tune_n_beta picks the
smallest ladder whose WORST pair clears a target rate; VMC collapse
escalation (collapse_escalate_nbeta=0) and the train driver (-nbeta=auto)
use it.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import neural_network_quantum_state_tpu as nqs
from neural_network_quantum_state_tpu.models import RBM
from neural_network_quantum_state_tpu.ops.cplx import C
from neural_network_quantum_state_tpu.sampler import metropolis, tempering
from neural_network_quantum_state_tpu.sampler.schedule import chain_checkerboard


def _pinned_machine(n=8, scale=3.0):
    """RBM with a strong Neel-aligned visible bias: the plain beta=1 chain
    nearly freezes (flip accept ~ e^{-4*scale}) while hot replicas mix."""
    machine = RBM(n_inputs=n, n_hiddens=4, dtype=jnp.float64)
    params = dict(machine.init_params(jax.random.PRNGKey(0)))
    neel = jnp.where(jnp.arange(n) % 2 == 0, scale, -scale).astype(jnp.float64)
    params["a"] = C(neel, jnp.zeros_like(neel))
    return machine, params


def _state(machine, params, k_tot, seed=1):
    work = machine.make_work(params)
    n = machine.n_inputs
    neel = jnp.tile(jnp.where(jnp.arange(n) % 2 == 0, 1.0, -1.0), (k_tot, 1)).astype(jnp.float64)
    return work, metropolis.init_state(work, neel, jax.random.PRNGKey(seed))


def test_swap_acceptance_probe_shapes_and_hot_replica_mixing():
    machine, params = _pinned_machine()
    schedule = jnp.asarray(chain_checkerboard(machine.n_inputs))
    flips = {}
    for nb in (2, 8):
        work, state = _state(machine, params, k_tot=nb * 64)
        state = tempering.tempering_sweeps(work, state, schedule, 40, nb)
        swap, flip, state2 = tempering.swap_acceptance_probe(work, state, schedule, 30, nb)
        swap, flip = (np.asarray(jax.device_get(x)) for x in (swap, flip))
        assert swap.shape == (nb - 1,) and flip.shape == (nb,)
        assert np.all(swap >= 0.0) and np.all(swap <= 1.0)
        assert np.all(flip >= 0.0) and np.all(flip <= 1.0)
        # the probe advances the chain like a normal tempered sweep call
        assert float(state2.n_proposed) > float(state.n_proposed)
        # colder replicas of this pinned machine accept fewer flips than
        # hotter ones (beta_r = (nb-r)/nb decreases with r)
        assert flip[0] < flip[-1]
        flips[nb] = flip
    # the ladder's mixing engine: beta_min = 1/8 mixes far better than 1/2
    assert flips[8][-1] > flips[2][-1]


def test_tune_n_beta_needs_a_mixing_hot_replica():
    """On a strongly pinned ensemble adjacent replicas hold near-identical
    configurations, so swap acceptance is trivially high for SMALL n_beta
    too - the mix_target criterion is what forces the ladder hot enough to
    actually restore ergodicity."""
    machine, params = _pinned_machine(scale=3.0)
    schedule = jnp.asarray(chain_checkerboard(machine.n_inputs))
    k_tot = 96
    work, state = _state(machine, params, k_tot)
    nb, diags = tempering.tune_n_beta(
        work, state, schedule, candidates=(2, 4, 6, 8), target=0.2,
        mix_target=0.1, warm_sweeps=20, probe_sweeps=20,
    )
    assert nb in (2, 4, 6, 8) and k_tot % nb == 0
    d = diags[nb]
    assert len(d["swap"]) == nb - 1 and len(d["flip"]) == nb
    # the choice is justified: both bars met, or nb is the last candidate
    assert (min(d["swap"]) >= 0.2 and max(d["flip"]) >= 0.1) or nb == 8
    # flip acceptance at beta_min ~ e^{-12/nb} for this pinning: nb=2
    # (e^-6 ~ 0.2%) must have been rejected by the mixing criterion
    assert 2 in diags and max(diags[2]["flip"]) < 0.1
    assert nb > 2


def test_tune_n_beta_respects_divisibility():
    machine, params = _pinned_machine(n=6)
    schedule = jnp.asarray(chain_checkerboard(6))
    work, state = _state(machine, params, k_tot=96)
    nb, diags = tempering.tune_n_beta(
        work, state, schedule, candidates=(16, 2), target=2.0,  # unreachable target
        warm_sweeps=5, probe_sweeps=5, n_devices=4,
    )
    assert nb == 2 and list(diags) == [2]  # 16 skipped (4*16 does not divide 96)


@pytest.mark.slow
def test_collapse_escalation_with_auto_nbeta():
    """collapse_escalate_nbeta=0: the in-run rescue tunes the ladder from
    measured swap acceptance instead of a fixed replica count (the fixed-4
    variant is covered by test_vmc_collapse_auto_remediation)."""
    from neural_network_quantum_state_tpu.hamiltonians import LITFIChain

    n, k = 8, 96
    machine = RBM(n_inputs=n, n_hiddens=4, dtype=jnp.float64)
    ham = LITFIChain(n_sites=n, j=1.0, h=-0.01, alpha=2.5, pbc=True)
    cfg = nqs.VMCConfig(
        n_walkers=k, learning_rate=1e-3, solver="cg", seed=3,
        collapse_patience=2, collapse_escalate_nbeta=0,
        collapse_requil_sweeps=1, rsd_cutoff=1e-9,
    )
    vmc = nqs.VMC(machine, ham, cfg)
    assert vmc._can_escalate()
    params, state = vmc.init()
    neel = jnp.where(jnp.arange(n) % 2 == 0, 3.0, -3.0).astype(jnp.float64)
    params = dict(params)
    params["a"] = C(neel, jnp.zeros_like(neel))
    params, state, hist, _ = vmc.run(params, state, 25)
    assert vmc.n_remediations >= 1
    assert len(hist) == 25
    assert all(np.isfinite(h["energy"]) for h in hist)


def test_train_driver_nbeta_auto(tmp_path):
    from neural_network_quantum_state_tpu.drivers import train

    res = train.main(
        [
            "-model=CH", "-ansatz=rbm", "-L=6", "-nf=2", "-ns=96",
            "-niter=10", "-nwarm=20", "-lr=1e-2", "-dtype=float64",
            f"-path={tmp_path}", "-rsd=1e-12", "-nbeta=auto", "-mloop=1",
        ]
    )
    hist = res[0]["history"]
    assert len(hist) == 10 and all(np.isfinite(h["energy"]) for h in hist)


@pytest.mark.slow
def test_measure_driver_nbeta_auto(tmp_path):
    """-nbeta=auto on the measurement side: probe the trained checkpoint's
    ladder, then run the tempered estimator with the chosen n_beta."""
    from neural_network_quantum_state_tpu.drivers import measure, train

    res = train.main(
        [
            "-model=CH", "-ansatz=rbmtrsymm", "-L=8", "-nf=2", "-ns=192",
            "-niter=60", "-nwarm=50", "-lr=2e-2", "-dtype=float64",
            f"-path={tmp_path}", "-rsd=1e-12",
        ]
    )
    prefix = res[0]["prefix"]
    m1, m2, m4 = measure.main(
        [
            "-what=stag", "-ansatz=rbmtrsymm", "-L=8", "-nf=2", "-ns=192",
            f"-prefix={prefix}", "-niter=10", "-nms=2", "-nwarm=30",
            "-dtype=float64", "-nbeta=auto",
        ]
    )
    assert 0.0 <= m1 <= 1.0 and 0.0 <= m2 <= 1.0 and 0.0 <= m4 <= 1.0


@pytest.fixture(scope="module")
def hubbard_checkpoint(tmp_path_factory):
    """One tiny trained Hubbard state shared by the three exchange-sampled
    -nbeta=auto measurement modes below."""
    from neural_network_quantum_state_tpu.drivers import train

    path = tmp_path_factory.mktemp("autonbeta_hubbard")
    res = train.main(
        [
            "-model=hubbard", "-ansatz=rbm", "-L=3", "-nf=8", "-ns=64",
            "-niter=10", "-nwarm=30", "-U=4", "-npar=1,1", "-dtype=float64",
            f"-path={path}",
        ]
    )
    return res[0]["prefix"]


@pytest.mark.parametrize("what", ["density", "opdm", "energy"])
def test_measure_driver_nbeta_auto_fermion_exchange_probe(hubbard_checkpoint, capsys, what):
    """-nbeta=auto with every exchange-sampled fermion mode (-what=density /
    opdm / hubbard energy): since round 4 this is SUPPORTED - the ladder is
    probed with the sector-preserving tempered-exchange dynamics
    (kawasaki.tune_n_beta_exchange), not the spin-flip probe, which would
    leave the particle-number sector. Assert the probe runs and reports
    its choice in each mode (round-4 advisor item: the earlier test only
    covered -what=density), plus a mode-appropriate sanity check."""
    from neural_network_quantum_state_tpu.drivers import measure

    # the measure driver takes -L as the JW site count (2x physical L)
    common = [
        "-npar=1,1", "-ansatz=rbm", "-L=6", "-nf=8", "-ns=64",
        f"-prefix={hubbard_checkpoint}", "-niter=4", "-nms=1", "-nwarm=10",
        "-dtype=float64", "-nbeta=auto",
    ]
    if what == "density":
        occ = measure.main(["-what=density"] + common)
        assert np.isfinite(occ).all()
        # exchange dynamics never leave the (1 up, 1 down) sector
        assert abs(float(occ.sum()) - 2.0) < 1e-9
    elif what == "opdm":
        row = measure.main(["-what=opdm", "-site=0"] + common)
        assert np.isfinite(np.asarray(row)).all()
    else:
        e, err = measure.main(["-what=energy", "-model=hubbard", "-U=4", "-t=1"] + common)
        assert np.isfinite(e.real) and np.isfinite(err)
    out = capsys.readouterr().out
    assert "# nbeta=auto -> n_beta=" in out
