"""Alchemical TI machinery + replica-farm lambda windows."""
import numpy as np
import pytest

from molchanica_tpu.md.alchemical import (
    AlchemicalError,
    LambdaWindow,
    collect_window,
    free_energy_ti_with_sem,
)


def test_ti_constant_integrand():
    wins = [LambdaWindow(lam=l, dhdl_samples=np.full(100, 3.0))
            for l in (0.0, 0.25, 0.5, 0.75, 1.0)]
    dg, sem = free_energy_ti_with_sem(wins)
    np.testing.assert_allclose(dg, 3.0, rtol=1e-12)
    assert sem < 1e-9


def test_ti_linear_integrand():
    # dH/dl = 10 l -> integral = 5
    wins = [LambdaWindow(lam=l, dhdl_samples=np.full(50, 10.0 * l))
            for l in np.linspace(0, 1, 11)]
    dg, _ = free_energy_ti_with_sem(wins)
    np.testing.assert_allclose(dg, 5.0, rtol=1e-10)


def test_sem_reflects_noise():
    rng = np.random.default_rng(0)
    quiet = LambdaWindow(0.5, rng.normal(0, 0.01, 500))
    loud = LambdaWindow(0.5, rng.normal(0, 10.0, 500))
    assert loud.sem() > 100 * quiet.sem()


def test_collect_window_and_errors():
    class S:
        def __init__(self, d):
            self.dhdl = d
    w = collect_window(0.3, [S(1.0), S(2.0), S(3.0)])
    np.testing.assert_allclose(w.mean, 2.0)
    with pytest.raises(AlchemicalError):
        collect_window(0.3, [])
    with pytest.raises(AlchemicalError):
        free_energy_ti_with_sem([w])


@pytest.mark.heavy
def test_engine_dhdl_end_to_end():
    """A coupled LJ particle in a tiny neutral bath: dH/dlambda must be
    nonzero at mid-coupling and ~0 when there is no alchemical molecule."""
    import jax.numpy as jnp
    from molchanica_tpu.md.config import Integrator, MdConfig
    from molchanica_tpu.md.engine import MdSim
    from molchanica_tpu.molecules.spec import MolSpec, assemble_system

    rng = np.random.default_rng(0)
    baths = [MolSpec(masses=[39.9], charges=[0.0], lj_sigma=[3.3],
                     lj_eps=[0.25],
                     positions=rng.uniform(0, 12, (1, 3)))
             for _ in range(24)]
    solute = MolSpec(masses=[39.9], charges=[0.0], lj_sigma=[3.3],
                     lj_eps=[0.25], positions=np.array([[6.0, 6.0, 6.0]]))
    asys = assemble_system([solute] + baths, box_extent=np.array([12.0] * 3),
                           alchemical_mol=0)
    cfg = MdConfig(integrator=Integrator.langevin_middle(gamma=2.0),
                   temp_target=120.0, lj_cutoff=5.0, coulomb_cutoff=5.0,
                   dtype="float64", max_init_relaxation_iters=100,
                   zero_com_drift=False, seed=3)
    sim = MdSim(asys.topology, cfg, asys.positions,
                box_extent=asys.box_extent, method="allpairs_cutoff")
    sim.configure_alchemical_window(0.5)
    sim.step(0.002, 10)
    dhdl_mid = float(sim.state.dhdl_last)
    assert np.isfinite(dhdl_mid) and abs(dhdl_mid) > 1e-6
    # lambda=0 (fully coupled): dH/dl is still generally nonzero; but with
    # no alchemical molecule flagged, it must be exactly zero
    asys2 = assemble_system([solute] + baths, box_extent=np.array([12.0] * 3))
    sim2 = MdSim(asys2.topology, cfg, asys2.positions,
                 box_extent=asys2.box_extent, method="allpairs_cutoff")
    sim2.step(0.002, 5)
    assert abs(float(sim2.state.dhdl_last)) < 1e-12
