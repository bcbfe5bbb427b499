"""Hydration-TI workload pipeline (tiny scale; protocol shape check).

Exit criterion from SURVEY.md §7 stage 9: "hydration dG pipeline reproduces
the reference protocol shape" — windows in parallel, dH/dl collected, TI
integrates, descriptors computed.
"""
import numpy as np
import pytest

from molchanica_tpu.properties import WaterSolMdProperties, run_sol_sim
from molchanica_tpu.systems.testmols import build_lj_dimer

pytestmark = pytest.mark.heavy  # minutes-per-test CPU tier (see README)


def _tiny_solute():
    from molchanica_tpu.molecules.spec import MolSpec
    # neutral LJ particle ("methane-like bead")
    return MolSpec(
        masses=np.array([16.0]), charges=np.array([0.0]),
        lj_sigma=np.array([3.73]), lj_eps=np.array([0.29]),
        positions=np.zeros((1, 3)))


def test_run_sol_sim_tiny():
    props = run_sol_sim(
        _tiny_solute(),
        box_side=16.0,
        lambdas=[0.0, 0.5, 1.0],
        equil_steps=20,
        prod_steps=30,
        dt_ps=0.001,
        dhdl_interval=5,
        seed=1,
        cfg_overrides=dict(lj_cutoff=6.0, coulomb_cutoff=6.0,
                           max_init_relaxation_iters=80,
                           direct_backend="auto"),
    )
    assert isinstance(props, WaterSolMdProperties)
    assert np.isfinite(props.dg_hydration_kcal)
    assert len(props.windows) == 3
    assert all(len(w.dhdl_samples) > 0 for w in props.windows)
    # fully decoupled window: particle sees nothing, dH/dl driven by the
    # softcore turn-on; finite either way
    assert props.mean_n_water_contacts >= 0.0


def test_run_sol_sim_fast_tiny():
    """FastSim-engine TI (VERDICT round-2 item 4): sequential lambda
    windows on the production colpair path, protocol shape identical."""
    from molchanica_tpu.properties.water_sol import run_sol_sim_fast

    props = run_sol_sim_fast(
        _tiny_solute(),
        box_side=24.0,
        lambdas=[0.0, 0.5, 1.0],
        equil_steps=16,
        prod_steps=24,
        dt_ps=0.001,
        dhdl_interval=8,
        seed=1,
        cfg_overrides=dict(lj_cutoff=6.0, coulomb_cutoff=6.0,
                           pme_grid=(24, 24, 24)),
    )
    assert isinstance(props, WaterSolMdProperties)
    assert np.isfinite(props.dg_hydration_kcal)
    assert len(props.windows) == 3
    assert all(len(w.dhdl_samples) == 3 for w in props.windows)
