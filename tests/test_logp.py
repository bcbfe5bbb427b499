"""LogP dual-phase alchemical workload (reference logp.rs:206)."""
import numpy as np
import pytest

from molchanica_tpu.md.alchemical import LambdaWindow
from molchanica_tpu.properties.logp import (
    FreeEnergyEstimate, LogPResult, log_p, run_alchemical)
from molchanica_tpu.systems.octanol import build_octanol, pack_octanol_box


def test_octanol_molecule_sane():
    m = build_octanol()
    assert m.n_atoms == 8 + 17 + 2            # C8, H17, O, HO
    np.testing.assert_allclose(float(np.sum(m.charges)), 0.0, atol=1e-12)
    assert len(m.bonds) == m.n_atoms - 1      # acyclic
    # no overlapping atoms in the template
    d = np.asarray(m.positions)
    dd = np.linalg.norm(d[:, None] - d[None, :], axis=-1) \
        + np.eye(m.n_atoms) * 9
    assert dd.min() > 0.8


def test_pack_octanol_box_counts():
    mols, n_water = pack_octanol_box(24.0, seed=1)
    # reference density: 356/46^3 per A^3, times the 0.85 under-fill
    expect = 356.0 / 46.0 ** 3 * 24.0 ** 3 * 0.85
    assert abs(len(mols) - expect) <= 1
    assert n_water > 0
    # every molecule inside the box
    for m in mols:
        assert np.all(np.asarray(m.positions).mean(0) > -3.0)
        assert np.all(np.asarray(m.positions).mean(0) < 27.0)


def test_log_p_formula():
    # dG_oct more negative than water -> hydrophobic -> positive logP?
    # convention: decoupling dGs; logP = (dG_oct - dG_water)/2.303RT
    assert log_p(0.0, 2.303 * 0.0019872 * 300.0, 300.0) == \
        pytest.approx(1.0, rel=1e-3)


@pytest.mark.slow
def test_run_alchemical_tiny():
    """Miniature end-to-end: small solute, short windows, finite SEM.
    Exercises both phase boxes + the ReplicaFarm lambda batching."""
    from molchanica_tpu.molecules.spec import MolSpec

    # methanol-like CH3-OH (each heavy atom carries <= 3 H)
    solute = MolSpec(
        masses=[12.011, 1.008, 1.008, 1.008, 15.999, 1.008],
        charges=[0.12, 0.04, 0.04, 0.04, -0.60, 0.36],
        lj_sigma=[3.4, 2.47, 2.47, 2.47, 3.07, 0.0],
        lj_eps=[0.11, 0.016, 0.016, 0.016, 0.21, 0.0],
        positions=np.array([[0.0, 0, 0], [0.36, 1.03, 0],
                            [0.36, -0.51, 0.89], [0.36, -0.51, -0.89],
                            [-1.41, 0, 0], [-1.74, -0.9, 0]]),
        bonds=[(0, 1, 340.0, 1.09), (0, 2, 340.0, 1.09),
               (0, 3, 340.0, 1.09), (0, 4, 320.0, 1.41),
               (4, 5, 553.0, 0.96)],
        angles=[(1, 0, 2, 35.0, 1.911), (1, 0, 3, 35.0, 1.911),
                (2, 0, 3, 35.0, 1.911), (1, 0, 4, 50.0, 1.911),
                (2, 0, 4, 50.0, 1.911), (3, 0, 4, 50.0, 1.911),
                (0, 4, 5, 55.0, 1.894)],
        hclusters=[(0, [1, 2, 3], [1.09] * 3), (4, [5], [0.96])])
    res = run_alchemical(
        solute, water_box_side=18.0, octanol_box_side=19.5,
        lambdas=[0.0, 0.5, 1.0], equil_steps=30, prod_steps=60,
        dt_ps=0.001, seed=3,
        cfg_overrides=dict(lj_cutoff=6.0, coulomb_cutoff=6.0,
                           max_init_relaxation_iters=150))
    assert isinstance(res, LogPResult)
    assert np.isfinite(res.logp)
    assert np.isfinite(res.water.dg_kcal_mol)
    assert np.isfinite(res.octanol.dg_kcal_mol)
    assert res.water.dg_sem_kcal_mol >= 0.0
    assert len(res.octanol.windows) == 3
