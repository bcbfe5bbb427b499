"""MD-shooting dock (reference docking/mod.rs dock())."""
import numpy as np
import pytest

from molchanica_tpu.docking.shoot import ShootResult, dock_md
from molchanica_tpu.molecules.peptide import prepare_peptide
from molchanica_tpu.molecules.peptide_builder import build_peptide
from molchanica_tpu.molecules.smiles import from_smiles


@pytest.mark.slow
def test_shoot_approaches_and_binds():
    rec = prepare_peptide(build_peptide("AVLFA"))
    lig = from_smiles("CCO").to_spec(strict=False)
    from molchanica_tpu.md.config import HydrogenConstraint
    res = dock_md(rec, lig, n_steps=800, dt_ps=0.0005, speed=40.0,
                  cfg_overrides=dict(
                      dtype="float64",
                      hydrogen_constraint=HydrogenConstraint.shake()))
    assert isinstance(res, ShootResult)
    assert np.isfinite(res.interaction_trace).all()
    # the ligand must have approached the site from 8 A out
    assert res.min_site_distance < 7.5
    # some attractive contact found along the trajectory
    assert res.best_interaction_kcal < 2.0
