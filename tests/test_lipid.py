"""Procedural lipid + membrane builder (reference lipid.rs)."""
import numpy as np
import pytest

from molchanica_tpu.molecules.lipid import (
    AREA_PER_LIPID_PC, build_pc_lipid, make_membrane)


def test_lipid_zwitterionic_neutral():
    m = build_pc_lipid()
    assert m.n_atoms > 100
    np.testing.assert_allclose(float(np.sum(m.charges)), 0.0, atol=1e-10)
    # one P, one N
    assert sum(1 for x in m.masses if 30 < x < 32) == 1
    assert sum(1 for x in m.masses if 13 < x < 15) == 1
    # amphiphile: P above the tail carbons
    d = np.asarray(m.positions)
    pz = d[[i for i, x in enumerate(m.masses) if 30 < x < 32][0], 2]
    tail_z = np.percentile(d[:, 2], 10)
    assert pz > tail_z + 5.0


def test_membrane_bilayer_geometry():
    mols, box = make_membrane(3, 3)
    assert len(mols) == 18
    np.testing.assert_allclose(box[0], 3 * np.sqrt(AREA_PER_LIPID_PC),
                               rtol=1e-6)
    # two leaflets: per-lipid P-atom z clusters into two bands
    pz = []
    for m in mols:
        pi = [i for i, x in enumerate(m.masses) if 30 < x < 32][0]
        pz.append(np.asarray(m.positions)[pi, 2])
    pz = np.sort(pz)
    assert pz[8] < pz[9] - 10.0          # clear gap between leaflets
    # all inside the box
    allp = np.concatenate([np.asarray(m.positions) for m in mols])
    assert allp[:, 2].min() > 0 and allp[:, 2].max() < box[2]


@pytest.mark.heavy
def test_membrane_md_short():
    """A tiny dry bilayer patch must survive capped MD."""
    from molchanica_tpu.md.config import (
        HydrogenConstraint, Integrator, MdConfig)
    from molchanica_tpu.md.engine import MdSim
    from molchanica_tpu.molecules.spec import assemble_system

    mols, box = make_membrane(2, 2, tail_carbons=8)
    asys = assemble_system(mols, box_extent=box, seed=1)
    cfg = MdConfig(integrator=Integrator.langevin_middle(gamma=5.0),
                   temp_target=310.0, lj_cutoff=7.0, coulomb_cutoff=7.0,
                   hydrogen_constraint=HydrogenConstraint.shake(),
                   dtype="float64", max_init_relaxation_iters=200,
                   steps_per_chunk=50, seed=4)
    sim = MdSim(asys.topology, cfg, asys.positions,
                box_extent=asys.box_extent)
    sim.step(0.001, 100, force_cap=1000.0)
    assert np.isfinite(float(sim.state.pe_last))
    assert sim.temperature() < 2000.0
