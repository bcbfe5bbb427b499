"""Real-protein pipeline: structure file -> prepared peptide -> stable MD.

Covers the reference's prepare_peptide_mmcif / filter_peptide_atoms /
populate_hydrogens surface (/root/reference/src/md/mod.rs:172,1076) with
the embedded ff14SB-family subset.
"""
import numpy as np
import pytest

from molchanica_tpu.io.mmcif import read_mmcif, write_mmcif
from molchanica_tpu.molecules.peptide import (
    PeptideError, filter_peptide_atoms, prepare_peptide)
from molchanica_tpu.molecules.peptide_builder import build_peptide

SEQ = "ASGVLFKWPHTY"   # all chemistries: aromatic, ring, charged, polar


@pytest.fixture(scope="module")
def prepared():
    mol = build_peptide(SEQ)
    # round-trip through mmCIF (heavy atoms only, like a real download)
    write_mmcif(mol, "/tmp/_pep_test.cif")
    mol2 = read_mmcif("/tmp/_pep_test.cif")
    return prepare_peptide(mol2)


def test_builder_covers_all_residues():
    mol = build_peptide("ACDEFGHIKLMNPQRSTVWY")
    assert mol.n_atoms > 150
    assert len(set(mol.res_names)) == 20


def test_prepare_counts_and_charge(prepared):
    spec = prepared
    # hydrogens populated: H fraction ~half of a protein's atoms
    n_h = int(sum(1 for m in spec.masses if m < 2.0))
    assert n_h >= spec.n_atoms * 0.4
    # LYS+1, HIS neutral (HIE), charged termini cancel -> net +1
    np.testing.assert_allclose(float(np.sum(spec.charges)), 1.0,
                               atol=1e-6)


def test_prepare_geometry_sane(prepared):
    spec = prepared
    d = np.asarray(spec.positions)
    n = len(d)
    dd = np.linalg.norm(d[:, None, :] - d[None, :, :], axis=-1) \
        + np.eye(n) * 9
    bonded = set((min(i, j), max(i, j)) for (i, j, k, r0) in spec.bonds)
    clashes = [(dd[i, j], i, j) for i in range(n) for j in range(i + 1, n)
               if dd[i, j] < 0.8 and (i, j) not in bonded]
    assert not clashes, clashes[:5]
    errs = [abs(np.linalg.norm(d[i] - d[j]) - r0)
            for (i, j, k, r0) in spec.bonds]
    assert max(errs) < 0.5, max(errs)


@pytest.mark.heavy
def test_peptide_md_stable(prepared):
    from molchanica_tpu.md.config import (
        HydrogenConstraint, Integrator, MdConfig)
    from molchanica_tpu.md.engine import MdSim
    from molchanica_tpu.molecules.spec import assemble_system

    asys = assemble_system([prepared])
    cfg = MdConfig(
        integrator=Integrator.langevin_middle(gamma=5.0),
        temp_target=300.0,
        hydrogen_constraint=HydrogenConstraint.shake(),
        dtype="float64", max_init_relaxation_iters=400, seed=3)
    sim = MdSim(asys.topology, cfg, asys.positions)
    sim.step(0.001, 300)
    t = sim.temperature()
    assert np.isfinite(float(sim.state.pe_last))
    assert 100.0 < t < 700.0, t
    real = np.asarray(asys.topology.atom_mask) > 0
    x = np.asarray(sim.state.positions)[real[: asys.topology.n_atoms]]
    assert np.isfinite(x).all()
    # molecule held together: max extent bounded
    assert np.ptp(x, axis=0).max() < 120.0


def test_filter_drops_hetero():
    from molchanica_tpu.molecules.common import MoleculeCommon
    mol = build_peptide("AG")
    # append a fake water
    mol2 = MoleculeCommon(
        elements=mol.elements + ["O"],
        positions=np.concatenate([mol.positions, [[50.0, 50, 50]]]),
        atom_names=mol.atom_names + ["O"],
        res_names=mol.res_names + ["HOH"],
        res_ids=mol.res_ids + [99],
        chains=mol.chains + ["A"],
        hetero=mol.hetero + [True])
    f = filter_peptide_atoms(mol2)
    assert f.n_atoms == mol.n_atoms


def test_prepare_rejects_nonpeptide():
    from molchanica_tpu.molecules.common import MoleculeCommon
    m = MoleculeCommon(elements=["C"], positions=np.zeros((1, 3)),
                       res_names=["LIG"], res_ids=[1], chains=["A"],
                       atom_names=["C1"], hetero=[True])
    with pytest.raises(PeptideError):
        prepare_peptide(m)
