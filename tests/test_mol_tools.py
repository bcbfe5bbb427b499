"""Conformers, tautomers, GROMACS export."""
import numpy as np
import pytest

from molchanica_tpu.molecules.conformers import generate_conformers
from molchanica_tpu.molecules.smiles import from_smiles
from molchanica_tpu.molecules.tautomers import enumerate_tautomers


def _butanol():
    mol = from_smiles("CCCCO")
    # rough 3D: zig-zag chain with H placement
    from molchanica_tpu.molecules.common import MoleculeCommon
    n = mol.n_atoms
    pos = np.zeros((n, 3))
    heavy = [i for i, e in enumerate(mol.elements) if e != "H"]
    for k, i in enumerate(heavy):
        pos[i] = [1.4 * k, 0.4 * (k % 2), 0.0]
    rng = np.random.default_rng(0)
    adj = mol.adjacency()
    for i, e in enumerate(mol.elements):
        if e == "H":
            parent = adj[i][0]
            d = rng.normal(0, 1, 3)
            pos[i] = pos[parent] + d / np.linalg.norm(d) * 1.09
    mol.positions = pos
    return mol


@pytest.mark.heavy
def test_conformers_generated_and_ranked():
    mol = _butanol()
    cs = generate_conformers(mol, n_conformers=8, seed=1)
    assert cs.coords.shape[0] == 8
    assert np.all(np.diff(cs.energies) >= -1e-3)   # sorted
    assert len(cs.torsions) >= 2                    # C-C rotatables
    f = cs.summary_features()
    assert f.shape == (8,) and np.isfinite(f).all()
    # Boltzmann weights normalize and favor the minimum
    w = cs.boltzmann_weights()
    assert abs(w.sum() - 1.0) < 1e-5 and w[0] == w.max()
    # RMSD dedup returns a subset that keeps the best conformer
    dd = cs.deduplicate(0.3)
    assert 1 <= len(dd.coords) <= len(cs.coords)
    np.testing.assert_allclose(dd.coords[0], cs.coords[0])
    # minimize_best strictly lowers (or keeps) the best energy
    cs2 = generate_conformers(_butanol(), n_conformers=8, seed=1,
                              minimize_best=True)
    assert cs2.energies[0] <= cs.energies[0] + 1e-6


def test_tautomers_keto_enol():
    # acetone: CC(=O)C -> enol CC(O)=C
    mol = from_smiles("CC(=O)C")
    ts = enumerate_tautomers(mol)
    assert len(ts) >= 2
    # one tautomer must have an O-H
    def has_oh(m):
        el = m.elements
        return any(
            {el[i], el[j]} == {"O", "H"} for i, j in m.bonds)
    assert not has_oh(ts[0])
    assert any(has_oh(t) for t in ts[1:])


def test_gromacs_export(tmp_path):
    from molchanica_tpu.io.gromacs import make_gromacs_input, make_mdp
    from molchanica_tpu.md.config import BarostatCfg, Integrator, MdConfig
    from molchanica_tpu.molecules.spec import assemble_system

    mol = _butanol()
    spec = mol.to_spec(strict=False)
    asys = assemble_system([spec], box_extent=np.array([20.0] * 3))
    cfg = MdConfig(integrator=Integrator.verlet_velocity(0.1),
                   barostat_cfg=BarostatCfg())
    mdp = make_gromacs_input(asys, cfg, 1000, 0.002, tmp_path,
                             elements=mol.elements)
    text = mdp.read_text()
    assert "integrator               = md-vv" in text
    assert "coulombtype              = PME" in text
    assert "pcoupl" in text
    top_text = (tmp_path / "md.top").read_text()
    assert "[ atoms ]" in top_text and "[ bonds ]" in top_text
    gro = (tmp_path / "md.gro").read_text()
    assert str(mol.n_atoms) in gro.splitlines()[1]
