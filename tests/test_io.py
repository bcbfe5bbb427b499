"""File-format round-trips: SDF, MOL2, PDB, XYZ, GRO, DCD."""
import numpy as np
import pytest

from molchanica_tpu.io import (
    open_file,
    read_dcd,
    read_gro,
    read_mol2,
    read_pdb,
    read_sdf,
    read_xyz,
    write_dcd,
    write_gro,
    write_mol2,
    write_pdb,
    write_sdf,
    write_xyz,
)
from molchanica_tpu.molecules.common import MoleculeCommon


@pytest.fixture
def mol():
    return MoleculeCommon(
        elements=["C", "C", "O", "H", "H", "H", "H", "H", "H"],
        positions=np.array([
            [0.0, 0.0, 0.0], [1.53, 0.0, 0.0], [2.0, 1.3, 0.0],
            [-0.4, 1.0, 0.0], [-0.4, -0.5, 0.9], [-0.4, -0.5, -0.9],
            [1.9, -0.5, 0.9], [1.9, -0.5, -0.9], [2.9, 1.3, 0.2]]),
        bonds=[(0, 1), (1, 2), (0, 3), (0, 4), (0, 5), (1, 6), (1, 7),
               (2, 8)],
        bond_orders=[1.0] * 8,
        name="ethanol",
        formal_charges=[0] * 9,
    )


def test_sdf_roundtrip(mol, tmp_path):
    p = tmp_path / "m.sdf"
    write_sdf(mol, p)
    m2 = read_sdf(p)
    assert m2.elements == mol.elements
    np.testing.assert_allclose(m2.positions, mol.positions, atol=1e-3)
    assert sorted(m2.bonds) == sorted(mol.bonds)


def test_mol2_roundtrip(mol, tmp_path):
    mol.charges = np.linspace(-0.4, 0.4, 9)
    p = tmp_path / "m.mol2"
    write_mol2(mol, p)
    m2 = read_mol2(p)
    assert m2.elements == mol.elements
    np.testing.assert_allclose(m2.positions, mol.positions, atol=1e-3)
    np.testing.assert_allclose(m2.charges, mol.charges, atol=1e-3)


def test_pdb_roundtrip(mol, tmp_path):
    p = tmp_path / "m.pdb"
    write_pdb(mol, p)
    m2 = read_pdb(p)
    assert m2.elements == mol.elements
    np.testing.assert_allclose(m2.positions, mol.positions, atol=1e-3)
    assert sorted(m2.bonds) == sorted(mol.bonds)  # CONECT preserved


def test_xyz_roundtrip(mol, tmp_path):
    p = tmp_path / "m.xyz"
    write_xyz(mol, p)
    m2 = read_xyz(p)
    assert m2.elements == mol.elements
    np.testing.assert_allclose(m2.positions, mol.positions, atol=1e-5)


def test_gro_roundtrip(mol, tmp_path):
    p = tmp_path / "m.gro"
    box = np.array([20.0, 22.0, 24.0])
    write_gro(p, mol.elements, positions=mol.positions, box_extent=box)
    m2, box2 = read_gro(p)
    np.testing.assert_allclose(box2, box, atol=1e-2)
    np.testing.assert_allclose(m2.positions, mol.positions, atol=1e-2)


def test_dcd_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    frames = rng.uniform(0, 30, (5, 17, 3)).astype(np.float32)
    box = np.array([30.0, 30.0, 30.0])
    p = tmp_path / "t.dcd"
    write_dcd(p, frames, box_extent=box)
    f2, cells = read_dcd(p)
    assert f2.shape == frames.shape
    np.testing.assert_allclose(f2, frames, atol=1e-5)
    np.testing.assert_allclose(cells[0], box, atol=1e-6)


def test_open_file_dispatch(mol, tmp_path):
    p = tmp_path / "m.sdf"
    write_sdf(mol, p)
    m2 = open_file(p)
    assert m2.n_atoms == 9
    with pytest.raises(ValueError):
        open_file(tmp_path / "m.unknown")


def test_bond_inference(mol):
    m = MoleculeCommon(elements=mol.elements,
                       positions=mol.positions)
    m.infer_bonds()
    assert sorted(m.bonds) == sorted(mol.bonds)
