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


def test_xtc_roundtrip(tmp_path):
    from molchanica_tpu.io.xtc import XtcFrame, write_xtc, read_xtc
    rng = np.random.default_rng(3)
    p = tmp_path / "t.xtc"
    frames = [
        XtcFrame(step=10 * i, time_ps=0.002 * i,
                 box_extent=np.array([28.0, 30.0, 32.0]),
                 positions=rng.uniform(0, 30, (150, 3)))
        for i in range(4)
    ]
    write_xtc(frames, p)
    back = read_xtc(p)
    assert len(back) == 4
    for a, b in zip(frames, back):
        assert b.step == a.step
        assert abs(b.time_ps - a.time_ps) < 1e-6
        np.testing.assert_allclose(b.box_extent, a.box_extent, atol=1e-4)
        # precision=1000/nm -> 0.001 nm = 0.01 A quantization
        np.testing.assert_allclose(b.positions, a.positions, atol=6e-3)


def test_xtc_small_frame_uncompressed(tmp_path):
    from molchanica_tpu.io.xtc import XtcFrame, write_xtc, read_xtc
    pos = np.array([[0.0, 1.0, 2.0], [3.0, 4.0, 5.0]])
    data = write_xtc([XtcFrame(step=0, time_ps=0.0, box_extent=None,
                               positions=pos)])
    back = read_xtc(data)
    assert back[0].box_extent is None
    np.testing.assert_allclose(back[0].positions, pos, atol=1e-4)


def test_xtc_trajectory_save_load(tmp_path):
    from molchanica_tpu.md.trajectory import Trajectory
    from molchanica_tpu.md.snapshot import Snapshot
    rng = np.random.default_rng(7)
    snaps = [Snapshot(time=k * 0.002,
                      atom_posits=rng.uniform(0, 20, (40, 3)),
                      box_extent=np.array([20.0, 20.0, 20.0]))
             for k in range(3)]
    traj = Trajectory.from_memory(snaps)
    p = str(tmp_path / "t.xtc")
    traj.save_xtc(p)
    t2 = Trajectory.open(p)
    assert t2.n_frames == 3
    back = t2.load_snaps()
    np.testing.assert_allclose(back[2].atom_posits,
                               snaps[2].atom_posits, atol=6e-3)
