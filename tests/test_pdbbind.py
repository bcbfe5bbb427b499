"""PDBbind reader + pocket type (reference src/drug_design/pdbbind.rs,
src/molecules/pocket.rs)."""
import numpy as np

from molchanica_tpu.drug_design.pdbbind import (
    load_entries, load_entry, load_index, parse_index_line)
from molchanica_tpu.molecules.common import MoleculeCommon
from molchanica_tpu.molecules.pocket import MoleculePocket


def test_parse_index_rows():
    pid, aff = parse_index_line(
        "2r58  2.00  2007   2.00  Kd=10mM       // 2r58.pdf (MLY)")
    assert pid == "2r58"
    assert aff.kind == "Kd" and aff.relation == "="
    assert abs(aff.molar - 0.01) < 1e-12
    assert aff.resolution == 2.0 and aff.year == 2007
    assert aff.is_regression_quality()

    pid, aff = parse_index_line("1a30  NMR   1998   5.00  Ki=10uM  // ref")
    assert aff.resolution is None and abs(aff.molar - 1e-5) < 1e-18

    pid, aff = parse_index_line("3abc  1.90  2010   7.30  IC50>50nM // x")
    assert aff.kind == "IC50" and not aff.is_exact
    assert not aff.is_regression_quality()

    assert parse_index_line("# PDB code, resolution, release year") is None
    assert parse_index_line("") is None
    assert parse_index_line("1abc 2.0 2001") is None


def _make_release(tmp_path):
    root = tmp_path / "pdbbind"
    (root / "index").mkdir(parents=True)
    (root / "index" / "INDEX_refined_data.2020").write_text(
        "# header\n"
        "1abc  1.80  2005   6.52  Kd=300nM // note\n"
        "2xyz  2.10  2012   4.00  Ki=100uM // note\n")
    for code in ("1abc", "2xyz"):
        d = root / "refined-set" / code
        d.mkdir(parents=True)
        (d / f"{code}_protein.pdb").write_text(
            "ATOM      1  N   ALA A   1       0.000   0.000   0.000"
            "  1.00  0.00           N\nEND\n")
        (d / f"{code}_pocket.pdb").write_text(
            "ATOM      1  CA  ALA A   1       1.000   0.000   0.000"
            "  1.00  0.00           C\n"
            "ATOM      2  CB  ALA A   1       2.000   0.000   0.000"
            "  1.00  0.00           C\nEND\n")
        (d / f"{code}_ligand.sdf").write_text("stub\n")
    return root


def test_release_layout(tmp_path):
    root = _make_release(tmp_path)
    idx = load_index(root)
    assert set(idx) == {"1abc", "2xyz"}
    assert abs(idx["1abc"].p_value - 6.52) < 1e-6
    entries = load_entries(root=root, subset="refined")
    assert [e.pdb_id for e in entries] == ["1abc", "2xyz"]
    e = entries[0]
    assert e.pocket and e.pocket.name == "1abc_pocket.pdb"
    assert e.ligand and e.ligand.suffix == ".sdf"
    assert e.affinity.kind == "Kd"
    assert e.structure_for_pocket_work == e.pocket
    one = load_entry("2XYZ", root=root)
    assert one is not None and one.pdb_id == "2xyz"
    assert load_entry("zzzz", root=root) is None


def test_pocket_from_file_and_cut(tmp_path):
    root = _make_release(tmp_path)
    p = MoleculePocket.from_file(root / "refined-set" / "1abc"
                                 / "1abc_pocket.pdb", pdb_id="1abc")
    assert p.n_atoms == 2
    assert p.source_pdb_id == "1abc"

    rng = np.random.default_rng(0)
    prot = MoleculeCommon(elements=["C"] * 50,
                          positions=rng.uniform(0, 30, (50, 3)))
    center = np.array([15.0, 15.0, 15.0])
    pk = MoleculePocket.cut(prot, center, radius=8.0, whole_residues=False)
    assert 0 < pk.n_atoms < 50
    d = np.linalg.norm(np.asarray(pk.mol.positions) - center, axis=1)
    assert (d <= 8.0 + 1e-9).all()
    c, r = pk.docking_site()
    assert np.allclose(c, center) and r == 8.0
