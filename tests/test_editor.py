"""Mol editor with live MD (reference src/mol_editor/mod.rs:330-347)."""
import pytest
import numpy as np

from molchanica_tpu.molecules.common import MoleculeCommon
from molchanica_tpu.molecules.editor import MolEditor


def test_edit_build_methane():
    ed = MolEditor()
    c = ed.add_atom("C")
    ed.add_hydrogens(c, count=4)
    m = ed.mol
    assert m.elements == ["C", "H", "H", "H", "H"]
    assert len(m.bonds) == 4
    pos = np.asarray(m.positions)
    d = np.linalg.norm(pos[1:] - pos[0], axis=1)
    assert np.all(d > 0.9) and np.all(d < 1.3)
    # H-H angles roughly tetrahedral
    v = pos[1:] - pos[0]
    v /= np.linalg.norm(v, axis=1)[:, None]
    cosijs = [v[i] @ v[j] for i in range(4) for j in range(i + 1, 4)]
    assert np.allclose(cosijs, -1.0 / 3.0, atol=0.12)


def test_delete_and_bond_edits():
    ed = MolEditor(MoleculeCommon(
        elements=["C", "C", "O"],
        positions=np.array([[0.0, 0, 0], [1.5, 0, 0], [3.0, 0, 0]]),
        bonds=[(0, 1), (1, 2)]))
    ed.delete_atom(1)
    assert ed.mol.elements == ["C", "O"]
    assert ed.mol.bonds == []          # bonds through the deleted atom go
    ed.add_bond(0, 1)
    assert ed.mol.bonds == [(0, 1)]
    ed.delete_bond(0, 1)
    assert ed.mol.bonds == []


@pytest.mark.heavy
def test_live_md_relaxes_while_editing():
    ed = MolEditor(dt_ps=0.0005, steps_per_tick=5)
    c = ed.add_atom("C")
    c2 = ed.add_atom("C", bond_to=c)
    ed.add_hydrogens(c, count=3)
    ed.add_hydrogens(c2, count=3)
    # stretch one H artificially; live MD should pull it back toward C
    pos = np.asarray(ed.mol.positions)
    pos[1] = pos[0] + (pos[1] - pos[0]) * 1.6
    ed.mol.positions = pos
    d0 = np.linalg.norm(ed.mol.positions[1] - ed.mol.positions[0])
    ed.start()
    for _ in range(6):
        ed.md_step()
    d1 = np.linalg.norm(
        np.asarray(ed.mol.positions)[1] - np.asarray(ed.mol.positions)[0])
    assert d1 < d0 - 0.1               # bond relaxing back
    # edit mid-run: add another atom; sim rebuilds lazily and keeps going
    ed.add_atom("O", bond_to=1)
    ed.md_step()
    assert ed.mol.n_atoms == 9
    assert np.isfinite(np.asarray(ed.mol.positions)).all()
