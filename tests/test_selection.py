"""PyMol-style selection model (reference src/selection.rs)."""
import numpy as np
import pytest

from molchanica_tpu.molecules.common import MoleculeCommon
from molchanica_tpu.selection import SelectionError, select, select_indices


def _mol():
    m = MoleculeCommon(
        elements=["N", "C", "C", "O", "H", "N", "C", "C", "O", "O"],
        positions=np.array([[float(i), 0.0, 0.0] for i in range(10)]))
    m.atom_names = ["N", "CA", "C", "O", "H", "N", "CA", "C", "O", "OXT"]
    m.res_names = ["ALA"] * 5 + ["GLY"] * 5
    m.res_ids = [1] * 5 + [2] * 5
    m.chains = ["A"] * 5 + ["B"] * 5
    m.hetero = [False] * 9 + [True]
    return m


def test_basic_fields():
    m = _mol()
    assert select_indices(m, "resn ALA") == [0, 1, 2, 3, 4]
    assert select_indices(m, "resn GLY+ALA") == list(range(10))
    assert select_indices(m, "resi 2") == [5, 6, 7, 8, 9]
    assert select_indices(m, "elem O") == [3, 8, 9]
    assert select_indices(m, "name CA") == [1, 6]
    assert select_indices(m, "chain B") == [5, 6, 7, 8, 9]
    assert select_indices(m, "hydro") == [4]
    assert select_indices(m, "hetatm") == [9]
    assert select_indices(m, "index 0-2+7") == [0, 1, 2, 7]


def test_boolean_logic():
    m = _mol()
    assert select_indices(m, "resn ALA and elem C") == [1, 2]
    assert select_indices(m, "resn ALA elem C") == [1, 2]   # implicit AND
    assert select_indices(m, "name CA or name OXT") == [1, 6, 9]
    assert select_indices(m, "not chain A") == [5, 6, 7, 8, 9]
    assert select_indices(m, "(resn ALA or resn GLY) and elem N") == [0, 5]
    assert select_indices(m, "polymer and not hydro") == \
        [0, 1, 2, 3, 5, 6, 7, 8]


def test_within_and_byres():
    m = _mol()
    # atoms within 1.5 A of atom index 0 (positions are 1 A apart on x)
    assert select_indices(m, "within 1.5 of index 0") == [0, 1]
    # byres expands to the whole residue
    assert select_indices(m, "byres name OXT") == [5, 6, 7, 8, 9]
    assert select_indices(m, "byres (within 0.5 of index 3)") == \
        [0, 1, 2, 3, 4]


def test_errors():
    m = _mol()
    with pytest.raises(SelectionError):
        select(m, "resn")
    with pytest.raises(SelectionError):
        select(m, "frobnicate X")
    with pytest.raises(SelectionError):
        select(m, "(resn ALA")
