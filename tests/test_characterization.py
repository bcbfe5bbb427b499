"""MolCharacterization + SMILES on known molecules."""
import numpy as np
import pytest

from molchanica_tpu.molecules.characterization import characterize
from molchanica_tpu.molecules.common import MoleculeCommon
from molchanica_tpu.molecules.smiles import from_smiles, to_smiles


def _benzene():
    el = ["C"] * 6 + ["H"] * 6
    bonds = [(i, (i + 1) % 6) for i in range(6)] + \
        [(i, i + 6) for i in range(6)]
    orders = [1.5] * 6 + [1.0] * 6
    ang = np.linspace(0, 2 * np.pi, 6, endpoint=False)
    pos = np.zeros((12, 3))
    pos[:6, 0] = 1.39 * np.cos(ang)
    pos[:6, 1] = 1.39 * np.sin(ang)
    pos[6:, 0] = 2.47 * np.cos(ang)
    pos[6:, 1] = 2.47 * np.sin(ang)
    return MoleculeCommon(elements=el, positions=pos, bonds=bonds,
                          bond_orders=orders)


def _aspirin_like():
    # acetylsalicylic-ish from SMILES (topology-only)
    return from_smiles("CC(=O)Oc1ccccc1C(=O)O")


def test_benzene_characterization():
    c = characterize(_benzene())
    assert len(c.rings) == 1 and len(c.rings[0]) == 6
    assert c.n_aromatic_rings == 1
    assert c.rotatable_bonds == []
    assert c.h_bond_donors == 0
    assert c.f_csp3 == 0.0
    assert abs(c.tpsa) < 1e-9
    assert 1.0 < c.clogp < 3.5        # benzene logP ~ 2.1


def test_aspirin_characterization():
    mol = _aspirin_like()
    c = characterize(mol)
    assert c.n_aromatic_rings == 1
    assert c.functional_groups.carboxylic_acid >= 1
    assert c.functional_groups.ester >= 1
    assert c.h_bond_acceptors >= 3
    assert c.h_bond_donors >= 1
    assert 30.0 < c.tpsa < 90.0       # aspirin TPSA = 63.6
    assert len(c.rotatable_bonds) >= 2
    v = c.feature_vector()
    assert v.shape == (40,) and np.isfinite(v).all()


def test_smiles_roundtrip_topology():
    mol = _benzene()
    smi = to_smiles(mol)
    assert smi.count("c") == 6        # aromatic carbons
    mol2 = from_smiles(smi)
    assert sum(1 for e in mol2.elements if e == "C") == 6
    c2 = characterize(mol2)
    assert c2.n_aromatic_rings == 1


def test_smiles_reader_ethanol():
    mol = from_smiles("CCO")
    assert mol.elements[:3] == ["C", "C", "O"]
    assert mol.elements.count("H") == 6      # implicit H completed
    smi = to_smiles(mol)
    assert smi == "CCO"


def test_smiles_branches_and_rings():
    mol = from_smiles("CC(C)Cc1ccc(cc1)C(C)C(=O)O")   # ibuprofen
    c = characterize(mol)
    assert c.n_aromatic_rings == 1
    assert c.functional_groups.carboxylic_acid == 1
    s = to_smiles(mol)
    mol2 = from_smiles(s)
    assert len(mol2.elements) == len(mol.elements)
    assert len(mol2.bonds) == len(mol.bonds)
