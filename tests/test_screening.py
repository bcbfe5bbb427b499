"""Pharmacophore models + screening."""
import numpy as np
import pytest

from molchanica_tpu.molecules.smiles import from_smiles
from molchanica_tpu.screening import (
    Pharmacophore,
    PharmacophoreFeat,
    PharmacophoreFeatType,
    auto_pharmacophore,
    screen_ligs,
)


def _mol3d(smiles, seed=0):
    mol = from_smiles(smiles)
    rng = np.random.default_rng(seed)
    n = mol.n_atoms
    pos = np.zeros((n, 3))
    adj = mol.adjacency()
    placed = {0}
    pos[0] = 0
    stack = [0]
    while stack:
        u = stack.pop()
        for v in adj[u]:
            if v not in placed:
                d = rng.normal(0, 1, 3)
                bond_len = 1.09 if mol.elements[v] == "H" or \
                    mol.elements[u] == "H" else 1.5
                pos[v] = pos[u] + d / np.linalg.norm(d) * bond_len
                placed.add(v)
                stack.append(v)
    mol.positions = pos
    return mol


def test_auto_pharmacophore_and_serialization():
    mol = _mol3d("CC(=O)Oc1ccccc1C(=O)O", seed=1)
    ph = auto_pharmacophore(mol, max_features=5)
    assert 2 <= len(ph.features) <= 5
    types = {f.feat_type for f in ph.features}
    assert PharmacophoreFeatType.H_BOND_ACCEPTOR in types \
        or PharmacophoreFeatType.H_BOND_DONOR in types
    text = ph.to_json()
    ph2 = Pharmacophore.from_json(text)
    assert len(ph2.features) == len(ph.features)
    np.testing.assert_allclose(ph2.features[0].position,
                               ph.features[0].position)


def test_self_score_is_high():
    mol = _mol3d("Oc1ccccc1N", seed=2)
    ph = auto_pharmacophore(mol)
    s = ph.score(mol)
    assert s > 0.6     # a ligand matches its own pharmacophore


def test_screen_ranks_matching_ligand_first(tmp_path):
    ref = _mol3d("Oc1ccccc1N", seed=3)       # aminophenol-ish
    decoy = _mol3d("CCCCCCCC", seed=4)       # alkane: no polar features
    ph = auto_pharmacophore(ref)
    hits = screen_ligs(ph, [ref, decoy], n_conformers=2, align=False)
    assert hits[0].score >= hits[-1].score
    by_name = {h.name: h.score for h in hits}
    ref_score = ph.score(ref)
    assert ref_score > 0.5


def test_screen_directory(tmp_path):
    from molchanica_tpu.io import write_sdf
    m1 = _mol3d("CCO", seed=5)
    m1.name = "ethanol"
    m2 = _mol3d("CCC", seed=6)
    m2.name = "propane"
    write_sdf(m1, tmp_path / "a.sdf")
    write_sdf(m2, tmp_path / "b.sdf")
    ph = auto_pharmacophore(m1)
    hits = screen_ligs(ph, tmp_path, n_conformers=2, align=True)
    assert len(hits) == 2
