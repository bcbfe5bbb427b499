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


def test_pharmacophore_reference_scoring_semantics():
    """Reference pharmacophore.rs:868-1175 mechanics: gaussian tolerance,
    bijective claiming, AND/OR relations, coverage penalty, exclusion."""
    from molchanica_tpu.screening.pharmacophore import (
        FeatureRelation, PhScreeningScore, hint_sites, ligand_sites)

    mol = _mol3d("CC(=O)Oc1ccccc1C(=O)O", seed=1)
    sites = ligand_sites(mol)
    assert sites["acceptor"] and sites["aromatic"]
    # aromatic site carries a unit normal
    _, _, ring_idx, normal = sites["aromatic"][0]
    assert ring_idx is not None
    np.testing.assert_allclose(np.linalg.norm(normal), 1.0, atol=1e-9)

    # hint_sites: projected variants draw from the base pool
    hs = hint_sites(PharmacophoreFeatType.ACCEPTOR_PROJECTED, mol)
    assert len(hs) == len(sites["acceptor"])

    # gaussian falloff: exact hit ~1, one sigma away ~0.61
    p = sites["acceptor"][0][0]
    ph = Pharmacophore(features=[PharmacophoreFeat(
        PharmacophoreFeatType.H_BOND_ACCEPTOR, p, radius=1.0)])
    exact = ph.score(mol)
    ph_off = Pharmacophore(features=[PharmacophoreFeat(
        PharmacophoreFeatType.H_BOND_ACCEPTOR, p + np.array([1.0, 0, 0]),
        radius=1.0)])
    off = ph_off.score(mol)
    assert exact > 0.95 and 0.3 < off < exact

    # bijective claim: two features on the SAME acceptor site - the second
    # cannot reuse the claimed atom, so doubling features does not double
    # score
    ph2 = Pharmacophore(features=[
        PharmacophoreFeat(PharmacophoreFeatType.H_BOND_ACCEPTOR, p,
                          radius=1.0),
        PharmacophoreFeat(PharmacophoreFeatType.H_BOND_ACCEPTOR, p,
                          radius=1.0)])
    bd = ph2.score_breakdown(mol)
    assert isinstance(bd, PhScreeningScore)
    assert bd.feat_scores[0] > 0.95
    # second feature matched a DIFFERENT (farther) acceptor or none
    assert bd.feat_scores[1] < bd.feat_scores[0] + 1e-9

    # OR relation keeps the better branch only; AND penalizes a miss
    far = np.array([50.0, 50.0, 50.0])
    ph_or = Pharmacophore(
        features=[PharmacophoreFeat(PharmacophoreFeatType.H_BOND_ACCEPTOR,
                                    p, radius=1.0),
                  PharmacophoreFeat(PharmacophoreFeatType.H_BOND_ACCEPTOR,
                                    far, radius=1.0)],
        feature_relations=[FeatureRelation("or", 0, 1)])
    assert ph_or.score(mol) > 0.9          # missing OR branch suppressed
    ph_and = Pharmacophore(
        features=[PharmacophoreFeat(PharmacophoreFeatType.H_BOND_ACCEPTOR,
                                    p, radius=1.0),
                  PharmacophoreFeat(PharmacophoreFeatType.H_BOND_ACCEPTOR,
                                    far, radius=1.0)],
        feature_relations=[FeatureRelation("and", 0, 1)])
    assert ph_and.score(mol) < ph_or.score(mol)

    # exclusion volume: swallowing the whole ligand zeroes the score
    ph_exc = Pharmacophore(
        features=[PharmacophoreFeat(PharmacophoreFeatType.H_BOND_ACCEPTOR,
                                    p, radius=1.0)],
        exclusion_spheres=[(np.asarray(mol.positions).mean(axis=0), 100.0)])
    assert ph_exc.score(mol) == 0.0

    # serialization round-trips relations/exclusions/projection fields
    ph_or.exclusion_spheres = [(np.zeros(3), 2.0)]
    ph_rt = Pharmacophore.from_json(ph_or.to_json())
    assert len(ph_rt.feature_relations) == 1
    assert len(ph_rt.exclusion_spheres) == 1
    assert "Pharmacophore" in ph_or.summary()


def test_pharmacophore_directional_modulation():
    """Projected donor features score higher along the N-H direction than
    against it (0.7 + 0.3 cos modulation, reference :1060-1070)."""
    from molchanica_tpu.molecules.common import MoleculeCommon

    # minimal N-H fragment: N at origin, H along +x, C anchor along -x
    mol = MoleculeCommon(
        name="frag", elements=["N", "H", "C"],
        positions=np.array([[0.0, 0, 0], [1.0, 0, 0], [-1.5, 0, 0]]),
        bonds=[(0, 1), (0, 2)])
    pos = np.zeros(3)
    aligned = Pharmacophore(features=[PharmacophoreFeat(
        PharmacophoreFeatType.DONOR_PROJECTED, pos, radius=1.0,
        posit_projected=np.array([2.0, 0, 0]))])       # along N->H
    opposed = Pharmacophore(features=[PharmacophoreFeat(
        PharmacophoreFeatType.DONOR_PROJECTED, pos, radius=1.0,
        posit_projected=np.array([-2.0, 0, 0]))])      # against N->H
    assert aligned.score(mol) > opposed.score(mol)
    np.testing.assert_allclose(aligned.score(mol) / opposed.score(mol),
                               1.0 / 0.7, rtol=1e-6)
