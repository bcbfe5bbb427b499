"""Rigid + flexible alignment."""
import numpy as np
import pytest

from molchanica_tpu.molecules.alignment import (
    flexible_align,
    kabsch,
    rigid_align,
)
from molchanica_tpu.molecules.smiles import from_smiles


def _rot(angle, axis=2):
    c, s = np.cos(angle), np.sin(angle)
    R = np.eye(3)
    a, b = (axis + 1) % 3, (axis + 2) % 3
    R[a, a] = c; R[a, b] = -s; R[b, a] = s; R[b, b] = c
    return R


def _mol3d(smiles, seed=0):
    mol = from_smiles(smiles)
    rng = np.random.default_rng(seed)
    n = mol.n_atoms
    pos = np.zeros((n, 3))
    adj = mol.adjacency()
    placed = {0}
    stack = [0]
    while stack:
        u = stack.pop()
        for v in adj[u]:
            if v not in placed:
                d = rng.normal(0, 1, 3)
                pos[v] = pos[u] + d / np.linalg.norm(d) * (
                    1.09 if "H" in (mol.elements[u], mol.elements[v])
                    else 1.5)
                placed.add(v)
                stack.append(v)
    mol.positions = pos
    return mol


def test_kabsch_exact():
    rng = np.random.default_rng(0)
    P = rng.normal(0, 3, (12, 3))
    R0 = _rot(0.7, 0) @ _rot(-0.3, 2)
    Q = P @ R0.T + np.array([1.0, -2.0, 3.0])
    R, t, rmsd = kabsch(P, Q)
    assert rmsd < 1e-10
    np.testing.assert_allclose(R, R0, atol=1e-10)


def test_rigid_align_recovers_pose():
    mol = _mol3d("CCO", seed=1)
    import copy
    tmpl = copy.copy(mol)
    tmpl.positions = mol.positions @ _rot(1.1).T + np.array([5.0, 1.0, -2.0])
    res = rigid_align(mol, tmpl)
    assert res.rmsd < 1e-6
    np.testing.assert_allclose(res.positions, tmpl.positions, atol=1e-6)


@pytest.mark.heavy
def test_flexible_align_pulls_toward_template():
    mol = _mol3d("CCCO", seed=2)
    import copy
    tmpl = copy.copy(mol)
    tmpl.positions = mol.positions @ _rot(0.8, 1).T + np.array([3.0, 0, 0])
    res = flexible_align(mol, tmpl, n_steps=150, k_pull=30.0)
    assert np.isfinite(res.positions).all()
    assert res.rmsd < 1.0     # pulled close to the template sites
