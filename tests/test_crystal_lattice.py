"""Crystal lattice builders (reference src/crystal.rs:453)."""
import numpy as np

from molchanica_tpu.molecules.crystal_lattice import (
    DIAMOND_LATTICE_A, build_diamond, build_graphite, build_nacl)


def test_diamond_geometry():
    m = build_diamond(reps=(2, 2, 2))
    assert m.n_atoms == 8 * 8
    assert all(e == "C" for e in m.elements)
    # nearest-neighbor distance = a * sqrt(3)/4 = 1.5445 A
    d_nn = DIAMOND_LATTICE_A * np.sqrt(3) / 4
    pos = np.asarray(m.positions)
    d01 = [np.linalg.norm(pos[i] - pos[j]) for i, j in m.bonds]
    assert np.allclose(d01, d_nn, atol=1e-6)
    # interior atoms are 4-coordinated
    deg = np.zeros(m.n_atoms)
    for i, j in m.bonds:
        deg[i] += 1
        deg[j] += 1
    assert deg.max() == 4


def test_graphite_geometry():
    m = build_graphite(reps=(3, 3, 1))
    pos = np.asarray(m.positions)
    # in-plane bond length a/sqrt(3) = 1.4209 A; no inter-layer bonds
    d = [np.linalg.norm(pos[i] - pos[j]) for i, j in m.bonds]
    assert len(d) > 0
    assert np.allclose(d, 2.461 / np.sqrt(3), atol=1e-6)
    z = pos[:, 2]
    for i, j in m.bonds:
        assert abs(z[i] - z[j]) < 1e-9     # bonds stay within one sheet


def test_nacl_geometry():
    m = build_nacl(reps=(2, 2, 2))
    assert m.n_atoms == 64
    assert m.elements.count("Na") == 32 and m.elements.count("Cl") == 32
    assert m.bonds == []                   # ionic: no covalent bonds
    pos = np.asarray(m.positions)
    # nearest Na-Cl distance = a/2
    na = pos[[k for k, e in enumerate(m.elements) if e == "Na"]]
    cl = pos[[k for k, e in enumerate(m.elements) if e == "Cl"]]
    dmin = np.min(np.linalg.norm(na[:, None, :] - cl[None, :, :], axis=-1))
    assert abs(dmin - 5.640 / 2) < 1e-6
