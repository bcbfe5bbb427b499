"""Amber prmtop/inpcrd import (production-exact parameter path)."""
import numpy as np
import pytest

from molchanica_tpu.io.prmtop import (
    AMBER_CHARGE_SCALE, read_inpcrd, read_prmtop)

# A minimal hand-built prmtop: ethane-like 2 heavy + 2 H, 2 atom types.
# sigma/eps chosen so ACOEF/BCOEF invert exactly:
#   A = 4 eps sig^12, B = 4 eps sig^6
SIG_C, EPS_C = 3.4, 0.109
SIG_H, EPS_H = 2.6, 0.0157


def _coef(sig, eps):
    return 4 * eps * sig ** 12, 4 * eps * sig ** 6


def _fixture_text():
    a_c, b_c = _coef(SIG_C, EPS_C)
    a_h, b_h = _coef(SIG_H, EPS_H)
    # type pair table (2 types): index matrix 2x2 -> entries 1..3
    # diag: (1,1)->1, (2,2)->3; off-diag 2
    a_ch, b_ch = _coef(0.5 * (SIG_C + SIG_H), np.sqrt(EPS_C * EPS_H))
    q = np.array([-0.3, 0.3, 0.1, -0.1]) * AMBER_CHARGE_SCALE
    return f"""%VERSION  VERSION_STAMP = V0001.000
%FLAG POINTERS
%FORMAT(10I8)
       4       2       1       1       1       0       1       0       0       0
      10       1       1       1       1       1       1       1       2       0
       0       0       0       0       0       0       0       1       0       0
       0
%FLAG ATOM_NAME
%FORMAT(20a4)
C1  C2  H1  H2
%FLAG CHARGE
%FORMAT(5E16.8)
  {q[0]:.8E}  {q[1]:.8E}  {q[2]:.8E}  {q[3]:.8E}
%FLAG MASS
%FORMAT(5E16.8)
  1.20110000E+01  1.20110000E+01  1.00800000E+00  1.00800000E+00
%FLAG ATOM_TYPE_INDEX
%FORMAT(10I8)
       1       1       2       2
%FLAG NONBONDED_PARM_INDEX
%FORMAT(10I8)
       1       2       2       3
%FLAG LENNARD_JONES_ACOEF
%FORMAT(5E16.8)
  {a_c:.8E}  {a_ch:.8E}  {a_h:.8E}
%FLAG LENNARD_JONES_BCOEF
%FORMAT(5E16.8)
  {b_c:.8E}  {b_ch:.8E}  {b_h:.8E}
%FLAG BOND_FORCE_CONSTANT
%FORMAT(5E16.8)
  3.10000000E+02
%FLAG BOND_EQUIL_VALUE
%FORMAT(5E16.8)
  1.52600000E+00
%FLAG ANGLE_FORCE_CONSTANT
%FORMAT(5E16.8)
  5.00000000E+01
%FLAG ANGLE_EQUIL_VALUE
%FORMAT(5E16.8)
  1.91100000E+00
%FLAG DIHEDRAL_FORCE_CONSTANT
%FORMAT(5E16.8)
  1.40000000E-01
%FLAG DIHEDRAL_PERIODICITY
%FORMAT(5E16.8)
  3.00000000E+00
%FLAG DIHEDRAL_PHASE
%FORMAT(5E16.8)
  0.00000000E+00
%FLAG SCEE_SCALE_FACTOR
%FORMAT(5E16.8)
  1.20000000E+00
%FLAG SCNB_SCALE_FACTOR
%FORMAT(5E16.8)
  2.00000000E+00
%FLAG BONDS_INC_HYDROGEN
%FORMAT(10I8)
       0       6       1       3       9       1
%FLAG BONDS_WITHOUT_HYDROGEN
%FORMAT(10I8)
       0       3       1
%FLAG ANGLES_INC_HYDROGEN
%FORMAT(10I8)
       6       0       3       1
%FLAG DIHEDRALS_INC_HYDROGEN
%FORMAT(10I8)
       6       0       3       9       1
%FLAG NUMBER_EXCLUDED_ATOMS
%FORMAT(10I8)
       2       1       1       0
%FLAG EXCLUDED_ATOMS_LIST
%FORMAT(10I8)
       2       3       4       4
"""


def test_read_prmtop(tmp_path):
    p = tmp_path / "t.prmtop"
    p.write_text(_fixture_text())
    spec = read_prmtop(str(p))
    assert spec.n_atoms == 4
    np.testing.assert_allclose(spec.charges, [-0.3, 0.3, 0.1, -0.1],
                               atol=1e-7)
    np.testing.assert_allclose(spec.masses[2], 1.008)
    np.testing.assert_allclose(spec.lj_sigma, [SIG_C, SIG_C, SIG_H, SIG_H],
                               rtol=1e-7)
    np.testing.assert_allclose(spec.lj_eps, [EPS_C, EPS_C, EPS_H, EPS_H],
                               rtol=1e-7)
    # bonds: C1-C2 heavy, C1-H1 and C2-H2 with H
    assert len(spec.bonds) == 3
    assert (0, 1, 310.0, 1.526) in [tuple(b) for b in spec.bonds]
    assert len(spec.angles) == 1
    assert len(spec.dihedrals) == 1
    # the 1-4 pair (H1, H2) with the scale factors
    assert [tuple(p[:2]) for p in spec.pairs14] == [(2, 3)]
    assert spec.pairs14[0][2] == pytest.approx(1.2)
    # H clusters for SHAKE
    assert len(spec.hclusters) == 2


@pytest.mark.heavy
def test_prmtop_md_runs(tmp_path):
    import jax
    from molchanica_tpu.md.config import Integrator, MdConfig
    from molchanica_tpu.md.engine import MdSim
    from molchanica_tpu.molecules.spec import assemble_system

    p = tmp_path / "t.prmtop"
    p.write_text(_fixture_text())
    spec = read_prmtop(str(p))
    spec.positions = np.array([[0.0, 0, 0], [1.53, 0, 0],
                               [-0.5, 0.9, 0], [2.0, -0.9, 0]])
    asys = assemble_system([spec])
    cfg = MdConfig(integrator=Integrator.langevin_middle(gamma=2.0),
                   temp_target=300.0, dtype="float64",
                   max_init_relaxation_iters=100, seed=1)
    sim = MdSim(asys.topology, cfg, asys.positions)
    sim.step(0.001, 100)
    assert np.isfinite(float(sim.state.pe_last))


def test_read_inpcrd(tmp_path):
    txt = """title
     3
  1.00000000  2.00000000  3.00000000  4.00000000  5.00000000  6.00000000
  7.00000000  8.00000000  9.00000000
"""
    p = tmp_path / "t.inpcrd"
    p.write_text(txt)
    coords, box = read_inpcrd(str(p))
    assert coords.shape == (3, 3)
    np.testing.assert_allclose(coords[2], [7.0, 8.0, 9.0])
