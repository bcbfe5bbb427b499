"""Force-field front end: parsers, typing, charges, full to_spec pipeline."""
import math

import numpy as np
import pytest

from molchanica_tpu.ff import FfParamSet, merge_params, parse_dat, parse_frcmod
from molchanica_tpu.ff.charges import gasteiger_charges
from molchanica_tpu.ff.typing_gaff import assign_gaff_types

FRCMOD = """test frcmod
MASS
zz 12.010

BOND
zz-c3  310.0   1.520

ANGLE
zz-c3-c3   60.0   111.0

DIHE
zz-c3-c3-c3   1    0.20         0.0     -3.0
zz-c3-c3-c3   1    0.25       180.0      2.0

IMPROPER
c -o -zz-o          10.5       180.0     2.0

NONBON
  zz  1.9000  0.1000
"""


def test_parse_frcmod():
    p = parse_frcmod(FRCMOD)
    assert p.masses["zz"] == 12.010
    assert p.bond("zz", "c3") == (310.0, 1.520)
    assert p.bond("c3", "zz") == (310.0, 1.520)   # symmetric lookup
    k, t0 = p.angle("zz", "c3", "c3")
    np.testing.assert_allclose(t0, 111.0 * math.pi / 180)
    terms = p.dihedral("zz", "c3", "c3", "c3")
    assert len(terms) == 2                         # negative-PN continuation
    np.testing.assert_allclose(terms[0].k, 0.20)
    np.testing.assert_allclose(terms[1].phase, math.pi)
    imp = p.improper("c", "o", "zz", "o")
    assert imp and imp[0].k == 10.5
    sig, eps = p.lj_sigma_eps("zz")
    np.testing.assert_allclose(sig, 1.9 * 2 / 2 ** (1 / 6))


DAT = """PARM test dat
C  12.01
H  1.008
OH 16.00

C   H   OH

C -C   310.0    1.526
C -OH  320.0    1.410

C -C -C    40.0      109.50
C -C -OH   50.0      109.50

X -C -C -X    9    1.40          0.0             3.0

X -X -C -OH        1.1          180.0           2.0

HW  OW  0000.     0000.

N   NA  N2

MOD4      RE
  C     1.9080  0.1094
  H     0.6000  0.0157
  OH    1.7210  0.2104
END
"""


def test_parse_dat():
    p = parse_dat(DAT)
    assert p.masses["C"] == 12.01
    assert p.bond("C", "OH") == (320.0, 1.410)
    assert p.angle("C", "C", "OH")[0] == 50.0
    terms = p.dihedral("H", "C", "C", "H")       # matches X-C-C-X
    np.testing.assert_allclose(terms[0].k, 1.40 / 9)
    assert p.equivalences["NA"] == "N"
    assert p.lj("C") == (1.9080, 0.1094)


def test_merge_params():
    base = parse_dat(DAT)
    patch = parse_frcmod(FRCMOD)
    m = merge_params(base, patch)
    assert m.bond("C", "OH") == (320.0, 1.410)
    assert m.bond("zz", "c3") == (310.0, 1.520)


def test_gaff_typing_ethanol():
    # C C O + hydrogens
    elements = ["C", "C", "O", "H", "H", "H", "H", "H", "H"]
    bonds = [(0, 1), (1, 2), (0, 3), (0, 4), (0, 5), (1, 6), (1, 7), (2, 8)]
    t = assign_gaff_types(elements, bonds)
    assert t[0] == "c3" and t[1] == "c3" and t[2] == "oh"
    assert t[3] == "hc"        # CH3 hydrogens: no EW neighbors
    assert t[6] == "h1"        # CH2 next to O
    assert t[8] == "ho"


def test_gaff_typing_benzene_and_carbonyl():
    # benzene ring
    el = ["C"] * 6 + ["H"] * 6
    bonds = [(i, (i + 1) % 6) for i in range(6)] + [(i, 6 + i)
                                                    for i in range(6)]
    orders = [1.5] * 6 + [1.0] * 6
    t = assign_gaff_types(el, bonds, orders)
    assert all(v == "ca" for v in t[:6])
    assert all(v == "ha" for v in t[6:])
    # acetic acid: C(=O)OH
    el = ["C", "C", "O", "O", "H", "H", "H", "H"]
    bonds = [(0, 1), (1, 2), (1, 3), (0, 4), (0, 5), (0, 6), (3, 7)]
    orders = [1.0, 2.0, 1.0, 1.0, 1.0, 1.0, 1.0]
    t = assign_gaff_types(el, bonds, orders)
    assert t[1] == "c"     # carbonyl carbon
    assert t[2] == "o"     # carbonyl O
    assert t[3] == "oh"    # hydroxyl O


def test_gasteiger_charges():
    elements = ["C", "C", "O", "H", "H", "H", "H", "H", "H"]
    bonds = [(0, 1), (1, 2), (0, 3), (0, 4), (0, 5), (1, 6), (1, 7), (2, 8)]
    q = gasteiger_charges(elements, bonds)
    np.testing.assert_allclose(q.sum(), 0.0, atol=1e-9)  # neutral
    assert q[2] < -0.2                # O strongly negative
    assert q[8] > 0.1                 # hydroxyl H positive
    assert abs(q[3]) < 0.1            # CH3 hydrogens mild


@pytest.mark.heavy
def test_full_pipeline_sdf_to_md(tmp_path):
    """open SDF -> type -> charges -> params -> vacuum MD: the end-to-end
    small-molecule CADD path."""
    import jax.numpy as jnp
    from molchanica_tpu.io import write_sdf
    from molchanica_tpu.md.config import HydrogenConstraint, Integrator, MdConfig
    from molchanica_tpu.md.engine import MdSim
    from molchanica_tpu.molecules.common import MoleculeCommon
    from molchanica_tpu.molecules.spec import assemble_system

    mol = MoleculeCommon(
        elements=["C", "C", "O", "H", "H", "H", "H", "H", "H"],
        positions=np.array([
            [0.0, 0.0, 0.0], [1.53, 0.0, 0.0], [2.0, 1.3, 0.0],
            [-0.4, 1.0, 0.0], [-0.4, -0.5, 0.9], [-0.4, -0.5, -0.9],
            [1.9, -0.5, 0.9], [1.9, -0.5, -0.9], [2.9, 1.3, 0.2]]),
        bonds=[(0, 1), (1, 2), (0, 3), (0, 4), (0, 5), (1, 6), (1, 7),
               (2, 8)],
    )
    spec = mol.to_spec(strict=True)
    assert len(spec.bonds) == 8
    assert len(spec.angles) == 13
    assert len(spec.hclusters) == 3
    asys = assemble_system([spec])
    cfg = MdConfig(integrator=Integrator.langevin_middle(gamma=2.0),
                   temp_target=300.0, dtype="float64",
                   max_init_relaxation_iters=200, zero_com_drift=False,
                   seed=4)
    sim = MdSim(asys.topology, cfg, asys.positions)
    sim.step(0.002, 100)
    assert 10.0 < sim.temperature() < 1500.0
    x = np.asarray(sim.state.positions)[:9]
    assert np.isfinite(x).all()
    d01 = np.linalg.norm(x[0] - x[1])
    assert 1.3 < d01 < 1.8       # C-C bond intact
