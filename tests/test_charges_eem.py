"""QEq/EEM charges (geometry-aware charge inference; SURVEY §2.1
partial_charge_inference stand-in)."""
import numpy as np

from molchanica_tpu.ff.charges_eem import eem_charges


def test_water_polarity():
    e = ["O", "H", "H"]
    x = np.array([[0.0, 0.0, 0.0], [0.96, 0.0, 0.0], [-0.24, 0.93, 0.0]])
    q = eem_charges(e, x)
    assert abs(q.sum()) < 1e-10
    assert q[0] < -0.3            # O clearly negative
    assert q[1] > 0 and q[2] > 0
    assert abs(q[1] - q[2]) < 0.05  # near-symmetric hydrogens


def test_total_charge_constraint_and_ion():
    e = ["N", "H", "H", "H", "H"]   # ammonium-like
    x = np.array([[0, 0, 0], [1, 0, 0], [-0.33, 0.94, 0],
                  [-0.33, -0.47, 0.82], [-0.33, -0.47, -0.82]], float)
    q = eem_charges(e, x, total_charge=1.0)
    assert abs(q.sum() - 1.0) < 1e-10
    assert (q[1:] > 0).all()


def test_electronegativity_ordering():
    # H-F more polar than H-C at the same distance
    qf = eem_charges(["F", "H"], [[0, 0, 0], [0.92, 0, 0]])
    qc = eem_charges(["C", "H"], [[0, 0, 0], [1.09, 0, 0]])
    assert qf[0] < qc[0] - 0.1
    # symmetric molecule -> symmetric charges
    qs = eem_charges(["O", "C", "O"],
                     [[-1.16, 0, 0], [0, 0, 0], [1.16, 0, 0]])
    assert abs(qs[0] - qs[2]) < 1e-9 and qs[1] > 0


def test_geometry_sensitivity():
    # stretching a bond reduces charge separation (1/r coupling decays)
    q1 = eem_charges(["O", "H"], [[0, 0, 0], [0.96, 0, 0]])
    q2 = eem_charges(["O", "H"], [[0, 0, 0], [3.0, 0, 0]])
    assert abs(q2[0]) != abs(q1[0])   # geometry-aware (Gasteiger is not)
