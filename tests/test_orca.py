"""ORCA input generation + output parsing (reference src/orca.rs)."""
import numpy as np

from molchanica_tpu.io.orca import (HARTREE_TO_KCAL, OrcaTask, make_input,
                                    parse_final_energy, parse_mbis_charges,
                                    parse_optimized_geometry,
                                    parse_xyz_trajectory)

WATER = (["O", "H", "H"],
         np.array([[0.0, 0.0, 0.0], [0.96, 0.0, 0.0], [-0.24, 0.93, 0.0]]))


def test_make_input_tasks():
    e, x = WATER
    sp = make_input(e, x, OrcaTask(task="single_point"))
    assert sp.startswith("! r2SCAN-3c SP")
    assert "* xyz 0 1" in sp and sp.count("\n  O ") == 1

    opt = make_input(e, x, OrcaTask(task="geometry_optimization"))
    assert "Opt" in opt.splitlines()[0]

    mbis = make_input(e, x, OrcaTask(task="mbis_charges"))
    assert "P_MBIS_Charges" in mbis

    md = make_input(e, x, OrcaTask(task="mol_dynamics", md_steps=50,
                                   md_dt_fs=0.5, md_temp_k=310.0))
    assert "%md" in md and "run 50" in md and "310.0_K" in md


def test_parse_outputs():
    out = """
some header
FINAL SINGLE POINT ENERGY      -76.32894512
...
CARTESIAN COORDINATES (ANGSTROEM)
---------------------------------
  O      0.000000    0.000000    0.000000
  H      0.961000    0.010000    0.000000
  H     -0.240000    0.930000    0.000000

FINAL SINGLE POINT ENERGY      -76.32991040
"""
    e = parse_final_energy(out)
    assert abs(e - (-76.32991040 * HARTREE_TO_KCAL)) < 1e-6
    g = parse_optimized_geometry(out)
    assert g is not None
    elems, pos = g
    assert elems == ["O", "H", "H"]
    assert abs(pos[1, 0] - 0.961) < 1e-9

    mbis = parse_mbis_charges("""
MBIS ANALYSIS
--------------
  ATOM   CHARGE    ...
   0 O   -0.68210   1.0
   1 H    0.34105   1.0
   2 H    0.34105   1.0
""")
    assert mbis is not None and abs(mbis.sum()) < 1e-6


def test_parse_xyz_trajectory():
    txt = """3
frame 0
O 0.0 0.0 0.0
H 0.9 0.0 0.0
H -0.2 0.9 0.0
3
frame 1
O 0.0 0.0 0.1
H 0.9 0.0 0.1
H -0.2 0.9 0.1
"""
    frames = parse_xyz_trajectory(txt)
    assert len(frames) == 2
    assert frames[1][1][0, 2] == 0.1
