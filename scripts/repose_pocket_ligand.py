"""Re-pose the committed pocket ligand against the committed receptor.

The pocket_fixture.pdb receptor is good; the ligand SDF from the original
make_pocket_fixture.py run carried un-recentered coordinates (~1e6 A,
overflowing V2000 fixed-width fields). This re-derives the ligand pose
from the committed receptor with the same lowest-density-direction
placement, then writes a valid SDF. Offline, deterministic, seconds.
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "molchanica_tpu", "systems", "data")


def main():
    from molchanica_tpu.io.pdb import read_pdb
    from molchanica_tpu.io.sdf import write_sdf
    from molchanica_tpu.molecules.smiles import from_smiles

    rec = read_pdb(os.path.join(OUT, "pocket_fixture.pdb"))
    x = np.asarray(rec.positions, np.float64)
    com = x.mean(0)

    # lowest atom-density direction from the centroid = widest surface
    # cavity approach vector (same scoring as make_pocket_fixture.py)
    dirs = np.random.default_rng(3).normal(size=(256, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    rel = x - com
    proj = rel @ dirs.T
    score = (proj > 0.6 * np.linalg.norm(rel, axis=1, keepdims=True)).sum(0)
    d = dirs[np.argmin(score)]
    surf_r = np.percentile(np.linalg.norm(rel, axis=1), 85)

    lig = from_smiles("CC(C)Cc1ccc(cc1)C(C)C(=O)O")        # ibuprofen
    lx = np.asarray(lig.positions)
    lx = lx - lx.mean(0) + com + d * (surf_r + 1.5)
    assert np.abs(lx).max() < 1e4, "pose out of field range - refusing"
    lig.positions = lx
    path = os.path.join(OUT, "pocket_ligand.sdf")
    write_sdf(lig, path)
    print(f"wrote {path}  (|pos|max {np.abs(lx).max():.1f} A, "
          f"min receptor distance "
          f"{np.linalg.norm(lx[:, None] - x[None], axis=-1).min():.2f} A)")


if __name__ == "__main__":
    main()
