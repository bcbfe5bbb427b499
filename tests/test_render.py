"""Headless rendering layer (render.py) — the drawing/render/camera analog.

Reference parity: src/render.rs (scene/camera setup), src/drawing/mod.rs
(atoms/bonds/ribbon/water/H-bond entity generation), src/cam.rs (arc camera
+ fog). Everything here is host-side numpy + matplotlib Agg.
"""
import os

import numpy as np
import pytest

from molchanica_tpu.molecules.common import MoleculeCommon
from molchanica_tpu.render import (
    Camera, RenderStyle, Scene, _catmull_rom, render_molecule,
    render_snapshot)


def _ethanol():
    from molchanica_tpu.molecules.embed import embed_3d
    from molchanica_tpu.molecules.smiles import from_smiles
    mol = from_smiles("CCO")
    embed_3d(mol)
    return mol


def test_camera_projection_geometry():
    cam = Camera(target=np.zeros(3), distance=10.0)
    # the target projects to the origin at unit scale
    xy, depth = cam.view_points(np.zeros((1, 3)))
    assert np.allclose(xy, 0.0)
    assert np.isclose(depth[0], 10.0)
    # a point nearer the eye gets a larger perspective scale
    s_near = cam.scale_at(np.array([[0.0, 0.0, 3.0]]))[0]
    s_far = cam.scale_at(np.array([[0.0, 0.0, -3.0]]))[0]
    assert s_near > 1.0 > s_far
    # orbiting 90 deg about y moves a +x point onto the view axis
    cam.orbit(d_azimuth_deg=90.0)
    xy, _ = cam.view_points(np.array([[5.0, 0.0, 0.0]]))
    assert abs(xy[0, 0]) < 1e-6


def test_camera_snap_to_frames_cloud():
    cam = Camera()
    pts = np.random.RandomState(0).normal(size=(50, 3)) * 8.0 + 100.0
    cam.snap_to(pts)
    assert np.allclose(cam.target, pts.mean(axis=0))
    xy, _ = cam.view_points(pts)
    # everything lands within the frustum half-width at the target plane
    half = cam.distance * np.tan(np.radians(cam.fov_deg) / 2)
    assert np.abs(xy).max() < half * 1.05


def test_catmull_rom_interpolates_endpoints():
    pts = np.array([[0.0, 0, 0], [1, 1, 0], [2, 0, 0], [3, 1, 0]])
    out = _catmull_rom(pts, per_seg=4)
    assert np.allclose(out[0], pts[0])
    assert np.allclose(out[-1], pts[-1])
    assert len(out) == 3 * 4 + 1
    # control points are on the curve
    d = np.linalg.norm(out[:, None] - pts[None], axis=-1).min(axis=0)
    assert d.max() < 1e-9


def test_render_molecule_ball_stick(tmp_path):
    mol = _ethanol()
    out = str(tmp_path / "ethanol.png")
    render_molecule(mol, out)
    assert os.path.getsize(out) > 5000          # a real raster, not a stub
    # header says PNG
    with open(out, "rb") as f:
        assert f.read(8) == b"\x89PNG\r\n\x1a\n"


@pytest.mark.parametrize("mode", ["sticks", "spheres", "points"])
def test_render_modes(tmp_path, mode):
    mol = _ethanol()
    out = str(tmp_path / f"{mode}.png")
    render_molecule(mol, out, mode=mode)
    assert os.path.getsize(out) > 2000


def test_render_backbone_trace(tmp_path):
    from molchanica_tpu.molecules.peptide_builder import build_peptide
    pep = build_peptide("AAGAS")
    out = str(tmp_path / "pep.png")
    render_molecule(pep, out, mode="backbone")
    assert os.path.getsize(out) > 2000


def test_render_snapshot_with_water_and_box(tmp_path):
    from molchanica_tpu.md.snapshot import Snapshot
    rs = np.random.RandomState(1)
    snap = Snapshot(
        time=1.25,
        atom_posits=rs.normal(size=(5, 3)) * 2.0 + 10.0,
        water_o_posits=rs.uniform(0, 20, size=(30, 3)),
        water_h0_posits=rs.uniform(0, 20, size=(30, 3)),
        water_h1_posits=rs.uniform(0, 20, size=(30, 3)),
        box_extent=np.array([20.0, 20.0, 20.0]))
    out = str(tmp_path / "frame.png")
    render_snapshot(snap, ["C", "C", "O", "N", "H"], out,
                    bonds=[(0, 1), (1, 2), (1, 3)])
    assert os.path.getsize(out) > 5000


def test_scene_hbonds_and_chain_colors(tmp_path):
    mol = MoleculeCommon(
        elements=["N", "C", "C", "O"],
        positions=np.array([[0.0, 0, 0], [1.4, 0, 0],
                            [2.8, 0.4, 0], [3.9, -0.3, 0.2]]),
        bonds=[(0, 1), (1, 2), (2, 3)],
        chains=["A", "A", "B", "B"])
    sc = Scene()
    sc.add_mol(mol, RenderStyle(color_by="chain"))
    sc.add_hbonds([(mol.positions[0], mol.positions[3])])
    out = str(tmp_path / "hb.png")
    sc.render(out)
    assert os.path.getsize(out) > 2000


def test_cli_camera_and_render_verbs(tmp_path):
    from molchanica_tpu.cli import CliState, handle_cmd
    st = CliState()
    handle_cmd(st, "load smiles:CCO")
    before = np.asarray(st.active_mol().positions, float).copy()
    handle_cmd(st, "move 1 2 3")
    after = np.asarray(st.active_mol().positions, float)
    assert np.allclose(after - before, [1.0, 2.0, 3.0])
    handle_cmd(st, "rotate z 90")
    # centroid invariant under rotation about the centroid
    assert np.allclose(after.mean(0),
                       np.asarray(st.active_mol().positions).mean(0))
    out = handle_cmd(st, "orient")
    assert "framed" in out
    handle_cmd(st, "turn x 45")
    handle_cmd(st, "zoom 1.5")
    png = str(tmp_path / "cli.png")
    msg = handle_cmd(st, f"png {png}")
    assert "wrote" in msg and os.path.getsize(png) > 2000
