"""Headless molecular rendering: scene -> PNG/SVG via matplotlib Agg.

Reference parity: the drawing/render/camera stack (src/drawing/mod.rs
entity generation for atoms/bonds/ribbons/water/H-bonds, src/render.rs:32-44
scene/camera/lighting setup, src/cam.rs free+arc cameras with fog,
src/drawing/atoms_bonds.rs two-tone bonds) re-targeted at offscreen
rasterization instead of a GPU swapchain: the analogous design on a headless
box is primitive generation + painter's-algorithm rasterization.

Design: a `Camera` (orbit camera: target/distance/azimuth/elevation, like
the reference arc cam) projects world points to view space; every visual
element becomes a depth-tagged primitive (sphere -> disc, bond -> two-tone
segment, ribbon -> spline strip, H-bond -> dashed segment); primitives are
depth-sorted back-to-front and drawn in one matplotlib Agg pass with linear
depth cueing (the reference's fog, src/cam.rs).

    from molchanica_tpu.render import render_molecule
    render_molecule(mol, "mol.png")                    # ball-and-stick
    render_molecule(pep, "pep.png", mode="backbone")   # CA ribbon trace

Trajectory frames: `render_snapshot(snap, elements, path)` draws the solute
plus the snapshot's split water arrays (src/md/trajectory.rs:165-181 layout)
as points, matching what the reference viewer draws per frame.
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

import numpy as np

# CPK-family element colors (public standard scheme, as in the reference's
# atom color tables in src/drawing/atoms_bonds.rs)
CPK_COLORS = {
    "H": "#cfcfcf", "C": "#333333", "N": "#2c59c4", "O": "#d32b2b",
    "F": "#7fc97f", "Cl": "#2ca02c", "Br": "#8c2d04", "I": "#6a3d9a",
    "S": "#d9c52b", "P": "#e67e22", "B": "#f4a582", "Na": "#7b68ee",
    "K": "#8a2be2", "Mg": "#0f9b0f", "Ca": "#888800", "Zn": "#7f7f7f",
    "Fe": "#b7410e", "Se": "#ffa100",
}
DEFAULT_COLOR = "#bc80bd"
CHAIN_COLORS = ["#4472c4", "#ed7d31", "#70ad47", "#9e480e", "#997300",
                "#6f30a0", "#2596be", "#c00000"]


def _element_color(el: str) -> str:
    return CPK_COLORS.get(el, DEFAULT_COLOR)


def _display_radius(el: str) -> float:
    from .molecules.elements import VDW_RADII
    return VDW_RADII.get(el, 1.6)


@dataclass
class Camera:
    """Orbit camera (reference arc cam, src/cam.rs): the eye circles a
    target point at `distance`, oriented by azimuth/elevation, with a
    simple perspective divide and linear fog over the depth range."""
    target: np.ndarray = field(default_factory=lambda: np.zeros(3))
    distance: float = 30.0
    azimuth_deg: float = 0.0
    elevation_deg: float = 0.0
    fov_deg: float = 35.0          # vertical field of view
    fog: float = 0.45              # 0 = off, 1 = far atoms fade fully

    def rotation(self) -> np.ndarray:
        """World -> view rotation (view looks down -z)."""
        az = math.radians(self.azimuth_deg)
        el = math.radians(self.elevation_deg)
        # yaw about world y, then pitch about camera x
        cy, sy = math.cos(az), math.sin(az)
        cp, sp = math.cos(el), math.sin(el)
        yaw = np.array([[cy, 0.0, sy], [0.0, 1.0, 0.0], [-sy, 0.0, cy]])
        pitch = np.array([[1.0, 0.0, 0.0], [0.0, cp, sp], [0.0, -sp, cp]])
        return pitch @ yaw

    def view_points(self, pts: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Project [n,3] world points. Returns ([n,2] screen coords in
        view units, [n] depth with larger = nearer, and the per-point
        perspective scale folded into the coords)."""
        p = (np.atleast_2d(pts) - self.target) @ self.rotation().T
        z = p[:, 2] - self.distance          # eye at +distance on view z
        z = np.minimum(z, -1e-3)             # clamp behind-eye points
        persp = -self.distance / z           # 1 at target plane
        xy = p[:, :2] * persp[:, None]
        return xy, -z

    def scale_at(self, pts: np.ndarray) -> np.ndarray:
        """Perspective size multiplier at each point (1 at target plane)."""
        p = (np.atleast_2d(pts) - self.target) @ self.rotation().T
        z = np.minimum(p[:, 2] - self.distance, -1e-3)
        return -self.distance / z

    def orbit(self, d_azimuth_deg: float = 0.0, d_elevation_deg: float = 0.0):
        self.azimuth_deg = (self.azimuth_deg + d_azimuth_deg) % 360.0
        self.elevation_deg = float(
            np.clip(self.elevation_deg + d_elevation_deg, -89.0, 89.0))

    def zoom(self, factor: float):
        self.distance = float(np.clip(self.distance / max(factor, 1e-6),
                                      1.0, 1e5))

    def snap_to(self, pts: np.ndarray, pad: float = 1.35):
        """Frame a point cloud (reference snap-to-mol, src/cam.rs)."""
        pts = np.atleast_2d(np.asarray(pts, float))
        self.target = pts.mean(axis=0)
        r = float(np.linalg.norm(pts - self.target, axis=1).max()) + 2.0
        half_fov = math.radians(self.fov_deg) / 2.0
        self.distance = max(pad * r / math.tan(half_fov), 5.0)


@dataclass
class RenderStyle:
    """Per-entity draw mode (reference MoleculeView modes)."""
    mode: str = "ball_stick"   # ball_stick | sticks | spheres | backbone | points
    atom_scale: float = 0.22   # fraction of vdW radius (ball_stick)
    bond_width: float = 3.2    # pt at the target plane
    show_hydrogens: bool = True
    color_by: str = "element"  # element | chain | uniform
    color: str = "#777777"     # uniform color
    alpha: float = 1.0
    label: str = ""


@dataclass
class _Prim:
    depth: float
    kind: str                  # disc | seg | dash | strip
    data: tuple


class Scene:
    """Collects entities, owns the camera, renders in one pass
    (reference: render() scene setup src/render.rs:94 + per-class entity
    generation src/drawing/mod.rs)."""

    def __init__(self, camera: Optional[Camera] = None,
                 background: str = "#ffffff"):
        self.camera = camera or Camera()
        self.background = background
        self._entities: List[tuple] = []
        self._framed = camera is not None

    # -- entity adders ----------------------------------------------------
    def add_mol(self, mol, style: Optional[RenderStyle] = None):
        """Any MoleculeCommon-like object: .elements, .positions, .bonds,
        optional .atom_names/.chains for backbone mode."""
        self._entities.append(("mol", mol, style or RenderStyle()))

    def add_points(self, pts, color="#5b8dd9", size=2.2, alpha=0.8):
        self._entities.append(("points", np.asarray(pts, float),
                               (color, size, alpha)))

    def add_hbonds(self, segments: Sequence[Tuple[np.ndarray, np.ndarray]],
                   color="#3aa6a6"):
        self._entities.append(("hbonds", list(segments), color))

    def add_box(self, extent, origin=(0.0, 0.0, 0.0), color="#999999"):
        self._entities.append(("box", (np.asarray(origin, float),
                                       np.asarray(extent, float)), color))

    # -- primitive generation ---------------------------------------------
    def _frame_if_needed(self):
        if self._framed:
            return
        pts = []
        for kind, obj, _ in self._entities:
            if kind == "mol":
                pts.append(np.asarray(obj.positions, float))
            elif kind == "points":
                pts.append(obj)
            elif kind == "box":
                o, e = obj
                pts.append(np.stack([o, o + e]))
        if pts:
            self.camera.snap_to(np.concatenate(pts))
            self._framed = True

    def _mol_prims(self, mol, style: RenderStyle, prims: List[_Prim]):
        el = list(mol.elements)
        pos = np.asarray(mol.positions, float)
        keep = np.ones(len(el), bool)
        if not style.show_hydrogens:
            keep = np.array([e != "H" for e in el])
        xy, depth = self.camera.view_points(pos)
        scale = self.camera.scale_at(pos)

        if style.mode == "backbone":
            self._backbone_prims(mol, style, prims)
            return
        if style.mode == "points":
            for i in np.nonzero(keep)[0]:
                prims.append(_Prim(depth[i], "disc",
                                   (xy[i], 0.12 * scale[i],
                                    _element_color(el[i]), style.alpha)))
            return

        # atoms
        r_frac = {"ball_stick": style.atom_scale, "sticks": 0.0,
                  "spheres": 1.0}.get(style.mode, style.atom_scale)
        if r_frac > 0.0:
            for i in np.nonzero(keep)[0]:
                c = (_element_color(el[i]) if style.color_by == "element"
                     else self._chain_color(mol, i, style))
                prims.append(_Prim(depth[i], "disc",
                                   (xy[i], r_frac * _display_radius(el[i])
                                    * scale[i], c, style.alpha)))
        # bonds: split at midpoint, each half in its atom's color
        # (reference two-tone bonds, src/drawing/atoms_bonds.rs)
        for (i, j) in getattr(mol, "bonds", []) or []:
            if not (keep[i] and keep[j]):
                continue
            mid_xy = 0.5 * (xy[i] + xy[j])
            mid_d = 0.5 * (depth[i] + depth[j])
            w = style.bond_width * 0.5 * (scale[i] + scale[j])
            for (a, ca) in ((i, el[i]), (j, el[j])):
                c = (_element_color(ca) if style.color_by == "element"
                     else self._chain_color(mol, a, style))
                prims.append(_Prim(0.5 * (depth[a] + mid_d), "seg",
                                   (xy[a], mid_xy, c, w, style.alpha)))

    def _chain_color(self, mol, i, style: RenderStyle) -> str:
        if style.color_by == "uniform":
            return style.color
        chains = getattr(mol, "chains", None)
        if not chains:
            return style.color
        uniq = sorted(set(chains))
        return CHAIN_COLORS[uniq.index(chains[i]) % len(CHAIN_COLORS)]

    def _backbone_prims(self, mol, style: RenderStyle, prims: List[_Prim]):
        """CA trace as a Catmull-Rom resampled strip per chain (the
        headless stand-in for the reference ribbon mesh,
        src/drawing/ribbon_mesh.rs)."""
        names = getattr(mol, "atom_names", None)
        if names is None:
            return
        chains = getattr(mol, "chains", None) or ["A"] * len(names)
        pos = np.asarray(mol.positions, float)
        for chain in sorted(set(chains)):
            idx = [i for i, (n, c) in enumerate(zip(names, chains))
                   if n == "CA" and c == chain]
            if len(idx) < 2:
                continue
            pts = _catmull_rom(pos[idx], per_seg=8)
            xy, depth = self.camera.view_points(pts)
            scale = self.camera.scale_at(pts)
            color = (style.color if style.color_by == "uniform" else
                     CHAIN_COLORS[sorted(set(chains)).index(chain)
                                  % len(CHAIN_COLORS)])
            for s in range(len(pts) - 1):
                w = 3.2 * style.bond_width * 0.5 * (scale[s] + scale[s + 1])
                prims.append(_Prim(0.5 * (depth[s] + depth[s + 1]), "seg",
                                   (xy[s], xy[s + 1], color, w, style.alpha)))

    # -- rasterization -----------------------------------------------------
    def render(self, path: str, size: Tuple[int, int] = (900, 700),
               dpi: int = 110, title: str = ""):
        """Depth-sort all primitives back-to-front and draw once."""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from matplotlib.collections import LineCollection
        from matplotlib.patches import Circle

        self._frame_if_needed()
        prims: List[_Prim] = []
        for kind, obj, extra in self._entities:
            if kind == "mol":
                self._mol_prims(obj, extra, prims)
            elif kind == "points":
                color, sz, alpha = extra
                xy, depth = self.camera.view_points(obj)
                scale = self.camera.scale_at(obj)
                for i in range(len(obj)):
                    prims.append(_Prim(depth[i], "disc",
                                       (xy[i], 0.06 * sz * scale[i],
                                        color, alpha)))
            elif kind == "hbonds":
                for (a, b) in obj:
                    seg = np.stack([np.asarray(a, float),
                                    np.asarray(b, float)])
                    xy, depth = self.camera.view_points(seg)
                    prims.append(_Prim(float(depth.mean()), "dash",
                                       (xy[0], xy[1], extra, 1.4, 0.9)))
            elif kind == "box":
                (o, e) = obj
                corners = np.array([[o[0] + dx * e[0], o[1] + dy * e[1],
                                     o[2] + dz * e[2]]
                                    for dx in (0, 1) for dy in (0, 1)
                                    for dz in (0, 1)])
                edges = [(0, 1), (0, 2), (0, 4), (3, 1), (3, 2), (3, 7),
                         (5, 1), (5, 4), (5, 7), (6, 2), (6, 4), (6, 7)]
                xy, depth = self.camera.view_points(corners)
                for (a, b) in edges:
                    prims.append(_Prim(float(min(depth[a], depth[b])), "dash",
                                       (xy[a], xy[b], extra, 0.8, 0.6)))

        if not prims:
            raise ValueError("empty scene")
        prims.sort(key=lambda p: p.depth, reverse=True)   # far first
        dmin = min(p.depth for p in prims)
        dmax = max(p.depth for p in prims)
        drange = max(dmax - dmin, 1e-9)

        def fog(color_hex: str, depth: float) -> tuple:
            """Linear depth cue toward the background (reference fog)."""
            t = self.camera.fog * (depth - dmin) / drange
            c = np.array(matplotlib.colors.to_rgb(color_hex))
            bg = np.array(matplotlib.colors.to_rgb(self.background))
            return tuple((1 - t) * c + t * bg)

        w_in, h_in = size[0] / dpi, size[1] / dpi
        fig = plt.figure(figsize=(w_in, h_in), dpi=dpi)
        ax = fig.add_axes([0, 0, 1, 1])
        ax.set_facecolor(self.background)
        fig.patch.set_facecolor(self.background)
        ax.set_aspect("equal")
        ax.axis("off")

        segs, seg_colors, seg_widths, seg_styles = [], [], [], []
        for p in prims:
            if p.kind == "disc":
                xy, r, color, alpha = p.data
                ax.add_patch(Circle(xy, radius=r, facecolor=fog(color, p.depth),
                                    edgecolor="none", alpha=alpha, zorder=3))
            elif p.kind in ("seg", "dash"):
                a, b, color, wpt, alpha = p.data
                segs.append([tuple(a), tuple(b)])
                seg_colors.append((*fog(color, p.depth), alpha))
                seg_widths.append(wpt)
                seg_styles.append("--" if p.kind == "dash" else "-")
        if segs:
            # painter's order is preserved inside one collection
            lc = LineCollection(segs, colors=seg_colors,
                                linewidths=seg_widths, capstyle="round",
                                zorder=2)
            lc.set_linestyle("-")
            ax.add_collection(lc)
            dashed = [i for i, s in enumerate(seg_styles) if s == "--"]
            if dashed:
                ld = LineCollection([segs[i] for i in dashed],
                                    colors=[seg_colors[i] for i in dashed],
                                    linewidths=[seg_widths[i] for i in dashed],
                                    linestyles="--", zorder=4)
                ax.add_collection(ld)

        # fit view to drawn extents (disc edges included) with a margin
        pts = [q for s in segs for q in s]
        for p in prims:
            if p.kind == "disc":
                xy, r = p.data[0], p.data[1]
                pts.extend([(xy[0] - r, xy[1] - r), (xy[0] + r, xy[1] + r)])
        all_xy = np.array(pts)
        lo, hi = all_xy.min(axis=0), all_xy.max(axis=0)
        c, half = (lo + hi) / 2, (hi - lo).max() / 2 * 1.08 + 1e-6
        ax.set_xlim(c[0] - half, c[0] + half)
        ax.set_ylim(c[1] - half, c[1] + half)
        if title:
            ax.text(0.02, 0.98, title, transform=ax.transAxes,
                    va="top", fontsize=9, color="#444444")
        fig.savefig(path, dpi=dpi)
        plt.close(fig)
        return path


def _catmull_rom(pts: np.ndarray, per_seg: int = 8) -> np.ndarray:
    """Centripetal-flavored Catmull-Rom resampling of a polyline."""
    pts = np.asarray(pts, float)
    if len(pts) < 3:
        return pts
    p = np.concatenate([pts[:1], pts, pts[-1:]])
    out = []
    ts = np.linspace(0.0, 1.0, per_seg, endpoint=False)
    for i in range(len(pts) - 1):
        p0, p1, p2, p3 = p[i], p[i + 1], p[i + 2], p[i + 3]
        for t in ts:
            t2, t3 = t * t, t * t * t
            out.append(0.5 * ((2 * p1) + (-p0 + p2) * t
                              + (2 * p0 - 5 * p1 + 4 * p2 - p3) * t2
                              + (-p0 + 3 * p1 - 3 * p2 + p3) * t3))
    out.append(pts[-1])
    return np.asarray(out)


# -- convenience entry points ---------------------------------------------

def render_molecule(mol, path: str, mode: str = "ball_stick",
                    camera: Optional[Camera] = None, size=(900, 700),
                    show_hydrogens: bool = True, title: str = "",
                    color_by: str = "element") -> str:
    """One molecule to one image (the common case)."""
    sc = Scene(camera=camera)
    sc.add_mol(mol, RenderStyle(mode=mode, show_hydrogens=show_hydrogens,
                                color_by=color_by))
    return sc.render(path, size=size, title=title or getattr(mol, "name", ""))


def render_snapshot(snap, elements: Sequence[str], path: str,
                    bonds=None, camera: Optional[Camera] = None,
                    size=(900, 700), title: str = "") -> str:
    """One trajectory frame: solute ball-and-stick + split water arrays as
    points + recorded H-bonds as dashed segments (what the reference viewer
    draws per frame, src/md/viewer.rs:963 draw_mols)."""
    from .molecules.common import MoleculeCommon
    mol = MoleculeCommon(elements=list(elements),
                         positions=np.asarray(snap.atom_posits, float),
                         bonds=list(bonds) if bonds is not None else [])
    sc = Scene(camera=camera)
    sc.add_mol(mol, RenderStyle())
    if snap.water_o_posits is not None and len(snap.water_o_posits):
        sc.add_points(snap.water_o_posits, color="#c23b3b", size=1.6)
        if snap.water_h0_posits is not None:
            sc.add_points(snap.water_h0_posits, color="#bbbbbb", size=0.9)
            sc.add_points(snap.water_h1_posits, color="#bbbbbb", size=0.9)
    if getattr(snap, "hydrogen_bonds", None):
        segs = []
        for hb in snap.hydrogen_bonds:
            d = getattr(hb, "donor_posit", None)
            a = getattr(hb, "acceptor_posit", None)
            if d is not None and a is not None:
                segs.append((d, a))
        if segs:
            sc.add_hbonds(segs)
    if getattr(snap, "box_extent", None) is not None:
        sc.add_box(snap.box_extent)
    t = title or (f"t = {snap.time:.2f} ps" if snap.time is not None else "")
    return sc.render(path, size=size, title=t)
