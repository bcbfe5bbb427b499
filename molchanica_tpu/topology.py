"""Static topology pytree: the compiled-in description of a simulated system.

This is the TPU-native analog of what the reference's `dynamics` crate builds
inside `MdState::new` (/root/reference/src/md/mod.rs:689): per-atom force-field
assignments plus bonded index lists. Everything is a fixed-shape array so the
whole object can be closed over by jit; padding rows carry zero force constants
and sentinel indices.

Functional forms (Amber family, matching the reference's force field per
README.md:225-232 and the CUDA device functions in
/root/reference/src/cuda/util.cu):

  bond      : k (r - r0)^2
  angle     : k (theta - theta0)^2
  dihedral  : k (1 + cos(n phi - phase))      (impropers use the same form)
  LJ        : 4 eps ((sigma/r)^12 - (sigma/r)^6), Lorentz-Berthelot mixing
  Coulomb   : COULOMB_CONST q_i q_j / r

Exclusions: 1-2 and 1-3 pairs are fully excluded; 1-4 pairs are scaled by
1/scee (Coulomb) and 1/scnb (LJ) and handled on a dedicated pair list.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class Topology:
    # --- per-atom static properties ---
    masses: jnp.ndarray       # [N] amu; padding atoms get mass 1, mask 0
    charges: jnp.ndarray      # [N] e
    lj_sigma: jnp.ndarray     # [N] A
    lj_eps: jnp.ndarray       # [N] kcal/mol
    atom_mask: jnp.ndarray    # [N] 1.0 real atom / 0.0 padding
    dof_mask: jnp.ndarray     # [N] 1.0 integrated dof / 0.0 virtual-site,
                              # frozen ("static_" in the reference docking
                              # plan, src/docking/mod.rs:240-263) or padding
    mol_id: jnp.ndarray       # [N] int32 molecule index
    # --- bonded terms (index rows padded with 0, masked) ---
    bond_idx: jnp.ndarray     # [B,2] int32
    bond_k: jnp.ndarray       # [B]
    bond_r0: jnp.ndarray      # [B]
    angle_idx: jnp.ndarray    # [A,3] int32
    angle_k: jnp.ndarray      # [A]
    angle_theta0: jnp.ndarray # [A] radians
    dihedral_idx: jnp.ndarray # [D,4] int32 (proper + improper, one row/term)
    dihedral_k: jnp.ndarray   # [D] kcal/mol (already divided by IDIVF)
    dihedral_n: jnp.ndarray   # [D] periodicity (float for cos(n*phi))
    dihedral_phase: jnp.ndarray  # [D] radians
    # --- nonbonded exclusions ---
    excl_idx: jnp.ndarray     # [E,2] int32 fully-excluded pairs (1-2, 1-3)
    excl_mask: jnp.ndarray    # [E]
    pair14_idx: jnp.ndarray   # [P,2] int32
    pair14_mask: jnp.ndarray  # [P]
    pair14_scee: jnp.ndarray  # [P] coulomb divisor per pair (usually 1.2)
    pair14_scnb: jnp.ndarray  # [P] LJ divisor per pair (usually 2.0)
    # --- alchemical ---
    couple_mask: jnp.ndarray  # [N] 1.0 = scaled by lambda machinery when the
                              # atom's molecule is being decoupled, else 0.0
    # --- water block (rigid 3-site + virtual 4th site layout) ---
    # Waters occupy a contiguous index range [water_start, N_real); each water
    # is (O, H1, H2[, M]) consecutive. water_site_count is 0 (no water), 3, 4.
    water_start: int = struct.field(pytree_node=False, default=0)
    water_count: int = struct.field(pytree_node=False, default=0)
    water_site_count: int = struct.field(pytree_node=False, default=0)
    # OPC/TIP-style geometry for SETTLE + M-site placement
    water_r_oh: float = struct.field(pytree_node=False, default=0.0)
    water_theta_hoh: float = struct.field(pytree_node=False, default=0.0)
    water_r_om: float = struct.field(pytree_node=False, default=0.0)
    # --- virtual sites (OPC/TIP4P water M sites) ---
    # M = O + w * ((H1 - O) + (H2 - O)); exact for rigid water geometry.
    # Energy functions recompute M from (O,H1,H2) so autodiff redistributes
    # M-site forces onto the real atoms (the JAX-native vsite force transfer).
    vsite_idx: jnp.ndarray = None     # [V,4] int32 (m, o, h1, h2); -1 pad
    vsite_weight: jnp.ndarray = None  # [V]
    vsite_mask: jnp.ndarray = None    # [V]
    # --- H-constraint clusters (heavy atom + up to 3 bonded hydrogens) ---
    hcluster_heavy: jnp.ndarray = None  # [C] int32 heavy-atom index
    hcluster_h: jnp.ndarray = None      # [C,3] int32 H indices (-1 pad)
    hcluster_r0: jnp.ndarray = None     # [C,3] target bond lengths
    n_atoms_real: int = struct.field(pytree_node=False, default=0)
    n_mol: int = struct.field(pytree_node=False, default=1)

    @property
    def n_atoms(self) -> int:
        return self.masses.shape[0]


def _pad2(a: np.ndarray, n: int, fill) -> np.ndarray:
    if a.shape[0] >= n:
        return a[:n]
    pad = np.full((n - a.shape[0],) + a.shape[1:], fill, dtype=a.dtype)
    return np.concatenate([a, pad], axis=0)


def make_topology(
    masses,
    charges,
    lj_sigma,
    lj_eps,
    bonds=None,          # list of (i, j, k, r0)
    angles=None,         # list of (i, j, k, k_theta, theta0)
    dihedrals=None,      # list of (i, j, k, l, k_phi, n, phase)
    pairs14=None,        # list of (i, j) or (i, j, scee, scnb)
    exclusions=None,     # list of (i, j) fully excluded; if None, derived
    mol_id=None,
    couple_mask=None,
    pad_atoms_to: Optional[int] = None,
    pad_terms_to_multiple: int = 128,
    dtype=jnp.float32,
    water_start: int = 0,
    water_count: int = 0,
    water_site_count: int = 0,
    water_geometry=(0.0, 0.0, 0.0),
    hclusters=None,      # list of (heavy, [h...], [r0...])
    dof_mask=None,       # per-atom; default: 1 for real atoms
    vsites=None,         # list of (m, o, h1, h2, weight)
) -> Topology:
    """Build a fixed-shape Topology from host-side python/numpy data.

    If `exclusions` is None they are derived from bonds (1-2) and angles (1-3);
    if `pairs14` is None they are derived from dihedral end atoms not already
    excluded.
    """
    masses = np.asarray(masses, np.float64)
    n_real = masses.shape[0]
    n = pad_atoms_to or n_real
    assert n >= n_real

    bonds = list(bonds or [])
    angles = list(angles or [])
    dihedrals = list(dihedrals or [])

    if exclusions is None:
        excl = set()
        for b in bonds:
            i, j = int(b[0]), int(b[1])
            excl.add((min(i, j), max(i, j)))
        for a in angles:
            i, k = int(a[0]), int(a[2])
            excl.add((min(i, k), max(i, k)))
        exclusions = sorted(excl)
    else:
        exclusions = sorted({(min(int(i), int(j)), max(int(i), int(j)))
                             for i, j in exclusions})
    excl_set = set(exclusions)

    if pairs14 is None:
        p14 = set()
        for d in dihedrals:
            i, l = int(d[0]), int(d[3])
            key = (min(i, l), max(i, l))
            if key not in excl_set and i != l:
                p14.add(key)
        pairs14 = sorted(p14)
    pairs14_full = []
    for p in pairs14:
        if len(p) == 2:
            pairs14_full.append((p[0], p[1], 1.2, 2.0))
        else:
            pairs14_full.append(tuple(p))

    def padded_len(k):
        m = pad_terms_to_multiple
        return max(m, ((k + m - 1) // m) * m)

    def term_arrays(rows, ncol_idx, val_cols):
        k = len(rows)
        kp = padded_len(k)
        idx = np.zeros((kp, ncol_idx), np.int32)
        vals = [np.zeros((kp,), np.float64) for _ in val_cols]
        mask_implicit = np.zeros((kp,), np.float64)
        for r, row in enumerate(rows):
            idx[r] = [int(v) for v in row[:ncol_idx]]
            for c in range(len(val_cols)):
                vals[c][r] = float(row[ncol_idx + c])
            mask_implicit[r] = 1.0
        return idx, vals, mask_implicit

    b_idx, (b_k, b_r0), _ = term_arrays(bonds, 2, ["k", "r0"])
    a_idx, (a_k, a_t0), _ = term_arrays(angles, 3, ["k", "t0"])
    d_idx, (d_k, d_n, d_ph), _ = term_arrays(dihedrals, 4, ["k", "n", "ph"])
    e_idx, _, e_mask = term_arrays([(i, j, 0.0) for i, j in exclusions], 2, ["z"])
    p_idx, (p_scee, p_scnb), p_mask = term_arrays(pairs14_full, 2, ["scee", "scnb"])
    # padded 1-4 divisors must be nonzero to avoid 0/0
    p_scee[p_mask == 0] = 1.0
    p_scnb[p_mask == 0] = 1.0

    atom_mask = np.zeros((n,), np.float64)
    atom_mask[:n_real] = 1.0
    if mol_id is None:
        mol_id = np.zeros((n_real,), np.int32)
    mol_id = _pad2(np.asarray(mol_id, np.int32), n, 0)
    n_mol = int(mol_id.max()) + 1 if n_real else 1
    if couple_mask is None:
        couple_mask = np.zeros((n_real,), np.float64)

    if dof_mask is None:
        dof_mask = np.ones((n_real,), np.float64)
    dof_mask = np.asarray(dof_mask, np.float64).copy()

    # virtual sites
    vsites = list(vsites or [])
    v = len(vsites)
    vp = padded_len(v) if v else pad_terms_to_multiple
    vs_idx = np.full((vp, 4), 0, np.int32)
    vs_w = np.zeros((vp,), np.float64)
    vs_mask = np.zeros((vp,), np.float64)
    for r, (m_i, o_i, h1_i, h2_i, w) in enumerate(vsites):
        vs_idx[r] = (m_i, o_i, h1_i, h2_i)
        vs_w[r] = w
        vs_mask[r] = 1.0
        dof_mask[m_i] = 0.0  # M sites are not integrated dofs

    # H-constraint clusters
    hclusters = list(hclusters or [])
    c = len(hclusters)
    cp = padded_len(c) if c else pad_terms_to_multiple
    hc_heavy = np.zeros((cp,), np.int32)
    hc_h = np.full((cp, 3), -1, np.int32)
    hc_r0 = np.zeros((cp, 3), np.float64)
    for r, (heavy, hs, r0s) in enumerate(hclusters):
        hc_heavy[r] = heavy
        if len(hs) > 3:
            # star M-SHAKE solves a 3x3 system per cluster; a 4-H center
            # (e.g. methane) keeps its first three X-H bonds constrained
            # and leaves the rest flexible rather than failing to build
            import warnings
            warnings.warn(
                f"H-cluster at atom {heavy} has {len(hs)} hydrogens; "
                "only 3 are constrained (star M-SHAKE limit)")
        for ci, (h, r0) in enumerate(zip(hs[:3], r0s[:3])):
            hc_h[r, ci] = h
            hc_r0[r, ci] = r0

    f = lambda a: jnp.asarray(a, dtype)
    return Topology(
        masses=f(_pad2(masses, n, 1.0)),
        charges=f(_pad2(np.asarray(charges, np.float64), n, 0.0)),
        lj_sigma=f(_pad2(np.asarray(lj_sigma, np.float64), n, 1.0)),
        lj_eps=f(_pad2(np.asarray(lj_eps, np.float64), n, 0.0)),
        atom_mask=f(atom_mask),
        dof_mask=f(_pad2(dof_mask, n, 0.0)),
        mol_id=jnp.asarray(mol_id),
        bond_idx=jnp.asarray(b_idx),
        bond_k=f(b_k),
        bond_r0=f(b_r0),
        angle_idx=jnp.asarray(a_idx),
        angle_k=f(a_k),
        angle_theta0=f(a_t0),
        dihedral_idx=jnp.asarray(d_idx),
        dihedral_k=f(d_k),
        dihedral_n=f(d_n),
        dihedral_phase=f(d_ph),
        excl_idx=jnp.asarray(e_idx),
        excl_mask=f(e_mask),
        pair14_idx=jnp.asarray(p_idx),
        pair14_mask=f(p_mask),
        pair14_scee=f(p_scee),
        pair14_scnb=f(p_scnb),
        couple_mask=f(_pad2(np.asarray(couple_mask, np.float64), n, 0.0)),
        water_start=water_start,
        water_count=water_count,
        water_site_count=water_site_count,
        water_r_oh=float(water_geometry[0]),
        water_theta_hoh=float(water_geometry[1]),
        water_r_om=float(water_geometry[2]),
        vsite_idx=jnp.asarray(vs_idx),
        vsite_weight=f(vs_w),
        vsite_mask=f(vs_mask),
        hcluster_heavy=jnp.asarray(hc_heavy),
        hcluster_h=jnp.asarray(hc_h),
        hcluster_r0=f(hc_r0),
        n_atoms_real=n_real,
        n_mol=n_mol,
    )
