"""Holonomic constraints: rigid water + X-H bonds via block M-SHAKE/RATTLE.

Reference parity: HydrogenConstraint::{Linear(LINCS), Shake, Flexible}
(src/ui/panels/md.rs:358-370) and rigid OPC water. TPU-native design: instead
of sequential Gauss-Seidel SHAKE (unvectorizable) or sparse LINCS matrices,
constraints are grouped into independent *clusters* of <= 4 atoms and <= 3
constraints (a water, or a heavy atom with its bonded hydrogens). Each cluster
yields an analytic 3x3 linear solve; a few Newton iterations reach machine
precision. All clusters solve in parallel with one gather + one conflict-free
scatter — no atom appears in two clusters.

This is both the "shake" and "linear" path (the 3x3 block solve *is* a direct
mini-LINCS); "flexible" disables constraints entirely.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.pbc import minimum_image
from ..topology import Topology
from .config import MdConfig


def _build_clusters(top: Topology):
    """Host-side: unify waters + H clusters into padded cluster arrays.

    Returns (atom_idx [C,4], con_local [3,2] (static), dists [C,3],
    con_mask [C,3], n_constraints_total) or None if no constraints.
    """
    clusters = []   # (atoms[4], dists[3], mask[3])

    # waters: contiguous blocks (O, H1, H2[, M]) from water_start
    if top.water_count > 0:
        import math
        r_oh = top.water_r_oh
        r_hh = 2.0 * r_oh * math.sin(0.5 * top.water_theta_hoh)
        stride = top.water_site_count
        for w in range(top.water_count):
            o = top.water_start + w * stride
            clusters.append(([o, o + 1, o + 2, -1],
                             [r_oh, r_oh, r_hh], [1.0, 1.0, 1.0]))

    hc_heavy = np.asarray(top.hcluster_heavy)
    hc_h = np.asarray(top.hcluster_h)
    hc_r0 = np.asarray(top.hcluster_r0)
    for c in range(hc_heavy.shape[0]):
        hs = hc_h[c]
        if (hs < 0).all():
            continue
        atoms = [int(hc_heavy[c])] + [int(h) for h in hs]
        # constraints: (0, 1), (0, 2), (0, 3) where slot has a real H
        dists, mask = [], []
        for k in range(3):
            if hs[k] >= 0:
                dists.append(float(hc_r0[c, k])); mask.append(1.0)
            else:
                dists.append(1.0); mask.append(0.0)
        clusters.append((atoms, dists, mask))

    if not clusters:
        return None

    C = len(clusters)
    atom_idx = np.zeros((C, 4), np.int32)
    dists = np.zeros((C, 3), np.float64)
    mask = np.zeros((C, 3), np.float64)
    is_water = np.zeros((C,), bool)
    for r, (a, d, m) in enumerate(clusters):
        atom_idx[r] = a
        dists[r] = d
        mask[r] = m
        is_water[r] = r < top.water_count  # waters are appended first
    n_con = int(mask.sum())
    return atom_idx, dists, mask, n_con, is_water


# local constraint topology within a cluster (atom slots):
#   water cluster:  slots (0=O, 1=H1, 2=H2):   (0,1), (0,2), (1,2)
#   H cluster:      slots (0=X, 1..3=H):        (0,1), (0,2), (0,3)
_CON_WATER = np.array([[0, 1], [0, 2], [1, 2]], np.int32)
_CON_HX = np.array([[0, 1], [0, 2], [0, 3]], np.int32)


def count_constraints(top: Topology, cfg: MdConfig) -> int:
    built = _build_clusters(top)
    if built is None or cfg.hydrogen_constraint.kind == "flexible":
        # rigid water still constrained even under flexible-H? The reference
        # treats water rigidity separately from HydrogenConstraint; we keep
        # water rigid always (OPC is a rigid model).
        if top.water_count > 0:
            return 3 * top.water_count
        return 0
    return built[3]


def make_constraint_fns(top: Topology, cfg: MdConfig, box):
    """Returns (constrain_positions, constrain_velocities, n_constraints)."""
    built = _build_clusters(top)
    if built is None:
        return None, None, 0
    atom_idx_np, dists_np, mask_np, n_con, is_water_np = built

    flexible_h = cfg.hydrogen_constraint.kind == "flexible"
    if flexible_h:
        keep = is_water_np
        if not keep.any():
            return None, None, 0
        atom_idx_np = atom_idx_np[keep]
        dists_np = dists_np[keep]
        mask_np = mask_np[keep]
        is_water_np = is_water_np[keep]
        n_con = int(mask_np.sum())

    # all setup math in numpy: eager jnp ops are remote compiles on some
    # backends (axon tunnel) and would cost seconds each
    dtype = jnp.dtype(cfg.dtype)
    atom_idx = jnp.asarray(np.where(atom_idx_np < 0, 0, atom_idx_np))
    slot_valid_np = (atom_idx_np >= 0).astype(np.float64)
    slot_valid = jnp.asarray(slot_valid_np, dtype)
    dists2 = jnp.asarray(dists_np ** 2, dtype)
    cmask = jnp.asarray(mask_np, dtype)
    # per-cluster local constraint pairs [C,3,2]
    con_local = jnp.asarray(np.where(
        is_water_np[:, None, None], _CON_WATER[None], _CON_HX[None]))
    masses_np = np.asarray(top.masses, np.float64)
    inv_m = jnp.asarray(
        (1.0 / np.maximum(masses_np[atom_idx_np.clip(0)], 1e-9))
        * slot_valid_np, dtype)                   # [C,4]

    n_iters = max(cfg.hydrogen_constraint.iters * 4, 8) \
        if cfg.hydrogen_constraint.kind == "linear" else 8

    def gather(x):
        return x[atom_idx]                        # [C,4,3]

    def cluster_vectors(p, con):
        """r_k = p[a_k] - p[b_k] for the 3 local constraints. p: [C,4,3]."""
        ia = jnp.repeat(con[:, :, 0][:, :, None], 3, axis=-1)  # [C,3,3]
        ib = jnp.repeat(con[:, :, 1][:, :, None], 3, axis=-1)
        a = jnp.take_along_axis(p, ia, axis=1)
        b = jnp.take_along_axis(p, ib, axis=1)
        return a - b                              # [C,3,3]

    # coupling coefficients c_kl: how lambda_l (along r_l0) moves r_k.
    def coupling_matrix(con, invm):
        # delta terms: c_kl = d(i_k,i_l)/m_ik - d(i_k,j_l)/m_ik
        #                   - d(j_k,i_l)/m_jk + d(j_k,j_l)/m_jk
        ik = con[:, :, 0]  # [C,3]
        jk = con[:, :, 1]
        def dm(s1, s2, m_of):
            return (s1[:, :, None] == s2[:, None, :]).astype(dtype) \
                * m_of[:, :, None]
        m_ik = jnp.take_along_axis(invm, ik, axis=1)   # [C,3]
        m_jk = jnp.take_along_axis(invm, jk, axis=1)
        c = (dm(ik, ik, m_ik) - dm(ik, jk, m_ik)
             - dm(jk, ik, m_jk) + dm(jk, jk, m_jk))    # [C,3,3] (k,l)
        return c

    def solve3(A, b, mask):
        """Masked analytic 3x3 solve (Cramer); inactive rows -> identity.

        Batched jnp.linalg.solve lowers to LU on TPU — the adjugate form is
        pure VPU elementwise math and an order of magnitude cheaper at [C,3,3].
        """
        eye = jnp.eye(3, dtype=dtype)
        m2 = mask[:, :, None] * mask[:, None, :]
        A = A * m2 + eye[None] * (1.0 - mask)[:, None, :] * eye[None]
        a00, a01, a02 = A[:, 0, 0], A[:, 0, 1], A[:, 0, 2]
        a10, a11, a12 = A[:, 1, 0], A[:, 1, 1], A[:, 1, 2]
        a20, a21, a22 = A[:, 2, 0], A[:, 2, 1], A[:, 2, 2]
        c00 = a11 * a22 - a12 * a21
        c01 = a12 * a20 - a10 * a22
        c02 = a10 * a21 - a11 * a20
        det = a00 * c00 + a01 * c01 + a02 * c02
        inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-12,
                                  jnp.sign(det) * 1e-12 + (det == 0), det)
        b0, b1, b2 = (b * mask)[:, 0], (b * mask)[:, 1], (b * mask)[:, 2]
        x0 = (b0 * c00 + b1 * (a02 * a21 - a01 * a22)
              + b2 * (a01 * a12 - a02 * a11)) * inv_det
        x1 = (b0 * c01 + b1 * (a00 * a22 - a02 * a20)
              + b2 * (a02 * a10 - a00 * a12)) * inv_det
        x2 = (b0 * c02 + b1 * (a01 * a20 - a00 * a21)
              + b2 * (a00 * a11 - a01 * a10)) * inv_det
        return jnp.stack([x0, x1, x2], axis=-1) * mask

    def apply_lambda(p, con, lam, r0, invm):
        """p[a_k] += lam_k r0_k / m_a; p[b_k] -= lam_k r0_k / m_b."""
        upd = jnp.zeros_like(p)                   # [C,4,3]
        for k in range(3):
            ak = con[:, k, 0]
            bk = con[:, k, 1]
            d = lam[:, k, None] * r0[:, k, :]     # [C,3]
            m_a = jnp.take_along_axis(invm, ak[:, None], axis=1)
            m_b = jnp.take_along_axis(invm, bk[:, None], axis=1)
            upd_a = d * m_a
            upd_b = -d * m_b
            onehot_a = (jnp.arange(4)[None, :] == ak[:, None])[..., None]
            onehot_b = (jnp.arange(4)[None, :] == bk[:, None])[..., None]
            upd = upd + onehot_a * upd_a[:, None, :] + onehot_b * upd_b[:, None, :]
        return p + upd

    def constrain_positions(x_new, x_ref):
        p = gather(x_new)                         # [C,4,3]
        p0 = gather(x_ref)
        # work in minimum-image frame relative to slot-0 atom to be PBC-safe
        r0 = cluster_vectors(p0, con_local)       # reference directions
        if box is not None:
            r0 = minimum_image(r0, box)
        c_kl = coupling_matrix(con_local, inv_m)

        def body(_, p):
            r = cluster_vectors(p, con_local)
            if box is not None:
                r = minimum_image(r, box)
            A = 2.0 * c_kl * jnp.einsum("cki,cli->ckl", r, r0)
            b = dists2 - jnp.sum(r * r, axis=-1)
            lam = solve3(A, b, cmask)
            return apply_lambda(p, con_local, lam, r0, inv_m)

        p = jax.lax.fori_loop(0, n_iters, body, p)
        # conflict-free scatter back (each atom in at most one cluster)
        delta = (p - gather(x_new)) * slot_valid[..., None]
        flat_idx = atom_idx.reshape(-1)
        return x_new.at[flat_idx].add(delta.reshape(-1, 3))

    def constrain_velocities(v, x):
        p = gather(x)
        vv = gather(v)
        r = cluster_vectors(p, con_local)
        if box is not None:
            r = minimum_image(r, box)
        c_kl = coupling_matrix(con_local, inv_m)
        rv = cluster_vectors(vv, con_local)       # relative velocities
        A = c_kl * jnp.einsum("cki,cli->ckl", r, r)
        b = -jnp.sum(r * rv, axis=-1)
        mu = solve3(A, b, cmask)
        vv2 = apply_lambda(vv, con_local, mu, r, inv_m)
        delta = (vv2 - vv) * slot_valid[..., None]
        flat_idx = atom_idx.reshape(-1)
        return v.at[flat_idx].add(delta.reshape(-1, 3))

    return constrain_positions, constrain_velocities, n_con
