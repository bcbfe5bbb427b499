"""Cluster-pair direct-space nonbonded evaluation (GROMACS-style on TPU).

Atoms are Morton-sorted into compact clusters of 8; every `rebuild`, an
exact cluster-pair list [NC, M] is computed (bounding-sphere candidates
refined by 8x8 atom distances). Force evaluation gathers each cluster's M
neighbor clusters and runs dense [8, M*8] pair tiles — pair count tracks the
TRUE neighbor count (~1.5-2x a perfect Verlet list) instead of the dense
cell grid's max-occupancy^2, which wastes 10x+ on heterogeneous systems.

Same per-pair arithmetic as the Pallas kernel / XLA window (A&S erfc,
softcore LJ, LJ_CLIP) so the pme_rest exclusion subtraction stays consistent.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import COULOMB_CONST
from ..topology import Topology
from .pallas.direct_force import LJ_CLIP, SOFTCORE_ALPHA, erfc_approx
from .pbc import minimum_image

CL = 8  # atoms per cluster


@dataclass(frozen=True)
class ClusterPlan:
    n_atoms: int          # padded atom count (multiple of CL)
    n_clusters: int
    m_neighbors: int      # pair-list width (padded)
    cutoff: float
    skin: float
    fine_cells: Tuple[int, int, int]


def plan_clusters(box_extent, cutoff: float, n_atoms_real: int,
                  n_atoms_pad: int, skin: float = 0.6,
                  density: float = None, m_scale: float = 1.0) -> ClusterPlan:
    box = np.asarray(box_extent, np.float64)
    rho = density or max(n_atoms_real / float(np.prod(box)), 0.02)
    # exact-list width: atoms within rc + skin + cluster-extent slop.
    # Cluster radius scales with local sparseness (8 Morton-sorted atoms
    # occupy ~CL/rho volume).
    r_cl = 0.7 * (CL / rho) ** (1.0 / 3.0)
    r_eff = cutoff + skin + 2.0 * r_cl
    per_atom = 4.0 / 3.0 * math.pi * r_eff ** 3 * rho
    m = int(math.ceil(per_atom / CL * 1.3 * m_scale / 16.0)) * 16
    m = max(m, 32)
    nc_fine = tuple(int(v) for v in np.maximum((box / 2.8).astype(int), 1))
    return ClusterPlan(
        n_atoms=n_atoms_pad, n_clusters=n_atoms_pad // CL, m_neighbors=m,
        cutoff=cutoff, skin=skin, fine_cells=nc_fine)


def _morton(ci, cj, ck):
    """Interleave 10 bits per axis -> 30-bit Morton code (locality sort)."""
    def spread(v):
        v = v & 0x3FF
        v = (v | (v << 16)) & 0x030000FF
        v = (v | (v << 8)) & 0x0300F00F
        v = (v | (v << 4)) & 0x030C30C3
        v = (v | (v << 2)) & 0x09249249
        return v
    return spread(ci) | (spread(cj) << 1) | (spread(ck) << 2)


def make_cluster_rebuild_fn(plan: ClusterPlan, top: Topology):
    """rebuild(x, box) -> (order [N] int32, nbr [NC, M] int32 (-1 pad),
    overflow int32).

    order: atom index per sorted slot (padding atoms sort last — N is a
    multiple of CL so they fill trailing clusters exactly).
    """
    n = plan.n_atoms
    ncl = plan.n_clusters
    m_max = plan.m_neighbors
    fx, fy, fz = plan.fine_cells
    rc_list = plan.cutoff + plan.skin
    atom_mask = top.atom_mask

    def rebuild(x, box):
        u = x / box
        u = u - jnp.floor(u)
        ci = jnp.minimum((u[:, 0] * fx).astype(jnp.int32), fx - 1)
        cj = jnp.minimum((u[:, 1] * fy).astype(jnp.int32), fy - 1)
        ck = jnp.minimum((u[:, 2] * fz).astype(jnp.int32), fz - 1)
        code = _morton(ci, cj, ck)
        # padding atoms to the end
        code = jnp.where(atom_mask > 0, code, jnp.int32(0x7FFFFFFF))
        order = jnp.argsort(code).astype(jnp.int32)
        xs = x[order]                                  # [N, 3] sorted
        # wrap sorted positions for geometry math (atoms may be outside box)
        xs = xs - box * jnp.floor(xs / box)
        xc = xs.reshape(ncl, CL, 3)
        valid = (atom_mask[order] > 0).reshape(ncl, CL)
        any_valid = valid.any(axis=1)
        # cluster centers (masked mean) and radii, minimum-image safe within
        # a cluster (clusters are compact; use first atom as reference)
        ref = xc[:, 0:1, :]
        rel = minimum_image(xc - ref, box)
        w = valid[..., None].astype(xs.dtype)
        cnt = jnp.maximum(w.sum(axis=1), 1.0)
        center_rel = (rel * w).sum(axis=1) / cnt
        center = ref[:, 0, :] + center_rel
        radius = jnp.sqrt(jnp.max(
            jnp.where(valid, jnp.sum((rel - center_rel[:, None, :]) ** 2,
                                     axis=-1), 0.0), axis=1))
        # candidate pairs: center distance < rc_list + ri + rj
        d = minimum_image(center[:, None, :] - center[None, :, :], box)
        cd = jnp.sqrt(jnp.sum(d * d, axis=-1))
        cand = (cd < rc_list + radius[:, None] + radius[None, :]) \
            & any_valid[:, None] & any_valid[None, :]

        # exact refinement, 2D-blocked: does any atom pair fall within
        # rc_list? (memory per tile: [blk, blk, CL, CL, 3])
        n_blk = max(1, -(-ncl // 160))
        blk = -(-ncl // n_blk)
        ncl_pad = blk * n_blk
        pad_c = ncl_pad - ncl
        xc_p = jnp.pad(xc, ((0, pad_c), (0, 0), (0, 0)),
                       constant_values=1e6)
        v_p = jnp.pad(valid, ((0, pad_c), (0, 0)))
        rl2 = rc_list * rc_list

        def refine_i(bi, acc):
            si = bi * blk
            xi = jax.lax.dynamic_slice(xc_p, (si, 0, 0), (blk, CL, 3))
            vi = jax.lax.dynamic_slice(v_p, (si, 0), (blk, CL))

            def refine_j(bj, row):
                sj = bj * blk
                xj = jax.lax.dynamic_slice(xc_p, (sj, 0, 0), (blk, CL, 3))
                vj = jax.lax.dynamic_slice(v_p, (sj, 0), (blk, CL))
                dd = minimum_image(
                    xi[:, None, :, None, :] - xj[None, :, None, :, :], box)
                r2 = jnp.sum(dd * dd, axis=-1)
                ok = (r2 < rl2) & vi[:, None, :, None] \
                    & vj[None, :, None, :]
                hit = ok.any(axis=(2, 3))              # [blk, blk]
                return jax.lax.dynamic_update_slice(row, hit, (0, sj))

            row = jax.lax.fori_loop(
                0, n_blk, refine_j, jnp.zeros((blk, ncl_pad), bool))
            return jax.lax.dynamic_update_slice(acc, row, (si, 0))

        hits = jax.lax.fori_loop(
            0, n_blk, refine_i,
            jnp.zeros((ncl_pad, ncl_pad), bool))[:ncl, :ncl]
        pairs = hits & cand
        # compact each row's neighbor indices into [NC, M]
        counts = pairs.sum(axis=1)
        overflow = jnp.maximum(counts.max() - m_max, 0).astype(jnp.int32)
        # sort key: non-neighbors last
        key = jnp.where(pairs, 0, 1) * ncl \
            + jax.lax.broadcasted_iota(jnp.int32, (ncl, ncl), 1)
        m_eff = min(m_max, ncl)
        nbr_sorted = jnp.argsort(key, axis=1)[:, :m_eff].astype(jnp.int32)
        in_range = jax.lax.broadcasted_iota(
            jnp.int32, (ncl, m_eff), 1) < counts[:, None]
        nbr = jnp.where(in_range, nbr_sorted, -1)
        if m_eff < m_max:
            nbr = jnp.pad(nbr, ((0, 0), (0, m_max - m_eff)),
                          constant_values=-1)
        return order, nbr, overflow

    return rebuild


def make_cluster_direct_force_fn(top: Topology, cfg, plan: ClusterPlan):
    """direct(x, box, couple, beta, order, nbr) -> (F [N,3], e_lj, e_c)."""
    n = plan.n_atoms
    ncl = plan.n_clusters
    m_max = plan.m_neighbors
    dtype = jnp.dtype(cfg.dtype)
    rc2 = jnp.asarray(float(plan.cutoff) ** 2, dtype)
    charges = top.charges * top.atom_mask
    two_over_sqrt_pi = 2.0 / math.sqrt(math.pi)
    n_blk = 16
    blk = -(-ncl // n_blk)
    ncl_pad = blk * n_blk

    def direct(x, box, couple, beta, order, nbr):
        xs = x[order]
        xs = xs - box * jnp.floor(xs / box)
        props = jnp.stack([
            charges[order], top.lj_sigma[order], top.lj_eps[order],
            top.couple_mask[order], top.atom_mask[order]], axis=1)
        xc = xs.reshape(ncl, CL, 3)
        pc = props.reshape(ncl, CL, 5)
        # pad cluster axis so block slicing is exact
        xc_p = jnp.pad(xc, ((0, ncl_pad - ncl), (0, 0), (0, 0)))
        pc_p = jnp.pad(pc, ((0, ncl_pad - ncl), (0, 0), (0, 0)))
        nbr_p = jnp.pad(nbr, ((0, ncl_pad - ncl), (0, 0)),
                        constant_values=-1)

        def block(b, carry):
            acc_f, acc_lj, acc_c = carry
            s = b * blk
            xi = jax.lax.dynamic_slice(xc_p, (s, 0, 0), (blk, CL, 3))
            pi = jax.lax.dynamic_slice(pc_p, (s, 0, 0), (blk, CL, 5))
            nb = jax.lax.dynamic_slice(nbr_p, (s, 0), (blk, m_max))
            nb_ok = nb >= 0
            nbc = jnp.where(nb_ok, nb, 0)
            xj = xc[nbc]                    # [blk, M, CL, 3]
            pj = pc[nbc]                    # [blk, M, CL, 5]
            d = minimum_image(
                xi[:, None, :, None, :] - xj[:, :, None, :, :], box)
            r2 = jnp.sum(d * d, axis=-1)    # [blk, M, CLi, CLj]
            ok = (r2 < rc2) & (r2 > 1e-9) & nb_ok[:, :, None, None] \
                & (pi[:, None, :, None, 4] > 0) & (pj[:, :, None, :, 4] > 0)
            r2s = jnp.maximum(r2, 1e-4)
            inv_r2 = 1.0 / r2s
            qi = pi[:, None, :, None, 0]
            qj = pj[:, :, None, :, 0]
            sig = 0.5 * (pi[:, None, :, None, 1] + pj[:, :, None, :, 1])
            eps4 = 4.0 * jnp.sqrt(pi[:, None, :, None, 2]
                                  * pj[:, :, None, :, 2])
            ca = pi[:, None, :, None, 3]
            cb = pj[:, :, None, :, 3]
            is_alch = ca + cb - 2.0 * ca * cb
            cpl = 1.0 - is_alch * (1.0 - couple)
            a_sc = SOFTCORE_ALPHA * (1.0 - cpl)
            s2 = sig * sig * inv_r2
            s6 = s2 * s2 * s2
            inv_den = 1.0 / (a_sc * s6 + 1.0)
            lj_inv = s6 * inv_den
            e_lj_raw = eps4 * cpl * (lj_inv * lj_inv - lj_inv)
            e_lj = jnp.clip(e_lj_raw, -LJ_CLIP, LJ_CLIP)
            dlj = eps4 * cpl * (2.0 * lj_inv - 1.0) * (inv_den * inv_den) \
                * (-3.0 * s6 * inv_r2)
            dlj = jnp.where(jnp.abs(e_lj_raw) < LJ_CLIP, dlj, 0.0)
            r = jnp.sqrt(r2s)
            inv_r = 1.0 / r
            erfc_v, expv = erfc_approx(beta * r)
            kqq = COULOMB_CONST * qi * qj * cpl
            e_c = kqq * erfc_v * inv_r
            dc = -0.5 * kqq * inv_r2 * (
                erfc_v * inv_r + two_over_sqrt_pi * beta * expv)
            coeff = jnp.where(ok, dlj + dc, 0.0)
            acc_lj += jnp.sum(jnp.where(ok, e_lj, 0.0))
            acc_c += jnp.sum(jnp.where(ok, e_c, 0.0))
            f_blk = -2.0 * jnp.sum(coeff[..., None] * d, axis=(1, 3))
            acc_f = jax.lax.dynamic_update_slice(acc_f, f_blk, (s, 0, 0))
            return acc_f, acc_lj, acc_c

        f0 = jnp.zeros((ncl_pad, CL, 3), dtype)
        f_c, e_lj, e_c = jax.lax.fori_loop(
            0, n_blk, block,
            (f0, jnp.zeros((), dtype), jnp.zeros((), dtype)))
        # unsort: sorted slot s holds atom order[s]
        f_atoms = jnp.zeros((n, 3), dtype).at[order].set(
            f_c[:ncl].reshape(n, 3))
        f_atoms = f_atoms * top.atom_mask[:, None]
        # pair list includes (i,j) and (j,i): energies double-counted; the
        # self-cluster pair (i==i) tile counts each pair twice as well
        # overflow is detected at rebuild time (make_cluster_rebuild_fn)
        return f_atoms, 0.5 * e_lj, 0.5 * e_c, jnp.zeros((), jnp.int32)

    return direct
