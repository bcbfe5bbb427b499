"""Cell-binned direct-space nonbonded evaluation for large periodic systems.

TPU-native neighbor structure replacing the reference engine's cell/Verlet
lists (named in BASELINE.json's north star; the reference's are CPU/CUDA
structures inside the unmounted `dynamics` crate). Design rationale:

TPUs have no efficient hardware scatter and punish irregular gathers, so
instead of per-atom neighbor lists we keep atoms in a dense
[ncx, ncy, ncz, C] *cell grid* (sorted-by-cell, fixed capacity C) and
evaluate pair interactions cell-against-shifted-cell for a static stencil of
lattice shifts covering the cutoff sphere: `jnp.roll` over the cell axes is a
perfectly regular memory movement, every pair block is a dense [C, C] tile of
VPU work, and the whole force evaluation is one fused XLA program — no
rebuild heuristics, no overflowing pair lists (only per-cell capacity, with
generous headroom + an overflow flag).

Exclusions / 1-4 pairs are NOT masked in the window (per-pair bitmask lookups
are irregular); instead the same functional form is *subtracted* over the
small exclusion pair lists with bitwise-identical arithmetic (same
pair_lj_coulomb, same dtype, same minimum-image inputs), so the cancellation
is exact — no catastrophic-cancellation error from bonded-distance LJ.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..topology import Topology
from .nonbonded import lorentz_berthelot, pair_lj_coulomb
from .pbc import minimum_image


def plan_cells(box_extent, cutoff: float, n_atoms_real: int,
               capacity_factor: float = 1.7, target_cell_side: float = None,
               x0=None):
    """Host-side geometry planning. Returns (nc[3], capacity, shifts[S,3]).

    If initial positions `x0` are given, capacity is calibrated from the
    actual max cell occupancy (molecular clustering — e.g. whole waters in
    one cell — makes the mean-density estimate unsafe)."""
    box = np.asarray(box_extent, np.float64)
    s_t = target_cell_side or max(cutoff / 2.0, 3.0)
    nc = np.maximum((box / s_t).astype(int), 1)
    cell_side = box / nc
    assert (cutoff <= box / 2.0 + 1e-6).all(), \
        f"cutoff {cutoff} must be <= half the box {box}"
    r = np.ceil(cutoff / cell_side).astype(int)
    # Per-axis shift sets. When the stencil is wider than the axis
    # (2r+1 > nc) the torus wraps shifts onto each other; deduplicate so
    # every neighbor cell is visited exactly once (shift s and s-nc are the
    # same cell). Minimum-image on positions handles the actual distances.
    ax_shifts = []
    for ax in range(3):
        if 2 * r[ax] + 1 <= nc[ax]:
            ax_shifts.append(list(range(-r[ax], r[ax] + 1)))
        else:
            lo = -(nc[ax] // 2)
            ax_shifts.append(list(range(lo, lo + nc[ax])))
    # stencil shifts with min cell-cell distance <= cutoff
    def min_ax_dist(s, ax):
        # distance between cell slabs |s| apart on a torus of nc cells
        s_mod = min(abs(s) % nc[ax], nc[ax] - abs(s) % nc[ax])
        return max(s_mod - 1, 0) * cell_side[ax]

    shifts = []
    for dx in ax_shifts[0]:
        for dy in ax_shifts[1]:
            for dz in ax_shifts[2]:
                d = np.array([min_ax_dist(dx, 0), min_ax_dist(dy, 1),
                              min_ax_dist(dz, 2)])
                if np.linalg.norm(d) <= cutoff:
                    shifts.append((dx, dy, dz))
    n_cells = int(np.prod(nc))
    mean_occ = n_atoms_real / n_cells
    if x0 is not None:
        xr = np.asarray(x0)[:n_atoms_real]
        u = xr / box - np.floor(xr / box)
        ci = np.minimum((u * nc).astype(int), nc - 1)
        flat = ci[:, 0] * (nc[1] * nc[2]) + ci[:, 1] * nc[2] + ci[:, 2]
        max_occ = np.bincount(flat, minlength=n_cells).max()
        cap = int(math.ceil(max_occ * capacity_factor / 8.0)) * 8
    else:
        cap = int(math.ceil(mean_occ * capacity_factor / 8.0)) * 8
    cap = max(cap, 16)
    return tuple(int(v) for v in nc), cap, np.asarray(shifts, np.int32)


def bin_atoms(x, box, atom_mask, nc, capacity):
    """Bin atoms into the dense cell grid.

    Returns (grid_idx [ncells, C] int32 with -1 empty, overflow_count).
    Padding atoms (mask 0) are parked in no cell.
    """
    n = x.shape[0]
    ncx, ncy, ncz = nc
    n_cells = ncx * ncy * ncz
    u = x / box
    u = u - jnp.floor(u)     # wrap into [0,1)
    ci = jnp.minimum((u[:, 0] * ncx).astype(jnp.int32), ncx - 1)
    cj = jnp.minimum((u[:, 1] * ncy).astype(jnp.int32), ncy - 1)
    ck = jnp.minimum((u[:, 2] * ncz).astype(jnp.int32), ncz - 1)
    cell = ci * (ncy * ncz) + cj * ncz + ck
    cell = jnp.where(atom_mask > 0, cell, n_cells)  # padding -> overflow bin
    order = jnp.argsort(cell)
    cell_sorted = cell[order]
    # rank within cell: position among same-cell predecessors
    ar = jnp.arange(n)
    seg_start = jnp.searchsorted(cell_sorted, cell_sorted, side="left")
    rank = ar - seg_start
    overflow = jnp.sum((rank >= capacity) & (cell_sorted < n_cells))
    ok = (rank < capacity) & (cell_sorted < n_cells)
    flat = jnp.where(ok, cell_sorted * capacity + rank, n_cells * capacity)
    grid = jnp.full((n_cells * capacity + 1,), -1, jnp.int32)
    grid = grid.at[flat].set(jnp.where(ok, order.astype(jnp.int32), -1))
    return grid[:-1].reshape(n_cells, capacity), overflow


def make_xla_direct_force_fn(top: Topology, cfg, box_extent, x0=None):
    """XLA shift-window direct space with ANALYTIC forces.

    Same interface as ops.pallas.direct_force.make_pallas_direct_fn's
    direct(): (x, box, couple, beta, slot_atom, inv_slot) ->
    (F [N,3], e_lj, e_c) — a drop-in backend for the engine's
    pme_rest + direct-forces assembly. Uses the SAME per-pair arithmetic as
    the Pallas kernel (A&S erfc, softcore form, LJ clip) so exclusion
    subtraction in pme_rest cancels consistently. Forces are accumulated
    center-side in the shift scan (no autodiff, no remat recompute).
    """
    import math as _math

    from .pallas.direct_force import (
        LJ_CLIP,
        SOFTCORE_ALPHA as _SC,
        WindowPlan,
        erfc_approx,
        make_rebuild_fn,
        plan_window,
    )
    from ..constants import COULOMB_CONST

    cutoff = max(cfg.lj_cutoff, cfg.coulomb_cutoff)
    nc, cap, shifts_np = plan_cells(
        box_extent, cutoff, top.n_atoms_real, cfg.cell_capacity_factor,
        x0=x0)
    ncx, ncy, ncz = nc
    n_cells = ncx * ncy * ncz
    shifts = jnp.asarray(shifts_np)
    dtype = jnp.dtype(cfg.dtype)
    rc2 = jnp.asarray(cutoff * cutoff, dtype)
    n = top.n_atoms
    charges = top.charges * top.atom_mask
    two_over_sqrt_pi = 2.0 / math.sqrt(math.pi)

    def direct(x, box, couple, beta, slot_atom=None, inv_slot=None):
        del slot_atom, inv_slot   # self-binning backend
        grid, overflow = bin_atoms(x, box, top.atom_mask, nc, cap)
        valid = grid >= 0
        gi = jnp.where(valid, grid, 0)
        pos = x[gi]
        q = jnp.where(valid, charges[gi], 0.0)
        sg = jnp.where(valid, top.lj_sigma[gi], 1.0)
        ep = jnp.where(valid, top.lj_eps[gi], 0.0)
        cmg = jnp.where(valid, top.couple_mask[gi], 0.0)
        vmask = valid.astype(dtype)

        shape4 = (ncx, ncy, ncz, cap)
        pos4 = pos.reshape(ncx, ncy, ncz, cap, 3)
        q4 = q.reshape(shape4)
        s4 = sg.reshape(shape4)
        e4_ = ep.reshape(shape4)
        c4 = cmg.reshape(shape4)
        m4 = vmask.reshape(shape4)

        def body(carry, shift):
            acc_lj, acc_c, acc_f = carry
            roll = lambda a: jnp.roll(a, (shift[0], shift[1], shift[2]),
                                      axis=(0, 1, 2))
            pos_n = roll(pos4)
            dxv = minimum_image(
                pos4[..., :, None, :] - pos_n[..., None, :, :], box)
            r2 = jnp.sum(dxv * dxv, axis=-1)          # [nx,ny,nz,C,C]
            ok = (m4[..., :, None] > 0) & (roll(m4)[..., None, :] > 0) \
                & (r2 < rc2) & (r2 > 1e-9)
            r2s = jnp.maximum(r2, 1e-4)
            inv_r2 = 1.0 / r2s
            sig = 0.5 * (s4[..., :, None] + roll(s4)[..., None, :])
            eps4x = 4.0 * jnp.sqrt(e4_[..., :, None] * roll(e4_)[..., None, :])
            ca = c4[..., :, None]
            cb = roll(c4)[..., None, :]
            is_alch = ca + cb - 2.0 * ca * cb
            cpl = 1.0 - is_alch * (1.0 - couple)
            a_sc = _SC * (1.0 - cpl)
            s2 = sig * sig * inv_r2
            s6 = s2 * s2 * s2
            inv_den = 1.0 / (a_sc * s6 + 1.0)
            lj_inv = s6 * inv_den
            e_lj_raw = eps4x * cpl * (lj_inv * lj_inv - lj_inv)
            e_lj = jnp.clip(e_lj_raw, -LJ_CLIP, LJ_CLIP)
            dlj = eps4x * cpl * (2.0 * lj_inv - 1.0) * (inv_den * inv_den) \
                * (-3.0 * s6 * inv_r2)
            dlj = jnp.where(jnp.abs(e_lj_raw) < LJ_CLIP, dlj, 0.0)
            r = jnp.sqrt(r2s)
            inv_r = 1.0 / r
            erfc_v, expv = erfc_approx(beta * r)
            kqq = COULOMB_CONST * q4[..., :, None] * roll(q4)[..., None, :] \
                * cpl
            e_c = kqq * erfc_v * inv_r
            dc = -0.5 * kqq * inv_r2 * (
                erfc_v * inv_r + two_over_sqrt_pi * beta * expv)
            coeff = jnp.where(ok, dlj + dc, 0.0)
            acc_lj += jnp.sum(jnp.where(ok, e_lj, 0.0))
            acc_c += jnp.sum(jnp.where(ok, e_c, 0.0))
            # center-side force: F_i = -2 sum_j coeff * d_ij
            acc_f -= 2.0 * jnp.sum(coeff[..., None] * dxv, axis=-2)
            return (acc_lj, acc_c, acc_f), None

        zero_f = jnp.zeros((ncx, ncy, ncz, cap, 3), dtype)
        (e_lj, e_c, f4), _ = jax.lax.scan(
            body, (jnp.zeros((), dtype), jnp.zeros((), dtype), zero_f),
            shifts)
        # scatter forces back to atom order: each real atom occupies exactly
        # one slot; padding slots point at atom 0 but carry zero force mask
        f_flat = (f4.reshape(-1, 3) * vmask.reshape(-1)[:, None])
        f_atoms = jnp.zeros((n, 3), dtype).at[gi.reshape(-1)].add(f_flat)
        f_atoms = f_atoms * top.atom_mask[:, None]
        return f_atoms, 0.5 * e_lj, 0.5 * e_c, overflow

    return direct


def make_cell_direct_space_fn(top: Topology, cfg, box_extent, x0=None):
    """Build direct(x, box, couple, ewald_beta) -> (E_lj, E_coul, overflow).

    Includes the bitwise-exact subtraction of excluded and 1-4 pairs (so the
    returned sums contain NO contribution from those pairs; md/energy.py adds
    scaled 1-4 terms and reciprocal-space corrections on top).

    `overflow` counts atoms dropped from cell binning; any nonzero value
    means the returned energies are WRONG and capacity must be raised —
    callers surface it in the terms dict as "cell_overflow".
    """
    cutoff = max(cfg.lj_cutoff, cfg.coulomb_cutoff)
    nc, cap, shifts_np = plan_cells(
        box_extent, cutoff, top.n_atoms_real, cfg.cell_capacity_factor,
        x0=x0)
    ncx, ncy, ncz = nc
    shifts = jnp.asarray(shifts_np)
    dtype = jnp.dtype(cfg.dtype)

    charges = top.charges * top.atom_mask
    cm = top.couple_mask

    def pair_block_energy(r2, qi, qj, si, sj, ei, ej, cmi, cmj, couple,
                          ewald_beta, valid):
        sig, eps = lorentz_berthelot(si, sj, ei, ej)
        qq = qi * qj
        is_alch = cmi + cmj - 2.0 * cmi * cmj
        cpl = 1.0 - is_alch * (1.0 - couple)
        e_lj, e_c = pair_lj_coulomb(
            r2, qq, sig, eps, cpl, ewald_beta=ewald_beta,
            cutoff=cfg.lj_cutoff, lj_switch_start=cfg.lj_switch_start,
            coulomb_cutoff=cfg.coulomb_cutoff,
        )
        return jnp.sum(jnp.where(valid, e_lj, 0.0)), \
            jnp.sum(jnp.where(valid, e_c, 0.0))

    def direct(x, box, couple, ewald_beta):
        grid, overflow = bin_atoms(x, box, top.atom_mask, nc, cap)
        valid = grid >= 0
        gi = jnp.where(valid, grid, 0)
        # gather per-slot properties into cell layout
        pos = x[gi]                         # [cells, C, 3]
        q = jnp.where(valid, charges[gi], 0.0)
        sg = jnp.where(valid, top.lj_sigma[gi], 1.0)
        ep = jnp.where(valid, top.lj_eps[gi], 0.0)
        cmg = jnp.where(valid, cm[gi], 0.0)
        gid = jnp.where(valid, grid, -1)

        shape4 = (ncx, ncy, ncz, cap)
        pos4 = pos.reshape(ncx, ncy, ncz, cap, 3)
        q4 = q.reshape(shape4)
        s4 = sg.reshape(shape4)
        e4 = ep.reshape(shape4)
        c4 = cmg.reshape(shape4)
        id4 = gid.reshape(shape4)

        # remat: without it, reverse-mode AD saves every per-shift [.,C,C]
        # intermediate as scan residuals (tens of GB); recomputing the tile
        # in the backward pass costs ~2x FLOPs and ~0 extra memory.
        @jax.checkpoint
        def body(carry, shift):
            acc_lj, acc_c = carry
            roll = lambda a: jnp.roll(a, (shift[0], shift[1], shift[2]),
                                      axis=(0, 1, 2))
            pos_n = roll(pos4)
            dxv = minimum_image(pos4[..., :, None, :] - pos_n[..., None, :, :],
                                box)
            r2 = jnp.sum(dxv * dxv, axis=-1)            # [nx,ny,nz,C,C]
            idn = roll(id4)
            ok = (id4[..., :, None] >= 0) & (idn[..., None, :] >= 0) \
                & (id4[..., :, None] != idn[..., None, :])
            e_lj, e_c = pair_block_energy(
                r2,
                q4[..., :, None], roll(q4)[..., None, :],
                s4[..., :, None], roll(s4)[..., None, :],
                e4[..., :, None], roll(e4)[..., None, :],
                c4[..., :, None], roll(c4)[..., None, :],
                couple, ewald_beta, ok,
            )
            return (acc_lj + e_lj, acc_c + e_c), None

        (e_lj, e_c), _ = jax.lax.scan(
            body, (jnp.zeros((), dtype), jnp.zeros((), dtype)), shifts)
        e_lj, e_c = 0.5 * e_lj, 0.5 * e_c   # each pair visited twice

        # --- bitwise-exact removal of excluded and 1-4 pairs ---
        def sub_pairs(idx, mask):
            i, j = idx[:, 0], idx[:, 1]
            dxv = minimum_image(x[i] - x[j], box)
            r2 = jnp.sum(dxv * dxv, axis=-1)
            sig, eps = lorentz_berthelot(
                top.lj_sigma[i], top.lj_sigma[j],
                top.lj_eps[i], top.lj_eps[j])
            qq = charges[i] * charges[j]
            is_alch = cm[i] + cm[j] - 2.0 * cm[i] * cm[j]
            cpl = 1.0 - is_alch * (1.0 - couple)
            el, ec = pair_lj_coulomb(
                r2, qq, sig, eps, cpl, ewald_beta=ewald_beta,
                cutoff=cfg.lj_cutoff, lj_switch_start=cfg.lj_switch_start,
                coulomb_cutoff=cfg.coulomb_cutoff,
            )
            return jnp.sum(el * mask), jnp.sum(ec * mask)

        el_x, ec_x = sub_pairs(top.excl_idx, top.excl_mask)
        el_4, ec_4 = sub_pairs(top.pair14_idx, top.pair14_mask)
        return e_lj - el_x - el_4, e_c - ec_x - ec_4, overflow

    return direct
