"""Fused Pallas TPU kernel for direct-space nonbonded forces.

This is the performance core of the engine — the TPU-native replacement for
the reference's CUDA pair kernels (/root/reference/src/cuda/util.cu lj_force_v2
/ coulomb_force), designed for the hardware rather than translated:

- Atoms live in a dense cell grid (capacity C per cell) with a **ghost halo**
  of width h: halo cells replicate wrapped-around cells with positions
  pre-shifted by +-box, so the kernel needs NO minimum-image rounding and
  every neighbor window is a set of **contiguous z-slabs** in memory.
- Per grid program (= one center cell) the kernel walks the (2h+1)^2 slabs
  of (2h+1)*C atoms each; each slab is one VMEM dynamic slice; pair math runs
  as dense [C, slab] VPU tiles (properties pre-transposed so center atoms sit
  on sublanes and slab atoms on lanes — zero relayouts in the inner loop).
- Forces are accumulated center-side only (Newton's pair is added when the
  partner cell is the center of its own program) — no scatter, no atomics.
- Analytic derivatives (no autodiff residuals): LJ softcore d/dr2 in closed
  form, Ewald erfc via the Abramowitz-Stegun 7.1.26 polynomial (|err|<1.5e-7)
  whose exp(-x^2) factor is reused for the force term.

The slower lax.scan shift-window implementation in ops/cells.py remains the
f64/CPU reference path; tests cross-check the two.
"""
from __future__ import annotations

import functools
import math
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...constants import COULOMB_CONST
from ...topology import Topology

SOFTCORE_ALPHA = 0.5

# Per-pair LJ energy clip (kcal/mol). Applied identically in the kernel, the
# exclusion-subtraction pair lists, and the XLA reference path, so the
# window-minus-subtraction decomposition stays consistent to ~clip * 1e-7
# even for pathological overlaps, and clash forces are bounded (soft-core
# behavior during relaxation). Physically nothing legitimate comes near it.
LJ_CLIP = 1.0e7

# Abramowitz-Stegun 7.1.26 erfc coefficients
_AS_P = 0.3275911
_AS_A = (0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)


def erfc_approx(x):
    """erfc(x) for x >= 0, |abs err| < 1.5e-7. Returns (erfc, exp(-x^2))."""
    t = 1.0 / (1.0 + _AS_P * x)
    poly = t * (_AS_A[0] + t * (_AS_A[1] + t * (
        _AS_A[2] + t * (_AS_A[3] + t * _AS_A[4]))))
    ex = jnp.exp(-x * x)
    return poly * ex, ex


@dataclass(frozen=True)
class WindowPlan:
    nc: Tuple[int, int, int]     # cells per axis (interior)
    capacity: int                # atoms per cell (multiple of 8)
    halo: int                    # ghost width in cells
    cell_side: Tuple[float, float, float]
    cutoff: float
    n_atoms: int                 # padded atom count (topology size)

    @property
    def n_cells(self) -> int:
        return self.nc[0] * self.nc[1] * self.nc[2]

    @property
    def ghost_dims(self) -> Tuple[int, int, int]:
        h = self.halo
        return (self.nc[0] + 2 * h, self.nc[1] + 2 * h, self.nc[2] + 2 * h)


def plan_window(box_extent, cutoff: float, n_atoms_real: int, n_atoms_pad: int,
                x0=None, capacity_factor: float = 1.6,
                target_side: float = None) -> WindowPlan:
    """Plan the cell geometry for the Pallas kernel.

    Mosaic requires lane-dimension dynamic slices to be 128-aligned, so cell
    capacity is FIXED at 128 (one lane tile per cell) — every slab offset
    (a multiple of capacity) is then aligned by construction. Cell side is
    the largest >= cutoff (halo h=1, 9 slabs of 3 cells). Occupancy must
    leave drift headroom; callers fall back to the XLA path otherwise.
    """
    del capacity_factor, target_side
    box = np.asarray(box_extent, np.float64)
    nc = np.maximum((box / cutoff).astype(int), 1)
    side = box / nc
    h = 1
    assert (nc >= 3).all(), \
        f"box {box} too small for the pallas window at cutoff {cutoff}"
    n_cells = int(np.prod(nc))
    if x0 is not None:
        xr = np.asarray(x0)[:n_atoms_real]
        u = xr / box - np.floor(xr / box)
        ci = np.minimum((u * nc).astype(int), nc - 1)
        flat = ci[:, 0] * (nc[1] * nc[2]) + ci[:, 1] * nc[2] + ci[:, 2]
        occ = int(np.bincount(flat, minlength=n_cells).max())
    else:
        occ = int(math.ceil(n_atoms_real / n_cells))
    # capacity must be a multiple of 128 (lane-tile alignment); dense spots
    # (protein cores) get 256 with headroom for density fluctuation
    cap = 128 if occ * 1.4 <= 128 else 256
    assert occ * 1.15 <= cap, \
        f"max cell occupancy {occ} exceeds pallas capacity {cap}"
    return WindowPlan(
        nc=tuple(int(v) for v in nc), capacity=cap, halo=h,
        cell_side=tuple(float(v) for v in side), cutoff=cutoff,
        n_atoms=n_atoms_pad)


def make_rebuild_fn(plan: WindowPlan, atom_mask):
    """rebuild(x, box) -> (slot_atom [ncells*C] int32 (-1 empty),
    inv_slot [N] int32, overflow int32). Jit-able; runs every K steps."""
    ncx, ncy, ncz = plan.nc
    cap = plan.capacity
    n_cells = plan.n_cells
    n = plan.n_atoms

    def rebuild(x, box):
        u = x / box
        u = u - jnp.floor(u)
        ci = jnp.minimum((u[:, 0] * ncx).astype(jnp.int32), ncx - 1)
        cj = jnp.minimum((u[:, 1] * ncy).astype(jnp.int32), ncy - 1)
        ck = jnp.minimum((u[:, 2] * ncz).astype(jnp.int32), ncz - 1)
        cell = ci * (ncy * ncz) + cj * ncz + ck
        cell = jnp.where(atom_mask > 0, cell, n_cells)
        order = jnp.argsort(cell)
        cell_sorted = cell[order]
        ar = jnp.arange(n)
        seg_start = jnp.searchsorted(cell_sorted, cell_sorted, side="left")
        rank = ar - seg_start
        overflow = jnp.sum((rank >= cap) & (cell_sorted < n_cells))
        ok = (rank < cap) & (cell_sorted < n_cells)
        slot_of_sorted = jnp.where(ok, cell_sorted * cap + rank,
                                   n_cells * cap)
        slot_atom = jnp.full((n_cells * cap + 1,), -1, jnp.int32)
        slot_atom = slot_atom.at[slot_of_sorted].set(
            jnp.where(ok, order.astype(jnp.int32), -1))
        inv_slot = jnp.zeros((n,), jnp.int32)
        inv_slot = inv_slot.at[order].set(
            jnp.where(ok, slot_of_sorted, 0).astype(jnp.int32))
        return slot_atom[:-1], inv_slot, overflow.astype(jnp.int32)

    return rebuild


def _kernel(center_ref, ghost_ref, params_ref, offs_ref, f_ref, *,
            cap, gy, gz, ncy, ncz, halo, n_slab, slab_len, slab_offs,
            rc2):
    """One program = one interior cell.

    center_ref: [ncells*C, 8] rows (x,y,z,q,sig,eps,cm,valid) — atom rows.
    ghost_ref : [8, G] property-major ghost layout.
    params_ref: [1, 4] SMEM (couple, beta, pad, pad).
    f_ref     : [C, 4] output: cols 0-2 forces; col 3 rows 0/1 carry the
                cell's half-summed (e_lj, e_coul) partials.
    """
    p = pl.program_id(0)
    i = p // (ncy * ncz)
    rem = p - i * (ncy * ncz)
    j = rem // ncz
    k = rem - j * ncz
    base_g = (((i + halo) * gy + (j + halo)) * gz + k) * cap

    couple = params_ref[0, 0]
    beta = params_ref[0, 1]

    c = center_ref[pl.ds(p * cap, cap), :]      # [C, 8]
    cx = c[:, 0:1]
    cy = c[:, 1:2]
    cz = c[:, 2:3]
    cq = c[:, 3:4]
    cs = c[:, 4:5]
    ce = c[:, 5:6]
    cc = c[:, 6:7]
    cv = c[:, 7:8]

    two_over_sqrt_pi = 2.0 / math.sqrt(math.pi)

    def slab_body(s, carry):
        fx, fy, fz, e_lj_acc, e_c_acc = carry
        start = pl.multiple_of(base_g + offs_ref[0, s], 128)
        sl = ghost_ref[:, pl.ds(start, slab_len)]   # [8, L]
        sx = sl[0:1, :]
        sy = sl[1:2, :]
        sz = sl[2:3, :]
        sq = sl[3:4, :]
        ss = sl[4:5, :]
        se = sl[5:6, :]
        sc = sl[6:7, :]
        sv = sl[7:8, :]

        dx = cx - sx                              # [C, L]
        dy = cy - sy
        dz = cz - sz
        r2 = dx * dx + dy * dy + dz * dz
        valid = (r2 < rc2) & (r2 > 1e-9) & (cv > 0.5) & (sv > 0.5)
        r2s = jnp.maximum(r2, 1e-4)
        inv_r2 = 1.0 / r2s

        # --- LJ softcore ---
        sig = 0.5 * (cs + ss)
        eps4 = 4.0 * jnp.sqrt(ce * se)
        is_alch = cc + sc - 2.0 * cc * sc
        cpl = 1.0 - is_alch * (1.0 - couple)
        a_sc = SOFTCORE_ALPHA * (1.0 - cpl)
        sig2 = sig * sig
        s2 = sig2 * inv_r2
        s6 = s2 * s2 * s2
        den = a_sc * s6 + 1.0
        inv_den = 1.0 / den
        lj_inv = s6 * inv_den                     # = 1/(a + s^-6)
        e_lj_raw = eps4 * cpl * (lj_inv * lj_inv - lj_inv)
        e_lj = jnp.clip(e_lj_raw, -LJ_CLIP, LJ_CLIP)
        # dV/dr2 = eps4*cpl*(2*lj_inv - 1) * inv_den^2 * (-3 s6 / r2)
        dlj_dr2 = eps4 * cpl * (2.0 * lj_inv - 1.0) * (inv_den * inv_den) \
            * (-3.0 * s6 * inv_r2)
        dlj_dr2 = jnp.where(jnp.abs(e_lj_raw) < LJ_CLIP, dlj_dr2, 0.0)

        # --- Ewald direct Coulomb ---
        r = jnp.sqrt(r2s)
        inv_r = 1.0 / r
        x = beta * r
        erfc_v, expv = erfc_approx(x)
        kqq = COULOMB_CONST * cq * sq * cpl
        e_c = kqq * erfc_v * inv_r
        # dV/dr = -kqq*(erfc/r^2 + 2b/sqrt(pi)*exp(-x^2)/r); dV/dr2 = dV/dr/2r
        dc_dr2 = -0.5 * kqq * inv_r2 * (
            erfc_v * inv_r + two_over_sqrt_pi * beta * expv)

        coeff = jnp.where(valid, dlj_dr2 + dc_dr2, 0.0)
        e_lj_acc += jnp.sum(jnp.where(valid, e_lj, 0.0))
        e_c_acc += jnp.sum(jnp.where(valid, e_c, 0.0))
        # F_i = -dV/dx_i = -2 * coeff * d
        fx = fx - 2.0 * jnp.sum(coeff * dx, axis=1, keepdims=True)
        fy = fy - 2.0 * jnp.sum(coeff * dy, axis=1, keepdims=True)
        fz = fz - 2.0 * jnp.sum(coeff * dz, axis=1, keepdims=True)
        return fx, fy, fz, e_lj_acc, e_c_acc

    zero_col = jnp.zeros((cap, 1), jnp.float32)
    fx, fy, fz, e_lj_acc, e_c_acc = jax.lax.fori_loop(
        0, n_slab, slab_body,
        (zero_col, zero_col, zero_col,
         jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32)))

    f_ref[:, 0:1] = fx
    f_ref[:, 1:2] = fy
    f_ref[:, 2:3] = fz
    rows = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0)
    ecol = jnp.where(rows == 0, 0.5 * e_lj_acc,
                     jnp.where(rows == 1, 0.5 * e_c_acc, 0.0))
    f_ref[:, 3:4] = ecol


def pairlist_kernel_formula_energy(x, box, top: Topology, idx, mask,
                                   couple, beta, rc2,
                                   lj_scale=1.0, coulomb_scale=1.0):
    """(e_lj, e_c) over an explicit pair list using the SAME arithmetic as
    the Pallas kernel (softcore-LJ form, A&S erfc) so exclusion subtraction
    cancels the kernel's contribution to ~1 ulp. Differentiable (used inside
    the autodiff'd 'rest' energy)."""
    from ...ops.pbc import minimum_image

    i, j = idx[:, 0], idx[:, 1]
    d = minimum_image(x[i] - x[j], box)
    r2 = jnp.sum(d * d, axis=-1)
    in_range = (r2 < rc2) & (mask > 0)
    r2s = jnp.maximum(r2, 1e-4)
    inv_r2 = 1.0 / r2s
    sig = 0.5 * (top.lj_sigma[i] + top.lj_sigma[j])
    eps4 = 4.0 * jnp.sqrt(top.lj_eps[i] * top.lj_eps[j])
    cm = top.couple_mask
    is_alch = cm[i] + cm[j] - 2.0 * cm[i] * cm[j]
    cpl = 1.0 - is_alch * (1.0 - couple)
    a_sc = SOFTCORE_ALPHA * (1.0 - cpl)
    s2 = sig * sig * inv_r2
    s6 = s2 * s2 * s2
    lj_inv = s6 / (a_sc * s6 + 1.0)
    e_lj = jnp.clip(eps4 * cpl * (lj_inv * lj_inv - lj_inv),
                    -LJ_CLIP, LJ_CLIP)
    r = jnp.sqrt(r2s)
    erfc_v, _ = erfc_approx(beta * r)
    q = top.charges * top.atom_mask
    e_c = COULOMB_CONST * q[i] * q[j] * cpl * erfc_v / r
    zero = jnp.zeros_like(e_lj)
    return (jnp.sum(jnp.where(in_range, e_lj, zero)) * lj_scale,
            jnp.sum(jnp.where(in_range, e_c, zero)) * coulomb_scale)


def make_pallas_direct_fn(top: Topology, cfg, plan: WindowPlan,
                          interpret: bool = False):
    """Build direct(x, box, couple, beta, slot_atom, inv_slot)
    -> (F [N,3], e_lj, e_c).

    Cutoff: uses max(lj_cutoff, coulomb_cutoff) as a shared spherical cutoff
    (plain truncation for LJ; the XLA path's optional switch function is not
    applied here — keep lj_switch_start=None with the pallas engine)."""
    ncx, ncy, ncz = plan.nc
    gx, gy, gz = plan.ghost_dims
    cap = plan.capacity
    h = plan.halo
    n_cells = plan.n_cells
    n_slab = (2 * h + 1) ** 2
    slab_len = (2 * h + 1) * cap
    slab_offs = tuple(
        (((dx * gy) + dy) * gz) * cap
        for dx in range(-h, h + 1) for dy in range(-h, h + 1))
    rc2 = float(plan.cutoff) ** 2
    n = plan.n_atoms

    q_np = np.asarray(top.charges) * np.asarray(top.atom_mask)
    props_np = np.stack([
        q_np, np.asarray(top.lj_sigma), np.asarray(top.lj_eps),
        np.asarray(top.couple_mask), np.asarray(top.atom_mask)],
        axis=1).astype(np.float32)                 # [N, 5]
    props = jnp.asarray(props_np)

    # ghost-shift per ghost cell (for positions): -box/0/+box per axis
    def ghost_shift_axes():
        def ax(ng, nc_):
            idx = np.arange(ng)
            s = np.zeros(ng, np.float32)
            s[idx < h] = -1.0
            s[idx >= nc_ + h] = 1.0
            return s
        return (jnp.asarray(ax(gx, ncx)), jnp.asarray(ax(gy, ncy)),
                jnp.asarray(ax(gz, ncz)))

    sx_ax, sy_ax, sz_ax = ghost_shift_axes()

    kernel = functools.partial(
        _kernel, cap=cap, gy=gy, gz=gz, ncy=ncy, ncz=ncz, halo=h,
        n_slab=n_slab, slab_len=slab_len, slab_offs=slab_offs, rc2=rc2)

    grid_spec = pl.GridSpec(
        grid=(n_cells,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # center rows
            pl.BlockSpec(memory_space=pltpu.VMEM),   # ghost prop-major
            pl.BlockSpec(memory_space=pltpu.SMEM),   # params
            pl.BlockSpec(memory_space=pltpu.SMEM),   # slab offsets
        ],
        out_specs=pl.BlockSpec((cap, 4), lambda p: (p, 0),
                               memory_space=pltpu.VMEM),
    )

    def direct(x, box, couple, beta, slot_atom, inv_slot):
        x = x.astype(jnp.float32)
        # wrap into [0, box): binning wraps, so kernel positions must too —
        # otherwise atoms that drifted out of the box sit in the right cell
        # but at raw (far) coordinates and their pairs get cutoff-masked
        x = x - box * jnp.floor(x / box)
        # packed rows: (x, y, z, q, sig, eps, cm, valid), extra row for empty
        rows = jnp.concatenate([x, props], axis=1)        # [N, 8]
        rows = jnp.concatenate(
            [rows, jnp.zeros((1, 8), jnp.float32)], axis=0)
        slot_rows = rows[jnp.where(slot_atom < 0, n, slot_atom)]  # [S, 8]
        # interior grid [ncx, ncy, ncz, C, 8] -> ghost pad wrap
        grid4 = slot_rows.reshape(ncx, ncy, ncz, cap, 8)
        ghost = jnp.pad(grid4, ((h, h), (h, h), (h, h), (0, 0), (0, 0)),
                        mode="wrap")
        ghost = ghost.at[..., 0].add(
            sx_ax[:, None, None, None] * box[0])
        ghost = ghost.at[..., 1].add(
            sy_ax[None, :, None, None] * box[1])
        ghost = ghost.at[..., 2].add(
            sz_ax[None, None, :, None] * box[2])
        ghost_t = ghost.reshape(gx * gy * gz * cap, 8).T   # [8, G]
        # materialize canonical layouts at the kernel boundary: fused
        # producers can otherwise hand the custom call unexpected layouts
        # (observed as wrong values / TPU faults in composite programs)
        slot_rows, ghost_t = jax.lax.optimization_barrier(
            (slot_rows, ghost_t))
        params = jnp.stack(
            [couple.astype(jnp.float32), jnp.asarray(beta, jnp.float32),
             jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32)]
        ).reshape(1, 4)

        f_cells = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_cells * cap, 4), jnp.float32),
            interpret=interpret,
        )(slot_rows, ghost_t, params,
          jnp.asarray([slab_offs], jnp.int32))

        f_atoms = f_cells[inv_slot, :3]
        f_atoms = f_atoms * top.atom_mask[:, None]
        e_col = f_cells[:, 3].reshape(n_cells, cap)
        e_lj = jnp.sum(e_col[:, 0])
        e_c = jnp.sum(e_col[:, 1])
        # overflow is detected at rebuild time (make_rebuild_fn)
        return f_atoms, e_lj, e_c, jnp.zeros((), jnp.int32)

    return direct
