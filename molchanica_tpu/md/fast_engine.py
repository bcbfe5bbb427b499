"""FastSim: the sorted-state MD engine around the colpair kernel.

This is the production TPU path for solvated (PBC) systems. The dynamic
state lives in column-sorted order (see ops/pallas/colpair.py) so the
per-step program does ZERO gathers and ZERO scatters on the hot path except
the small bonded/constraint index reads:

  chunk = [ rebuild (sort + window tables + index remap, every K steps) ]
          -> lax.scan over K steps of
               vsites -> colpair kernel + PME(matmul) + bonded + exclusion
               subtraction -> BAOAB/Verlet integrate -> SETTLE + H-SHAKE

All per-rebuild arrays (window table, remapped bonded/constraint indices)
flow through the jitted chunk as data, so one compiled program serves the
whole run. Reference surface parity: MdState::step / run_dynamics_blocking
(/root/reference/src/md/mod.rs:716,696).
"""
from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..constants import ACCEL_FACTOR, COULOMB_CONST, KB
from ..ops.bonded import angle_energy, bond_energy, dihedral_energy
from ..ops.pallas.colpair import (
    ICL,
    R2_MIN,
    W_MAX,
    ZBITS,
    make_colpair_direct_fn,
    make_window_fn,
    pairlist_colpair_energy,
    plan_columns,
)
from ..ops.pbc import minimum_image
from ..ops.pme import default_grid, ewald_beta_for
from ..ops.pme2 import make_pme2_recip_fn
from ..topology import Topology
from .config import MdConfig
from .settle import (settle_compute_rolled, settle_params,
                     settle_velocities_rolled)
from .state import init_velocities, kinetic_energy, remove_com_drift


def _solve3(A, b):
    """Closed-form 3x3 linear solve via Cramer's rule (batched, [C,3,3] x
    [C,3]). jnp.linalg.solve on small batched systems lowers to an LU path
    that measured ~100x slower than this on TPU."""
    a11, a12, a13 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    a21, a22, a23 = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    a31, a32, a33 = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    b1, b2, b3 = b[..., 0], b[..., 1], b[..., 2]
    c1 = a22 * a33 - a23 * a32
    c2 = a23 * a31 - a21 * a33
    c3 = a21 * a32 - a22 * a31
    det = a11 * c1 + a12 * c2 + a13 * c3
    inv = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1.0, det)
    x1 = (b1 * c1 + a12 * (a23 * b3 - b2 * a33)
          + a13 * (b2 * a32 - a22 * b3)) * inv
    x2 = (a11 * (b2 * a33 - a23 * b3) + b1 * c2
          + a13 * (a21 * b3 - b2 * a31)) * inv
    x3 = (a11 * (a22 * b3 - b2 * a32) + a12 * (b2 * a31 - a21 * b3)
          + b1 * c3) * inv
    return jnp.stack([x1, x2, x3], axis=-1)


class MiscompiledStepError(RuntimeError):
    """Non-finite energy right after a chunk — either a real instability
    or (rarely, on the axon relay) a remote-compiler fault. A fresh-process
    retry discriminates: miscompiles usually recompile clean."""


class ColpairOverflowError(RuntimeError):
    """A rebuild exceeded a planned table capacity (window slice entries,
    sort columns). step() recovers automatically at CHUNK granularity: it
    restores the last dispatch-verified good state, replans (doubling the
    per-slice window capacity only when the WINDOW tables overflowed —
    column-capacity overflow replans at the current box instead), and
    resumes the remainder — callers only see this after the retry budget
    is exhausted. `good_state`/`steps_good`/`elen_good` carry the resume
    point; `window` says which table overflowed."""

    def __init__(self, msg, good_state=None, steps_good=0, elen_good=0,
                 window=True):
        super().__init__(msg)
        self.good_state = good_state
        self.steps_good = steps_good
        self.elen_good = elen_good
        self.window = window


class _BoxDriftReplan(Exception):
    """Internal step() signal: NPT box drifted past the plan skin. The
    state IS valid up to here (its overflow flag is checked BEFORE this
    is raised) — carry the completed steps; energies already live in the
    caller's shared list."""

    def __init__(self, steps_done: int):
        super().__init__("NPT box drift — replan at the current box")
        self.steps_done = steps_done


@struct.dataclass
class FastState:
    """Everything that changes during a run, in sorted-slot order [S]."""
    perm: jnp.ndarray        # [S] int32 slot -> base atom id (n_base = dummy)
    x: jnp.ndarray           # [S, 3]
    v: jnp.ndarray           # [S, 3]
    props: jnp.ndarray       # [S, 5] (q*sqrt(kC), sigma/2, 2 sqrt(eps),
                             #         couple_mask, atom_mask)
    masses: jnp.ndarray      # [S]
    dof: jnp.ndarray         # [S]
    wl: jnp.ndarray          # [NC, W_MAX] int32 window entries
    nw: jnp.ndarray          # [NC] int32
    bond_idx: jnp.ndarray
    angle_idx: jnp.ndarray
    dihedral_idx: jnp.ndarray
    excl_idx: jnp.ndarray
    p14_idx: jnp.ndarray
    intra_idx: jnp.ndarray   # [P, 2] coupled-molecule internal pairs
    vsite_idx: jnp.ndarray   # [V, 4]
    widx: jnp.ndarray        # [NW, 3] water (O, H1, H2)
    hc_idx: jnp.ndarray      # [C, 4] heavy + 3 H (clipped; mask separate)
    # --- scatter-free merge tables (TPU scatter is serialized RMW at
    # ~300 ns/row vs ~2.4 ns/row for gather; every hot-path write-back goes
    # through "compute per-constraint -> per-slot gather + select" instead) —
    # [S] int32, rebuilt with the sort:
    w_of: jnp.ndarray        # water row owning this slot (NW = none)
    w_role: jnp.ndarray      # 0=O 1=H1 2=H2 within that water, -1 = none
    vm_of: jnp.ndarray       # vsite row whose M site is this slot (V = none)
    vp_of: jnp.ndarray       # vsite row this slot parents (V = none)
    vp_role: jnp.ndarray     # 1=O 2=H1 3=H2 parent role, -1 = none
    hc_of: jnp.ndarray       # H-cluster row owning this slot (C = none)
    hc_role: jnp.ndarray     # 0=heavy 1..3=H member, -1 = none
    # species-split subset tables (dict pytree, rebuilt with the sort;
    # {} when the split path is disabled): idx_*/props_* are the subset
    # gather indices + static per-rebuild kernel props, wl_*/nw_* the
    # per-subset window tables, gsrc the [S] merge-gather indices into
    # concat(f_L, f_Q, f_S, zero-row).
    split: dict
    f: jnp.ndarray           # [S, 3] forces at x (carried across chunks)
    rng_key: jnp.ndarray
    box: jnp.ndarray
    couple: jnp.ndarray
    step: jnp.ndarray
    overflow: jnp.ndarray    # accumulated int32
    pe_last: jnp.ndarray
    ke_last: jnp.ndarray


class FastSim:
    """Sorted-state MD engine (PBC systems). Mirrors MdSim's surface."""

    def __init__(self, top: Topology, cfg: MdConfig, x0, box_extent,
                 velocities=None, per_slice_k=None):
        assert box_extent is not None, "FastSim requires a periodic box"
        self._psk_override = per_slice_k
        self.top = top
        self.cfg = cfg
        dtype = jnp.dtype(cfg.dtype)
        assert dtype == jnp.float32, "FastSim is a float32 engine"
        self.n_base = top.n_atoms
        n_base = self.n_base
        box_np = np.asarray(box_extent, np.float64)
        rc = float(max(cfg.lj_cutoff, cfg.coulomb_cutoff))
        self.beta = float(ewald_beta_for(cfg.coulomb_cutoff, cfg.ewald_rtol))
        # Blocked-water layout (v3): every water's sites inherit the O's
        # sort key, so each water is a contiguous (O, H1, H2[, M]) slot
        # block through every rebuild — SETTLE / vsites / intra-water
        # corrections then run gather-free via jnp.roll. Window SELECTION
        # must reach r_blob (max site-to-O distance) further since keys are
        # O-based; the kernel still masks by the true rc^2.
        self._ws = int(top.water_start)
        self._wstride = int(top.water_site_count)
        self._n_wsites = int(top.water_count) * self._wstride
        r_blob = float(top.water_r_oh) if top.water_count > 0 else 0.0
        # skin 1.2 unless the box can't fit 3 columns at that reach (small
        # test boxes); never below 0.8 (pair-coverage floor, see below).
        # Column width needs rc + skin + 2*r_blob (j-O selection reach plus
        # the i-side site overhang of blocked waters).
        skin = min(1.2, float(box_np.min()) / 3.0 - rc - 2.0 * r_blob - 1e-6)
        # floor 0.25: only small validation boxes land here; production
        # boxes (>=3*(rc+1.2+2*r_blob)) always get the full 1.2
        assert skin >= 0.25 - 1e-9, \
            f"box {box_np} too small for FastSim at cutoff {rc}"
        self.plan = plan_columns(box_np, rc, self.beta, top.n_atoms_real,
                                 n_base, skin=skin, r_blob=r_blob)
        self._box0 = box_np.copy()       # plan reference box (NPT guard)
        # Skin sizing: water-H pair coverage no longer depends on libration
        # (H keys ride the O; r_blob covers the rigid offset at all times),
        # but SOLUTE hydrogens still bin by their own position, so the skin
        # keeps round-2's empirically validated 1.2 A (two-sided drift +
        # X-H libration over rebuild_every=20 steps; 1.0 A blew up the 25k
        # fixture within ~1e3 steps — one missed pair is one mega-kick).
        S = self.plan.n_sorted
        self.S = S

        # ---- base (original-order) host arrays, + dummy row at n_base ----
        def with_dummy(a, fill):
            a = np.asarray(a)
            d = np.full((1,) + a.shape[1:], fill, a.dtype)
            return np.concatenate([a, d], axis=0)

        q = np.asarray(top.charges, np.float64) * np.asarray(top.atom_mask)
        # Exclusion-group ids (kernel props col 7): a water's sites share
        # one id, so the kernel masks ALL its intra pairs directly (no
        # window-minus-subtraction for the rigid solvent — round-3 perf
        # rework); all other atoms get unique ids (their 1-2/1-3 exclusions
        # stay on the pairlist-subtraction path). 0 marks padded slots.
        gid = np.arange(n_base, dtype=np.float64)
        if self._n_wsites:
            wi = np.arange(self._n_wsites)
            gid[self._ws:self._ws + self._n_wsites] = \
                self._ws + self._wstride * (wi // self._wstride)
        props_base = np.stack([
            q * np.sqrt(COULOMB_CONST),
            np.asarray(top.lj_sigma) / 2.0,
            2.0 * np.sqrt(np.asarray(top.lj_eps)),
            np.asarray(top.couple_mask),
            (gid + 1.0) * np.asarray(top.atom_mask)], axis=1
        ).astype(np.float32)
        self._props_base = jnp.asarray(with_dummy(props_base, 0.0))
        self._charges_base = jnp.asarray(
            with_dummy(q.astype(np.float32), 0.0))
        self._masses_base = jnp.asarray(
            with_dummy(np.asarray(top.masses, np.float32), 1.0))
        self._dof_base = jnp.asarray(
            with_dummy(np.asarray(top.dof_mask, np.float32), 0.0))

        # water triplets (base order): contiguous (O, H1, H2[, M]) blocks
        if top.water_count > 0:
            stride = top.water_site_count
            o = top.water_start + stride * np.arange(top.water_count)
            widx_base = np.stack([o, o + 1, o + 2], axis=1).astype(np.int32)
        else:
            widx_base = np.full((1, 3), n_base, np.int32)
        self._widx_base = jnp.asarray(widx_base)
        self.n_waters = int(top.water_count)

        # solute H clusters (exclude waters — SETTLE owns those)
        hc_heavy = np.asarray(top.hcluster_heavy)
        hc_h = np.asarray(top.hcluster_h)
        hc_r0 = np.asarray(top.hcluster_r0)
        keep = (hc_h >= 0).any(axis=1)
        self._use_hshake = (cfg.hydrogen_constraint.kind != "flexible"
                            and bool(keep.any()))
        if self._use_hshake:
            hh = hc_h[keep]
            hc_idx = np.concatenate(
                [hc_heavy[keep][:, None], np.where(hh < 0, n_base, hh)],
                axis=1).astype(np.int32)
            self._hc_mask = jnp.asarray((hh >= 0).astype(np.float32))
            self._hc_r0 = jnp.asarray(
                np.where(hh >= 0, hc_r0[keep], 1.0).astype(np.float32))
            hmass = np.asarray(top.masses)
            inv_m = np.zeros((hc_idx.shape[0], 4), np.float32)
            inv_m[:, 0] = 1.0 / hmass[hc_idx[:, 0]]
            for k in range(3):
                hk = hh[:, k]
                inv_m[:, k + 1] = np.where(
                    hk >= 0, 1.0 / hmass[np.clip(hk, 0, n_base - 1)], 0.0)
            self._hc_invm = jnp.asarray(inv_m)
            self._hc_idx_base = jnp.asarray(hc_idx)
            self.n_h_constraints = int((hh >= 0).sum())
        else:
            self._hc_idx_base = jnp.full((1, 4), n_base, jnp.int32)
            self._hc_mask = jnp.zeros((1, 3), jnp.float32)
            self._hc_r0 = jnp.ones((1, 3), jnp.float32)
            self._hc_invm = jnp.zeros((1, 4), jnp.float32)
            self.n_h_constraints = 0

        self.n_constraints = 3 * self.n_waters + self.n_h_constraints

        # vsites
        vs = np.asarray(top.vsite_idx)
        vmask = np.asarray(top.vsite_mask) > 0
        if vmask.any():
            self._vs_base = jnp.asarray(
                np.where(vmask[:, None], vs, n_base).astype(np.int32))
            self._vs_w = jnp.asarray(np.asarray(top.vsite_weight, np.float32))
            self._has_vsites = True
            # rolled path: all vsites are 4-site-water M's (M = O+3 in the
            # block) with one shared weight -> apply/spread via jnp.roll
            vw = np.asarray(top.vsite_weight)[vmask]
            vv = vs[vmask]
            self._vsites_rolled = bool(
                self._wstride == 4
                and vv.shape[0] == top.water_count
                and (vv[:, 0] == vv[:, 1] + 3).all()
                and (vv[:, 2] == vv[:, 1] + 1).all()
                and (vv[:, 3] == vv[:, 1] + 2).all()
                and ((vv[:, 1] - self._ws) % 4 == 0).all()
                and np.allclose(vw, vw[0]))
            self._vs_w_scalar = float(vw[0]) if self._vsites_rolled else 0.0
        else:
            self._vs_base = jnp.full((1, 4), n_base, jnp.int32)
            self._vs_w = jnp.zeros((1,), jnp.float32)
            self._has_vsites = False
            self._vsites_rolled = False
            self._vs_w_scalar = 0.0

        if self.n_waters:
            self._settle_geom = settle_params(
                top.water_r_oh, top.water_theta_hoh, 15.999, 1.008)
        else:
            self._settle_geom = (0.1, 0.1, 0.1)

        # 1-4 scale divisors (per pair row)
        self._p14_scee = jnp.asarray(
            1.0 / np.maximum(np.asarray(top.pair14_scee), 1e-6),
            jnp.float32)
        self._p14_scnb = jnp.asarray(
            1.0 / np.maximum(np.asarray(top.pair14_scnb), 1e-6),
            jnp.float32)

        # Water intra pairs are masked in-kernel (shared group id) and
        # their reciprocal-space erf compensation is computed gather-free
        # via rolls; drop them from the pairlist exclusion set (which at
        # 25k sites was ~90% water rows).
        excl_np = np.asarray(top.excl_idx)
        exm_np = np.asarray(top.excl_mask, np.float32)
        if self._n_wsites:
            lo, hi = self._ws, self._ws + self._n_wsites
            in_w = ((excl_np[:, 0] >= lo) & (excl_np[:, 0] < hi)
                    & (excl_np[:, 1] >= lo) & (excl_np[:, 1] < hi))
            keep = ~(in_w & (exm_np > 0))
            if not keep.any():
                keep[0] = True          # fixed nonzero shape
            excl_np = excl_np[keep]
            exm_np = exm_np[keep] * (~in_w[keep])
            wq = np.asarray(top.charges)[self._ws:self._ws + self._wstride]
            self._wq = [float(v) for v in wq]
            assert not (np.asarray(top.couple_mask)[
                self._ws:self._ws + self._n_wsites] > 0).any(), \
                "alchemically coupled waters unsupported by FastSim"
        else:
            self._wq = []
        self._excl_idx_base = jnp.asarray(excl_np.astype(np.int32))
        self._excl_mask = jnp.asarray(exm_np.astype(np.float32))

        # PME: order-6 splines on a ~1.3 A mesh + matmul-DFT (ops/pme3.py);
        # ~2.5x cheaper than the order-4 64^3 v2 path at equal accuracy.
        # MOLCHANICA_PME=2 falls back to the round-2-validated pme2 path
        # (A/B debugging knob).
        import os as _os
        if _os.environ.get("MOLCHANICA_PME", "3") == "2":
            from ..ops.pme import default_grid
            grid = cfg.pme_grid or default_grid(box_np)
            self._recip = make_pme2_recip_fn(grid, self.beta,
                                             dtype=jnp.float32)
        else:
            from ..ops.pme3 import default_grid6, make_pme3_recip_fn
            grid = cfg.pme_grid or default_grid6(box_np, self.beta)
            # custom_grad: analytic force pass instead of reverse-mode
            # through the spread loop (which stores every per-chunk panel —
            # measured 3.3 ms of 4.5 ms at 25k sites). Box cotangent is
            # zero under custom_grad; FastSim never differentiates the box
            # (NPT pressure uses finite differences, _get_baro_fn).
            self._recip = make_pme3_recip_fn(grid, self.beta, order=6,
                                             dtype=jnp.float32,
                                             custom_grad=True)

        # kernel instances
        has_alch = bool(np.asarray(top.couple_mask).sum() > 0)
        self._has_alch = has_alch
        # couple-intramol=no compensation pairs (see ops/nonbonded.py)
        from ..ops.nonbonded import intramol_pairs_np
        _im_idx, _im_mask = intramol_pairs_np(top)
        self._im_idx_base = jnp.asarray(_im_idx)
        self._im_mask = jnp.asarray(_im_mask)
        interpret = jax.default_backend() == "cpu"   # tests / CPU mesh
        # triangular: each unordered pair in exactly one tile (Newton's
        # third law via the kernel's j-side VMEM accumulator) — half the
        # pair math of the symmetric table. Env knob for A/B debugging.
        import os
        tri = os.environ.get("MOLCHANICA_FASTSIM_TRI", "1") == "1"
        # flat slice tables (one window entry = one 128-lane slice): kills
        # the per-range scalar overhead (ceil-div + nested fori_loop setup,
        # chip-measured ~0.5 us/range ~ 45% of kernel time). 0 disables.
        psk = (self._psk_override if self._psk_override is not None
               else int(os.environ.get("MOLCHANICA_PERSLICE_K", "64")))
        self._psk = psk
        # Experimental: route PME spread/interp through the charged-site
        # subset only (~75% of an OPC box carries charge; the O does not).
        # Chip A/B: isolated recip grad 0.661 -> 0.522 ms, but end-to-end
        # force step unchanged (3.89 ms both ways) -- XLA overlaps the
        # recip with the direct kernels, so the saving is hidden. Default
        # OFF until it buys wall-clock.
        self._pme_subset = os.environ.get("MOLCHANICA_PME_SUBSET",
                                          "0") == "1"
        self._direct = make_colpair_direct_fn(
            self.plan, has_alch=has_alch, want_energy=True,
            interpret=interpret, triangular=tri, per_slice_k=psk)
        # force-only kernel for the hot (non-recording) chunk path: the
        # LJ/Coulomb energy accumulators cost ~8-10% of the pair tile and
        # are only needed at snapshot/record time (explicit variant — not
        # compiler DCE; see _pair_tile)
        self._direct_ne = make_colpair_direct_fn(
            self.plan, has_alch=has_alch, want_energy=False,
            interpret=interpret, triangular=tri, per_slice_k=psk)

        # ---- species-split direct path (round 4) ------------------------
        # In a rigid multi-site water the interaction roles factor: OPC's O
        # carries only LJ (q=0) and its H/M sites only charge (eps=0), so
        # most of the 4x4 site-pair work at 25k sites is structurally
        # empty. Split the direct sum into two triangular kernels over two
        # overlapping subsets:
        #   L = water LJ sites (O) + ALL solute/ion atoms, full LJ+Coulomb
        #       math (O's q=0 makes its Coulomb terms vanish; solute-solute
        #       and solute-O pairs are complete here);
        #   Q = water charge sites (H/M) + ALL solute/ion atoms, pure
        #       Coulomb math, with solute-solute pairs FILTERED (the L
        #       kernel owns them) via the water group-id range test.
        # O-H/M pairs never pair up (different subsets) — they have no
        # interaction (q_O = 0, eps_HM = 0). Net: pair slots ~0.65x and
        # most of them Coulomb-only math, vs the monolithic kernel.
        # Subset arrays reuse the master column sort (per-column runs
        # padded to ICL, see _subset_tables). Reference capability this
        # accelerates: the CUDA pair kernel
        # (/root/reference/src/cuda/util.cu:93).
        self._split = None
        if (tri and self._n_wsites
                and os.environ.get("MOLCHANICA_SPLIT", "1") == "1"):
            wst = self._wstride
            weps = np.asarray(top.lj_eps)[self._ws:self._ws + wst]
            wq_r = np.asarray(top.charges)[self._ws:self._ws + wst]
            lj_roles = [r for r in range(wst) if weps[r] > 0]
            q_roles = [r for r in range(wst) if abs(wq_r[r]) > 1e-12]
            split_ok = (lj_roles and q_roles
                        and not set(lj_roles) & set(q_roles))
            if split_ok:
                idx_b = np.arange(n_base)
                in_w_b = ((idx_b >= self._ws)
                          & (idx_b < self._ws + self._n_wsites))
                role_b = np.where(in_w_b, (idx_b - self._ws) % wst, -1)
                amask_b = np.asarray(top.atom_mask) > 0
                in_sol = (~in_w_b) & amask_b
                has_solute = bool(in_sol.sum() > 0)
                in_L = (np.isin(role_b, lj_roles) & amask_b) | in_sol
                in_Q = (np.isin(role_b, q_roles) & amask_b) | in_sol
                n_cols = self.plan.n_cols

                def sub_size(n):
                    cap = int(n) + ICL * n_cols
                    return ((cap + 127) // 128) * 128

                import dataclasses as _dc
                S_L = sub_size(in_L.sum())
                S_Q = sub_size(in_Q.sum())
                # L keys: O sites key by their own (anchor) position and
                # solute atoms by theirs, so no blob margin is needed
                # unless solute is present with water-keyed H (solute H
                # bins by its own position too) — r_blob=0 is exact for L.
                plan_L = _dc.replace(self.plan, n_sorted=S_L, r_blob=0.0)
                plan_Q = _dc.replace(self.plan, n_sorted=S_Q)
                wlo = float(self._ws + 1)
                whi = float(self._ws + self._n_wsites + 1)
                mode_L = "full" if has_solute else "lj"
                wfilt = (wlo, whi) if has_solute else None
                kset = {}
                for we in (True, False):
                    kset[we] = dict(
                        L=make_colpair_direct_fn(
                            plan_L, has_alch=has_alch, want_energy=we,
                            interpret=interpret, triangular=True,
                            mode=mode_L, per_slice_k=psk),
                        Q=make_colpair_direct_fn(
                            plan_Q, has_alch=has_alch, want_energy=we,
                            interpret=interpret, triangular=True,
                            mode="coul", water_filter=wfilt,
                            per_slice_k=psk),
                    )
                in_pme = (np.abs(np.asarray(top.charges))
                          * np.asarray(top.atom_mask)) > 1e-12
                S_P = ((int(in_pme.sum()) + 127) // 128) * 128
                self._split = dict(
                    S_L=S_L, S_Q=S_Q, S_P=max(S_P, 128),
                    plan_L=plan_L, plan_Q=plan_Q,
                    in_L_ext=jnp.asarray(np.append(in_L, False)),
                    in_Q_ext=jnp.asarray(np.append(in_Q, False)),
                    in_pme_ext=jnp.asarray(np.append(in_pme, False)),
                    kernels=kset, has_solute=has_solute,
                    win_L=make_window_fn(plan_L, triangular=True,
                                         per_slice_k=psk),
                    win_Q=make_window_fn(plan_Q, triangular=True,
                                         per_slice_k=psk),
                )

        # sort/window programs. The sort is ANCHOR-based: one key per
        # molecule block (waters) / free atom, argsort over ~N/3 keys, then
        # expansion to consecutive slots — blocking by construction and a
        # ~3x cheaper argsort (the single biggest rebuild cost on chip).
        if self._n_wsites:
            wc = top.water_count
            anchor_ids = np.concatenate([
                np.arange(0, self._ws),
                self._ws + self._wstride * np.arange(wc),
                np.arange(self._ws + self._n_wsites, n_base)])
            sizes = np.concatenate([
                np.ones(self._ws, np.int64),
                np.full(wc, self._wstride, np.int64),
                np.ones(n_base - self._ws - self._n_wsites, np.int64)])
        else:
            anchor_ids = np.arange(n_base)
            sizes = np.ones(n_base, np.int64)
        from ..ops.pallas.colpair import make_anchor_sort_fn
        self._anchor_sort = make_anchor_sort_fn(
            self.plan, anchor_ids, sizes, np.asarray(top.atom_mask))
        self._windows = make_window_fn(self.plan, triangular=tri,
                                       per_slice_k=psk)
        # static base-order helpers for the molecule-frame wrap
        idx_b = np.arange(n_base)
        in_w_b = (idx_b >= self._ws) & (idx_b < self._ws + self._n_wsites)
        role_b = np.where(in_w_b, (idx_b - self._ws) % max(self._wstride, 1),
                          0)
        self._in_w_base = jnp.asarray(in_w_b)
        self._owner_base = jnp.asarray((idx_b - role_b).astype(np.int32))

        # ---- initial state: identity layout, then one rebuild ----
        x0_np = np.asarray(x0, np.float32)
        assert x0_np.shape[0] == n_base
        pad = S - n_base
        x_init = np.concatenate(
            [x0_np, np.full((pad, 3), 1.0e6, np.float32)], axis=0)
        key = jax.random.PRNGKey(cfg.seed)
        key, vkey = jax.random.split(key)
        if velocities is None:
            v0 = jax.jit(lambda k: init_velocities(
                k, top.masses, top.dof_mask, cfg.temp_target, jnp.float32)
            )(vkey)
            v0 = np.asarray(v0)
        else:
            v0 = np.asarray(velocities, np.float32)
        v_init = np.concatenate([v0, np.zeros((pad, 3), np.float32)], axis=0)
        perm_init = np.concatenate([
            np.arange(n_base, dtype=np.int32),
            np.full((pad,), n_base, np.int32)])

        zeros_i = jnp.zeros((), jnp.int32)
        # identity-layout merge tables (base ids == slots before the first
        # rebuild; replaced immediately by _rebuild)
        init_tables = self._merge_tables(
            self._widx_base, self._vs_base, self._hc_idx_base)
        sp0 = {}
        if self._split is not None:
            spc = self._split
            zrow = spc["S_L"] + spc["S_Q"]

            def sub0(pl_sub, key):
                return {
                    f"idx_{key}": jnp.full((pl_sub.n_sorted,), S, jnp.int32),
                    f"props_{key}": jnp.zeros((pl_sub.n_sorted, 5),
                                              jnp.float32),
                    f"wl_{key}": jnp.zeros(
                        (pl_sub.n_clusters,
                         3 * (self._psk or pl_sub.w_max)), jnp.int32),
                    f"nw_{key}": jnp.zeros(
                        (pl_sub.n_clusters,), jnp.int32),
                }

            sp0 = dict(**sub0(spc["plan_L"], "l"),
                       **sub0(spc["plan_Q"], "q"),
                       gsrc_l=jnp.full((S,), zrow, jnp.int32),
                       gsrc_q=jnp.full((S,), zrow, jnp.int32),
                       pme_idx=jnp.full((spc["S_P"],), S, jnp.int32),
                       pme_q=jnp.zeros((spc["S_P"],), jnp.float32),
                       pme_cm=jnp.zeros((spc["S_P"],), jnp.float32),
                       pme_gsrc=jnp.full((S,), spc["S_P"], jnp.int32))
        state = FastState(
            split=sp0,
            perm=jnp.asarray(perm_init),
            x=jnp.asarray(x_init),
            v=jnp.asarray(v_init),
            props=self._props_base[jnp.asarray(perm_init)],
            masses=self._masses_base[jnp.asarray(perm_init)],
            dof=self._dof_base[jnp.asarray(perm_init)],
            wl=jnp.zeros((self.plan.n_clusters,
                          3 * (self._psk or self.plan.w_max)),
                         jnp.int32),
            nw=jnp.zeros((self.plan.n_clusters,), jnp.int32),
            bond_idx=top.bond_idx, angle_idx=top.angle_idx,
            dihedral_idx=top.dihedral_idx, excl_idx=self._excl_idx_base,
            p14_idx=top.pair14_idx, intra_idx=self._im_idx_base,
            vsite_idx=self._vs_base,
            widx=self._widx_base, hc_idx=self._hc_idx_base,
            f=jnp.zeros((S, 3), jnp.float32),
            rng_key=key,
            box=jnp.asarray(box_np, jnp.float32),
            couple=jnp.asarray(1.0, jnp.float32),
            step=zeros_i, overflow=zeros_i,
            pe_last=jnp.zeros((), jnp.float32),
            ke_last=jnp.zeros((), jnp.float32),
            **init_tables,
        )
        self._rebuild_jit = jax.jit(self._rebuild)
        self.state = self._rebuild_jit(state)
        # project the initial geometry onto the constraint manifold (the
        # reference engine does this inside MdState::new), then seed the
        # carried force (each chunk step does exactly ONE force eval and
        # hands its force to the next step's kick — no duplicate evals)
        cp, _ = self._make_cp_cv()
        force = self._make_force_fn(None)

        def _init_state(s):
            if cp is not None:
                s = s.replace(x=cp(s.x, s.x, s))
            f0, (e0, _t) = force(s.x, s)
            return s.replace(f=f0, pe_last=e0)

        self.state = jax.jit(_init_state)(self.state)
        self.snapshots: list = []
        self._wall_time = 0.0
        self._chunk_cache = {}
        self._last_terms = {}
        # Reference parity: MdState::new runs initial energy relaxation
        # (src/md/mod.rs max_init_relaxation_iters). Skipped when the caller
        # supplies velocities (restart / pre-equilibrated fixture).
        if velocities is None and cfg.max_init_relaxation_iters:
            self.minimize(int(cfg.max_init_relaxation_iters))

    # ------------------------------------------------------------------
    def _merge_tables(self, widx, vsite_idx, hc_idx):
        """Per-slot ownership tables for the scatter-free write-backs.

        For index rows (slot lists), produce [S] arrays mapping each slot to
        the row that owns it and its member role. Built once per rebuild
        (the only scatters left, amortized over neighbor_rebuild_every).
        """
        S = self.S

        def tables(idx, roles):
            R = idx.shape[0]
            k = idx.shape[1]
            of = jnp.full((S + 1,), R, jnp.int32)
            rl = jnp.full((S + 1,), -1, jnp.int32)
            slots = jnp.clip(idx.reshape(-1), 0, S)
            rows = jnp.repeat(jnp.arange(R, dtype=jnp.int32), k)
            rr = jnp.tile(jnp.asarray(roles, jnp.int32), R)
            of = of.at[slots].set(rows)
            rl = rl.at[slots].set(rr)
            return of[:S], rl[:S]     # dummy sink row S dropped

        w_of, w_role = tables(widx, [0, 1, 2])
        vm_of, _ = tables(vsite_idx[:, 0:1], [0])
        vp_of, vp_role = tables(vsite_idx[:, 1:], [1, 2, 3])
        hc_of, hc_role = tables(hc_idx, [0, 1, 2, 3])
        return dict(w_of=w_of, w_role=w_role, vm_of=vm_of,
                    vp_of=vp_of, vp_role=vp_role,
                    hc_of=hc_of, hc_role=hc_role)

    # ------------------------------------------------------------------
    def _subset_tables(self, perm_new, keys, col_start, x_new, props_new,
                       box):
        """Species-split subset arrays, derived from the master sort.

        Each subset keeps the master's per-column ordering with its own
        per-column runs padded to ICL multiples (the invariant the window
        builder and kernel grid rely on). Returns the split dict for
        FastState plus the summed overflow."""
        spc = self._split
        S = self.S
        n_cols = self.plan.n_cols
        zmaxv = (1 << ZBITS) - 1
        slot_col = jnp.minimum(jnp.searchsorted(
            col_start[1:], jnp.arange(S, dtype=jnp.int32), side="right"
        ).astype(jnp.int32), n_cols - 1)
        x_ext = jnp.concatenate(
            [x_new, jnp.full((1, 3), 1.0e6, jnp.float32)], axis=0)
        keys_ext = jnp.concatenate([keys, jnp.zeros((1,), keys.dtype)])
        props_ext = jnp.concatenate(
            [props_new, jnp.zeros((1, props_new.shape[1]), jnp.float32)],
            axis=0)

        def build(in_ext, S_sub):
            # Gather-free subset construction (TPU scatter is serialized
            # RMW — the .at[].set inverse build measured ~10 ms/subset at
            # 25k sites): the k-th member of column c sits at the master
            # slot where the membership cumsum first reaches its rank, one
            # vectorized searchsorted for the whole subset array.
            m = in_ext[perm_new]                     # [S]; pads -> False
            mi = m.astype(jnp.int32)
            mcum = jnp.cumsum(mi)                    # inclusive
            me = mcum - mi                           # exclusive
            me_ext = jnp.concatenate([me, mcum[-1:]])
            nb = me_ext[col_start]                   # members before column
            cnt = nb[1:] - nb[:-1]
            pcnt = ((cnt + ICL - 1) // ICL) * ICL
            cs = jnp.concatenate(
                [jnp.zeros((1,), jnp.int32),
                 jnp.cumsum(pcnt).astype(jnp.int32)])
            ovf = jnp.maximum(cs[-1] - S_sub, 0)
            tt = jnp.arange(S_sub, dtype=jnp.int32)
            sub_col = jnp.minimum(jnp.searchsorted(
                cs[1:], tt, side="right").astype(jnp.int32), n_cols - 1)
            r_in = tt - cs[sub_col]
            valid = r_in < cnt[sub_col]
            want = nb[sub_col] + r_in
            found = jnp.searchsorted(
                mcum, want + 1, side="left").astype(jnp.int32)
            idx = jnp.where(valid, jnp.minimum(found, S - 1), S)
            pad_key = (sub_col << ZBITS) | zmaxv
            kk = jnp.where(valid, keys_ext[jnp.minimum(idx, S)], pad_key)
            # master slot -> subset row (for the force merge), -1 = absent
            gs = jnp.where(m, cs[slot_col] + (me - nb[slot_col]), -1)
            return idx, kk, cs, ovf, gs

        idx_l, keys_l, cs_l, ov1, gs_l = build(spc["in_L_ext"], spc["S_L"])
        idx_q, keys_q, cs_q, ov2, gs_q = build(spc["in_Q_ext"], spc["S_Q"])
        props_l = props_ext[idx_l]
        props_q = props_ext[idx_q]
        wl_l, nw_l, ov3 = spc["win_L"](
            x_ext[idx_l], keys_l, box, props_l[:, 4], cs_l)
        wl_q, nw_q, ov4 = spc["win_Q"](
            x_ext[idx_q], keys_q, box, props_q[:, 4], cs_q)
        ovf_col = ov1 + ov2          # subset column capacity (sort)
        ovf_win = ov3 + ov4          # subset window tables
        sp = dict(idx_l=idx_l, props_l=props_l, wl_l=wl_l, nw_l=nw_l,
                  idx_q=idx_q, props_q=props_q, wl_q=wl_q, nw_q=nw_q)
        # merge-gathers: master slot -> its row(s) in concat(fL, fQ,
        # 0-row). Solute atoms live in BOTH subsets (their L and Q force
        # halves add); water/pad slots point one gather at the zero row.
        zrow = spc["S_L"] + spc["S_Q"]
        sp["gsrc_l"] = jnp.where(gs_l >= 0, gs_l, zrow)
        sp["gsrc_q"] = jnp.where(gs_q >= 0, spc["S_L"] + gs_q, zrow)
        # charged-subset PME: only |q|>0 sites enter spread/interpolation
        # (~75% of an OPC box — the O carries no charge). Computed outside
        # the e_rest grad so the merge is a gather, not a scatter.
        mq = spc["in_pme_ext"][perm_new]
        mqc = jnp.cumsum(mq.astype(jnp.int32))
        nqp = spc["S_P"]
        tq = jnp.arange(nqp, dtype=jnp.int32)
        vq = tq < mqc[-1]
        idx_p = jnp.where(vq, jnp.searchsorted(
            mqc, tq + 1, side="left").astype(jnp.int32), S)
        sp["pme_idx"] = idx_p
        sp["pme_q"] = props_ext[idx_p, 0]
        sp["pme_cm"] = props_ext[idx_p, 3]
        sp["pme_gsrc"] = jnp.where(mq, mqc - 1, nqp)
        return sp, ovf_col, ovf_win

    # ------------------------------------------------------------------
    def _rebuild(self, st: FastState) -> FastState:
        """Re-sort by column (anchor-based), regather, remap, rebuild
        windows. Works in BASE order: state is scattered back to base ids,
        molecule-frame wrapped there (static owner tables), anchor-sorted,
        and every index array is re-derived from the STATIC base arrays —
        no permutation composition."""
        S = self.S
        n_base = self.n_base
        # virtual sites (dof 0) are never moved by the integrator/minimizer
        # — refresh them from their parents BEFORE sorting, or the M charge
        # carriers get binned at stale positions and their interactions are
        # planned (and reported) wrong
        x = self._apply_vsites(st.x, st.vsite_idx, st.box, st.vm_of)
        xb = jnp.full((n_base + 1, 3), 1.0e6, jnp.float32
                      ).at[st.perm].set(x)[:n_base]
        vb = jnp.zeros((n_base + 1, 3), jnp.float32
                       ).at[st.perm].set(st.v)[:n_base]
        fb = jnp.zeros((n_base + 1, 3), jnp.float32
                       ).at[st.perm].set(st.f)[:n_base]
        xw = xb - st.box * jnp.floor(xb / st.box)         # per-atom wrap
        if self._n_wsites:
            # Wrap waters as MOLECULES in the O's frame: the kernel's baked
            # x/y window shifts assume every stored coordinate lies in the
            # column claimed by its (O-inherited) key, so H/M coordinates
            # are stored relative to the wrapped O, never independently.
            rel = minimum_image(xb - xb[self._owner_base], st.box)
            xw = jnp.where(self._in_w_base[:, None],
                           xw[self._owner_base] + rel, xw)
        perm_new, keys, col_start, ovf1 = self._anchor_sort(xw, st.box)
        x_ext = jnp.concatenate(
            [xw, jnp.full((1, 3), 1.0e6, jnp.float32)], axis=0)
        v_ext = jnp.concatenate([vb, jnp.zeros((1, 3), jnp.float32)], 0)
        f_ext = jnp.concatenate([fb, jnp.zeros((1, 3), jnp.float32)], 0)
        x_new = x_ext[perm_new]
        v_new = v_ext[perm_new]
        f_new = f_ext[perm_new]
        props_new = self._props_base[perm_new]
        masses_new = self._masses_base[perm_new]
        dof_new = self._dof_base[perm_new]
        # base id -> new slot (dummy/base-pad -> S)
        inv = jnp.full((n_base + 1,), S, jnp.int32)
        inv = inv.at[perm_new].set(jnp.arange(S, dtype=jnp.int32))
        inv = inv.at[n_base].set(S)

        def remap(idx):
            return inv[jnp.clip(idx, 0, n_base)]

        top = self.top
        wl, nw, ovf2 = self._windows(x_new, keys, st.box,
                                     props_new[:, 4], col_start)
        widx_new = remap(self._widx_base)
        vsite_new = remap(self._vs_base)
        hc_new = remap(self._hc_idx_base)
        if self._split is not None:
            sp, ovf3c, ovf3w = self._subset_tables(
                perm_new, keys, col_start, x_new, props_new, st.box)
        else:
            zero = jnp.zeros((), jnp.int32)
            sp, ovf3c, ovf3w = {}, zero, zero
        return st.replace(
            split=sp,
            perm=perm_new, x=x_new, v=v_new, f=f_new, props=props_new,
            masses=masses_new, dof=dof_new, wl=wl, nw=nw,
            bond_idx=remap(top.bond_idx), angle_idx=remap(top.angle_idx),
            dihedral_idx=remap(top.dihedral_idx),
            excl_idx=remap(self._excl_idx_base),
            p14_idx=remap(top.pair14_idx),
            intra_idx=remap(self._im_idx_base),
            vsite_idx=vsite_new, widx=widx_new,
            hc_idx=hc_new,
            # two overflow sources, bit-packed so recovery can tell them
            # apart (advisor round-4): low 15 bits = column capacity
            # (widening window tables cannot fix it — replan at the same
            # capacity formula / current box), high bits = window-slice
            # tables (fixed by doubling per_slice_k). OR-accumulated so a
            # flag from any rebuild in a multi-period chunk survives.
            overflow=st.overflow | (
                jnp.minimum(ovf1 + ovf3c, 0x7FFF)
                + (jnp.minimum(ovf2 + ovf3w, 0x7FFF) << 15)),
            **self._merge_tables(widx_new, vsite_new, hc_new),
        )

    # ------------------------------------------------------------------
    # Vsite apply/spread, scatter-free: each M-slot / parent-slot PULLS its
    # update through the [S] role tables instead of the vsite rows pushing
    # (TPU scatter is serialized RMW; gather+select is ~100x cheaper here).
    def _apply_vsites(self, x, vsite_idx, box, vm_of):
        if not self._has_vsites:
            return x
        if self._vsites_rolled:
            # blocked layout: O at M-3, H1 at M-2, H2 at M-1 — peers via
            # roll, no gathers. xm computed "as if every slot were an O",
            # then shifted +3 onto the M slots and masked in.
            w = self._vs_w_scalar
            d1 = minimum_image(jnp.roll(x, -1, 0) - x, box)
            d2 = minimum_image(jnp.roll(x, -2, 0) - x, box)
            xm = x + w * (d1 + d2)
            m_m = (vm_of < vsite_idx.shape[0])[:, None]
            return jnp.where(m_m, jnp.roll(xm, 3, 0), x)
        o = vsite_idx[:, 1]
        h1 = vsite_idx[:, 2]
        h2 = vsite_idx[:, 3]
        w = self._vs_w[:, None]
        d1 = minimum_image(x[h1] - x[o], box)
        d2 = minimum_image(x[h2] - x[o], box)
        xm = x[o] + w * (d1 + d2)                          # [V, 3]
        V = xm.shape[0]
        xm_ext = jnp.concatenate(
            [xm, jnp.zeros((1, 3), xm.dtype)], axis=0)
        cand = xm_ext[jnp.minimum(vm_of, V)]
        return jnp.where((vm_of < V)[:, None], cand, x)

    def _spread_vsite_forces(self, f, vsite_idx, vp_of, vp_role, vm_of):
        if not self._has_vsites:
            return f
        if self._vsites_rolled:
            w = self._vs_w_scalar
            m_m = (vm_of < vsite_idx.shape[0])[:, None]
            m_o = jnp.roll(m_m, -3, 0)          # O slot = M - 3
            m_h1 = jnp.roll(m_m, -2, 0)
            m_h2 = jnp.roll(m_m, -1, 0)
            zero = jnp.zeros_like(f)
            add = (jnp.where(m_o, (1.0 - 2.0 * w) * jnp.roll(f, -3, 0),
                             zero)
                   + jnp.where(m_h1, w * jnp.roll(f, -2, 0), zero)
                   + jnp.where(m_h2, w * jnp.roll(f, -1, 0), zero))
            return jnp.where(m_m, zero, f + add)
        m = vsite_idx[:, 0]
        fm = f[m]                                          # [V, 3]
        V = fm.shape[0]
        fm_ext = jnp.concatenate(
            [fm, jnp.zeros((1, 3), fm.dtype)], axis=0)
        row = jnp.minimum(vp_of, V)
        g = fm_ext[row]                                    # [S, 3]
        w_ext = jnp.concatenate(
            [self._vs_w, jnp.zeros((1,), self._vs_w.dtype)])[row]
        coef = jnp.where(vp_role == 1, 1.0 - 2.0 * w_ext, w_ext)
        f = jnp.where((vp_of < V)[:, None], f + coef[:, None] * g, f)
        return jnp.where((vm_of < V)[:, None], 0.0, f)

    # ------------------------------------------------------------------
    def _make_force_fn(self, st_template, want_energy=True,
                       recip_weight=1.0):
        """force(x, st) -> (f, (e, terms)). Index arrays come from `st`.

        recip_weight: multiplier on the reciprocal-space (PME) force —
        1.0 for the plain path; the impulse-MTS hot path uses 0.0 / 2.0
        on alternating steps (r-RESPA: the slow recip force is applied as
        a double kick every second step; see _get_chunk_fn). The recip
        gradient is always evaluated OUTSIDE the e_rest value_and_grad
        (custom-VJP pass; identical cost, and weight 0 skips it)."""
        plan = self.plan
        beta = self.beta
        ov = self.cfg.overrides
        scee = self._p14_scee
        scnb = self._p14_scnb

        direct = self._direct if want_energy else self._direct_ne

        split = self._split
        skern = (split["kernels"][bool(want_energy)]
                 if split is not None else None)
        rw = float(recip_weight)

        def force(x, st: FastState):
            box = st.box
            couple = st.couple
            props = st.props
            x_v = self._apply_vsites(x, st.vsite_idx, box, st.vm_of)
            if split is not None:
                # species-split direct sum: L = {water O + solute}, full
                # math; Q = {water H/M + solute}, Coulomb-only with
                # solute-solute pairs filtered (L owns them). See __init__.
                sp = st.split
                x_ext = jnp.concatenate(
                    [x_v, jnp.full((1, 3), 1.0e6, jnp.float32)], axis=0)
                rows_l = jnp.concatenate(
                    [x_ext[sp["idx_l"]], sp["props_l"]], axis=1)
                f_l, elj_l, ec_l = skern["L"](
                    rows_l, rows_l.T, sp["wl_l"], sp["nw_l"], box, couple)
                rows_q = jnp.concatenate(
                    [x_ext[sp["idx_q"]], sp["props_q"]], axis=1)
                f_q, elj_q, ec_q = skern["Q"](
                    rows_q, rows_q.T, sp["wl_q"], sp["nw_q"], box, couple)
                comb = jnp.concatenate(
                    [f_l, f_q, jnp.zeros((1, 3), jnp.float32)], axis=0)
                f_dir = comb[sp["gsrc_l"]] + comb[sp["gsrc_q"]]
                e_lj = elj_l + elj_q
                e_c = ec_l + ec_q
                if self._pme_subset and rw != 0.0:
                    # charged-subset PME, outside the e_rest grad (a
                    # gathered recip input inside value_and_grad would
                    # transpose to a TPU scatter-add; here the force
                    # merges by one gather)
                    xq = x_ext[sp["pme_idx"]]
                    q_sub = (sp["pme_q"]
                             / np.float32(np.sqrt(COULOMB_CONST))) \
                        * (1.0 - sp["pme_cm"] * (1.0 - couple))
                    e_recip_o, g_q = jax.value_and_grad(
                        lambda xx: self._recip(xx, q_sub, box))(xq)
                    f_pme = jnp.concatenate(
                        [g_q, jnp.zeros((1, 3), jnp.float32)],
                        axis=0)[sp["pme_gsrc"]]
                else:
                    e_recip_o = None
                    f_pme = None
            else:
                rows = jnp.concatenate(
                    [x_v, props, jnp.zeros((self.S, 0), jnp.float32)],
                    axis=1)
                pT = rows.T
                f_dir, e_lj, e_c = direct(
                    rows, pT, st.wl, st.nw, box, couple)
                e_recip_o = None
                f_pme = None

            q_kc = props[:, 0]
            sh = props[:, 1]
            se = props[:, 2]
            cm = props[:, 3]
            # np.float32: a bare np.sqrt() scalar is strongly-typed f64 and
            # would promote q_plain (and everything downstream, incl. the
            # PME cotangents) to f64 under jax_enable_x64
            q_plain = q_kc / np.float32(np.sqrt(COULOMB_CONST))
            if f_pme is None and rw != 0.0:
                # full-array recip, outside the e_rest grad (custom-VJP
                # force pass; constant w.r.t. the e_rest differentiation)
                q_eff_o = q_plain * (1.0 - cm * (1.0 - couple))
                e_recip_o, f_pme = jax.value_and_grad(
                    lambda xx: self._recip(xx, q_eff_o, box))(x_v)
            elif rw == 0.0:
                e_recip_o, f_pme = jnp.zeros((), jnp.float32), None

            def e_rest_fn(xv):
                eb = bond_energy(xv, box, st.bond_idx, self.top.bond_k,
                                 self.top.bond_r0)
                ea = angle_energy(xv, box, st.angle_idx, self.top.angle_k,
                                  self.top.angle_theta0)
                ed = dihedral_energy(
                    xv, box, st.dihedral_idx, self.top.dihedral_k,
                    self.top.dihedral_n, self.top.dihedral_phase)
                e_bonded = eb + ea + ed
                # subtract the kernel's contribution for excluded + 1-4
                # pairs (identical arithmetic => exact cancellation)
                el_x, ec_x = pairlist_colpair_energy(
                    xv, box, st.excl_idx, self._excl_mask, q_kc, sh, se,
                    cm, couple, plan)
                el_4, ec_4 = pairlist_colpair_energy(
                    xv, box, st.p14_idx, self.top.pair14_mask, q_kc, sh, se,
                    cm, couple, plan)
                # add scaled 1-4: LJ/scnb + plain Coulomb/scee
                i = st.p14_idx[:, 0]
                j = st.p14_idx[:, 1]
                d = minimum_image(xv[i] - xv[j], box)
                r2 = jnp.maximum(jnp.sum(d * d, -1), R2_MIN)
                inv_r = jax.lax.rsqrt(r2)
                sig = sh[i] + sh[j]
                eps4 = se[i] * se[j]
                cpl14 = 1.0 - (cm[i] + cm[j] - 2.0 * cm[i] * cm[j]) \
                    * (1.0 - couple)
                s6 = (sig * sig / r2) ** 3
                pm = self.top.pair14_mask
                e14_lj = jnp.sum(
                    pm * scnb * cpl14 * eps4 * (s6 * s6 - s6))
                e14_c = jnp.sum(pm * scee * cpl14 * q_kc[i] * q_kc[j]
                                * inv_r)
                # reciprocal + self + erf exclusion correction (recip is
                # ALWAYS evaluated outside this grad now — constant here)
                q_eff = q_plain * (1.0 - cm * (1.0 - couple))
                e_recip = e_recip_o
                e_self = -beta / jnp.sqrt(jnp.pi) * COULOMB_CONST \
                    * jnp.sum(q_eff * q_eff)
                # erf part of excluded pairs (they are in the reciprocal
                # sum but must not interact): subtract erf(beta r)/r
                ee_i = st.excl_idx[:, 0]
                ee_j = st.excl_idx[:, 1]
                dd = minimum_image(xv[ee_i] - xv[ee_j], box)
                rr2 = jnp.maximum(jnp.sum(dd * dd, -1), 1e-4)
                rr = jnp.sqrt(rr2)
                cpl_x = (1.0 - cm[ee_i] * (1.0 - couple)) \
                    * (1.0 - cm[ee_j] * (1.0 - couple))
                e_corr = -COULOMB_CONST * jnp.sum(
                    self._excl_mask * cpl_x * q_plain[ee_i]
                    * q_plain[ee_j] * jax.scipy.special.erf(beta * rr) / rr)
                # intra-water erf compensation, gather-free via rolls: the
                # recip sum includes each water's internal pairs; subtract
                # erf(beta r)/r for every charged intra pair. (Their direct
                # erfc part never enters: the kernel masks same-group
                # pairs, so there is nothing else to subtract.)
                if self._wq:
                    m_o_mask = (st.w_role == 0) & (st.props[:, 4] > 0)
                    xs = [xv] + [jnp.roll(xv, -k, 0)
                                 for k in range(1, self._wstride)]
                    for a in range(self._wstride):
                        for b in range(a + 1, self._wstride):
                            qq = self._wq[a] * self._wq[b]
                            if abs(qq) < 1e-12:
                                continue
                            dd = minimum_image(xs[b] - xs[a], box)
                            rr_w = jnp.sqrt(jnp.maximum(
                                jnp.sum(dd * dd, -1), 1e-4))
                            e_corr = e_corr - COULOMB_CONST * qq * jnp.sum(
                                jnp.where(
                                    m_o_mask,
                                    jax.scipy.special.erf(beta * rr_w)
                                    / rr_w, 0.0))
                # 1-4 pairs likewise get erf subtraction (their PME
                # direct+recip contribution must reduce to scaled plain
                # Coulomb). The factor is the PRODUCT of the per-atom
                # charge-scaling factors — what the reciprocal sum actually
                # applied — so the subtraction is exact at every couple.
                dd4 = minimum_image(xv[i] - xv[j], box)
                r24 = jnp.maximum(jnp.sum(dd4 * dd4, -1), 1e-4)
                rr4 = jnp.sqrt(r24)
                cpl_x4 = (1.0 - cm[i] * (1.0 - couple)) \
                    * (1.0 - cm[j] * (1.0 - couple))
                e_corr4 = -COULOMB_CONST * jnp.sum(
                    pm * cpl_x4 * q_plain[i] * q_plain[j]
                    * jax.scipy.special.erf(beta * rr4) / rr4)
                # couple-intramol=no: restore coupled-molecule internal
                # non-excluded pairs (recip scaled them by couple^2) to
                # full strength (see ops/nonbonded.py intramol_pairs_np)
                e_comp = jnp.zeros((), jnp.float32)
                if self._has_alch:
                    mi_ = st.intra_idx[:, 0]
                    mj_ = st.intra_idx[:, 1]
                    ddm = minimum_image(xv[mi_] - xv[mj_], box)
                    rrm = jnp.sqrt(
                        jnp.maximum(jnp.sum(ddm * ddm, -1), 1e-4))
                    e_comp = COULOMB_CONST * (1.0 - couple * couple) \
                        * jnp.sum(self._im_mask * q_plain[mi_]
                                  * q_plain[mj_]
                                  * jax.scipy.special.erf(beta * rrm)
                                  / rrm)
                e_rest = (e_bonded - el_x - ec_x - el_4 - ec_4
                          + e14_lj + e14_c + e_recip + e_self
                          + e_corr + e_corr4 + e_comp)
                terms = dict(bond=eb, angle=ea, dihedral=ed,
                             recip=e_recip,
                             energy_potential_bonded=e_bonded)
                return e_rest, terms

            (e_rest, terms), g = jax.value_and_grad(
                e_rest_fn, has_aux=True)(x_v)
            f = f_dir - g
            if f_pme is not None:
                f = f - (f_pme if rw == 1.0
                         else np.float32(rw) * f_pme)
            f = self._spread_vsite_forces(f, st.vsite_idx, st.vp_of,
                                          st.vp_role, st.vm_of)
            f = f * (props[:, 4:5] > 0)      # col 7 is group id, not 0/1
            e_tot = e_rest + e_lj + e_c
            terms = dict(
                terms,
                lj=e_lj, coulomb=e_c,
                energy_potential=e_tot,
                energy_potential_nonbonded=e_tot
                - terms["energy_potential_bonded"],
            )
            return f, (e_tot, terms)

        return force

    # ------------------------------------------------------------------
    def _make_cp_cv(self):
        ra, rb, rcs = self._settle_geom
        use_settle = self.n_waters > 0
        use_h = self._use_hshake
        hc_mask = self._hc_mask
        hc_r0 = self._hc_r0
        hc_invm = self._hc_invm
        eye3 = jnp.eye(3, dtype=jnp.float32)[None]

        def merge_rows(x, res_flat, of, role, n_rows, k):
            """Scatter-free write-back: each slot pulls its row from the
            flattened per-constraint result stack via the ownership table."""
            gid = jnp.minimum(of * k + jnp.clip(role, 0, k - 1),
                              n_rows * k)
            cand = res_flat[gid]
            return jnp.where((of < n_rows)[:, None], cand, x)

        def _mask_A(A):
            """Deactivate padded constraints: identity rows/cols."""
            m2 = hc_mask[:, :, None] * hc_mask[:, None, :]
            return A * m2 + eye3 * (1.0 - hc_mask)[:, None, :] * eye3

        def hshake_pos(x_new, x_ref, st, iters=6):
            """Star-topology M-SHAKE (heavy + up to 3 H), iterated on
            COMPACT per-cluster arrays with a closed-form 3x3 solve, then
            merged back through the hc tables. The per-iteration full-array
            scatter/gather + batched LU of the previous design was ~5 ms at
            25k sites; this is tens of microseconds."""
            hc_idx = st.hc_idx
            box = st.box
            heavy = hc_idx[:, 0]
            hs = hc_idx[:, 1:]
            x0h = x_ref[heavy]
            r0 = minimum_image(x_ref[hs] - x0h[:, None, :], box)  # [C,3,3]
            inv_mh = hc_invm[:, 0:1]
            inv_mk = hc_invm[:, 1:]
            xk_abs = x_new[hs]                                   # [C,3,3]
            xh = x_new[heavy]                                    # [C,3]
            r = minimum_image(xk_abs - xh[:, None, :], box)
            ckl = inv_mh[:, :, None] + eye3 * inv_mk[:, :, None]

            def body(_, carry):
                xh, r = carry
                dot = jnp.einsum("cki,cli->ckl", r, r0)
                A = _mask_A(2.0 * ckl * dot)
                b = hc_r0 ** 2 - jnp.sum(r * r, -1)
                lam = _solve3(A, b * hc_mask) * hc_mask
                dh = lam[..., None] * r0 * inv_mk[..., None]
                dheavy = -jnp.sum(lam[..., None] * r0, axis=1) * inv_mh
                r = r + dh - dheavy[:, None, :]
                xh = xh + dheavy
                return xh, r

            # trace-time unroll: the compact per-iteration math is ~15 tiny
            # ops whose fixed issue cost dominates at C~1e3 clusters; a
            # Python loop lets XLA fuse across iterations (identical math)
            carry = (xh, r)
            for _ in range(iters):
                carry = body(0, carry)
            xh, r = carry
            # re-express Hs in their own stored representation (box wrap)
            xk_f = xk_abs + minimum_image(
                xh[:, None, :] + r - xk_abs, box)
            res = jnp.concatenate([xh[:, None, :], xk_f], axis=1)  # [C,4,3]
            C = res.shape[0]
            flat = jnp.concatenate(
                [res.reshape(-1, 3),
                 jnp.zeros((1, 3), res.dtype)], axis=0)
            return merge_rows(x_new, flat, st.hc_of, st.hc_role, C, 4)

        def hshake_vel(v, x, st):
            hc_idx = st.hc_idx
            heavy = hc_idx[:, 0]
            hs = hc_idx[:, 1:]
            r = minimum_image(x[hs] - x[heavy][:, None, :], st.box)
            vh = v[heavy]
            vk = v[hs]
            rv = vk - vh[:, None, :]
            inv_mh = hc_invm[:, 0:1]
            inv_mk = hc_invm[:, 1:]
            ckl = inv_mh[:, :, None] + eye3 * inv_mk[:, :, None]
            A = _mask_A(ckl * jnp.einsum("cki,cli->ckl", r, r))
            b = -jnp.sum(r * rv, -1)
            mu = _solve3(A, b * hc_mask) * hc_mask
            dvh = mu[..., None] * r * inv_mk[..., None]
            dvheavy = -jnp.sum(mu[..., None] * r, axis=1) * inv_mh
            res = jnp.concatenate(
                [(vh + dvheavy)[:, None, :], vk + dvh], axis=1)
            C = res.shape[0]
            flat = jnp.concatenate(
                [res.reshape(-1, 3),
                 jnp.zeros((1, 3), res.dtype)], axis=0)
            return merge_rows(v, flat, st.hc_of, st.hc_role, C, 4)

        import os as _os
        # rolled is the measured default. Two alternatives both A/B'd
        # SLOWER on chip: "compact" (math on [NW] gathered stacks, 7.48 vs
        # 7.25 ms/step — gathers + merge outweigh the 4x redundant VPU
        # math) and "cw" (component-wise [S] x/y/z arrays, 6.12 vs 6.05 —
        # XLA already handles the [S,3] minor-dim layout well; the
        # split/restack boundary costs more than the lane-efficiency win).
        settle_mode = _os.environ.get("MOLCHANICA_SETTLE", "rolled")
        n_w = int(self.top.water_count)

        def cp(x_new, x_ref, st):
            if use_settle and settle_mode == "compact":
                # compact path: gather the 3 water rows per molecule, run
                # the SETTLE core on [NW] stacks (instead of all S slots
                # "as if O" in the rolled path — 4x the math for a 3/4-site
                # solvent), merge back scatter-free through w_of/w_role
                from .settle import settle_compute
                res = settle_compute(x_new, x_ref, st.widx, ra, rb, rcs,
                                     15.999, 1.008, box=st.box)
                flat = jnp.concatenate(
                    [res.reshape(-1, 3), jnp.zeros((1, 3), res.dtype)],
                    axis=0)
                x_new = merge_rows(x_new, flat, st.w_of, st.w_role, n_w, 3)
            elif use_settle and settle_mode == "rolled":
                # blocked-water layout: rolled SETTLE, zero gathers
                m_o_mask = (st.w_role == 0) & (st.props[:, 4] > 0)
                x_new = settle_compute_rolled(
                    x_new, x_ref, m_o_mask, ra, rb, rcs, 15.999, 1.008,
                    box=st.box)
            elif use_settle:
                from .settle import settle_compute_rolled_cw
                m_o_mask = (st.w_role == 0) & (st.props[:, 4] > 0)
                x_new = settle_compute_rolled_cw(
                    x_new, x_ref, m_o_mask, ra, rb, rcs, 15.999, 1.008,
                    box=st.box)
            if use_h:
                x_new = hshake_pos(x_new, x_ref, st)
            return x_new

        def cv(v, x, st):
            if use_settle and settle_mode == "compact":
                from .settle import settle_velocity_deltas
                dv = settle_velocity_deltas(v, x, st.widx, 15.999, 1.008,
                                            box=st.box)
                flat = jnp.concatenate(
                    [dv.reshape(-1, 3), jnp.zeros((1, 3), dv.dtype)],
                    axis=0)
                gid = jnp.minimum(st.w_of * 3 + jnp.clip(st.w_role, 0, 2),
                                  n_w * 3)
                v = v + jnp.where((st.w_of < n_w)[:, None], flat[gid], 0.0)
            elif use_settle and settle_mode == "rolled":
                m_o_mask = (st.w_role == 0) & (st.props[:, 4] > 0)
                v = settle_velocities_rolled(v, x, m_o_mask, 15.999, 1.008,
                                             box=st.box)
            elif use_settle:
                from .settle import settle_velocities_rolled_cw
                m_o_mask = (st.w_role == 0) & (st.props[:, 4] > 0)
                v = settle_velocities_rolled_cw(v, x, m_o_mask,
                                                15.999, 1.008, box=st.box)
            if use_h:
                v = hshake_vel(v, x, st)
            return v

        if not (use_settle or use_h):
            return None, None
        return cp, cv

    # ------------------------------------------------------------------
    def _get_chunk_fn(self, dt: float, k_steps: int, record_energy: bool,
                      force_cap, periods: int = 1):
        # record_energy selects the kernel variant: hot chunks use the
        # force-only pair tile (the LJ/Coulomb accumulators cost ~8-10%);
        # recording chunks pay for true per-step energies. pe_last from a
        # hot chunk holds only the bonded/recip remainder — snapshots
        # recompute the full energy on demand (_record_snapshot).
        #
        # periods > 1: ONE dispatch covers `periods` rebuild cycles —
        # lax.scan over (rebuild -> k_steps inner scan). The axon relay's
        # per-dispatch floor is ~25 ms (chip-measured round 4); at the
        # default k=20 that is 1.25 ms/step of pure latency, amortized
        # to floor/(periods*k) here.
        key = (dt, k_steps, bool(record_energy), force_cap, int(periods))
        if key in self._chunk_cache:
            return self._chunk_cache[key]

        from .integrators import make_integrator_step

        cfg = self.cfg
        cp, cv = self._make_cp_cv()
        import os as _os2
        # impulse MTS (r-RESPA) on the reciprocal force: hot chunks step in
        # pairs — kick A applies the carried force (which includes the 2x
        # recip impulse), evals direct-only; kick B applies direct-only,
        # evals direct + 2x recip. Halves the PME evaluations (~0.6 ms/step
        # at 25k sites). Energy-recording chunks keep per-step recip.
        # Default ON (chip A/B round 5: 6.96 -> 6.20 ms/step at 25k sites;
        # 6k-step NVT hold at 310 +- 3 K — scripts/ab_mts.py). At a replan
        # or record->hot boundary the carried force holds 1x recip where
        # kick A expects the 2x impulse: a one-kick O(dt) perturbation,
        # irrelevant for sampling. Set MOLCHANICA_PME_MTS=1 to disable.
        mts = (not record_energy and k_steps % 2 == 0
               and _os2.environ.get("MOLCHANICA_PME_MTS", "2") == "2"
               and _os2.environ.get("MOLCHANICA_FASTSIM_SCAN", "1") == "1")
        if mts:
            force_A = self._make_force_fn(None, want_energy=False,
                                          recip_weight=0.0)
            force_B = self._make_force_fn(None, want_energy=False,
                                          recip_weight=2.0)
        force = self._make_force_fn(None, want_energy=record_energy)

        def make_one(st, force_v=None):
            fv = force_v if force_v is not None else force
            force_st = lambda x, box, couple: fv(x, st)
            cp_st = (lambda xn, xr: cp(xn, xr, st)) if cp else None
            cv_st = (lambda v, x: cv(v, x, st)) if cv else None
            return make_integrator_step(
                force_st, st.masses, st.dof, cfg.integrator.kind, dt=dt,
                temp_target=cfg.temp_target,
                thermostat_tau=cfg.integrator.thermostat_tau,
                gamma=cfg.integrator.gamma,
                constrain_positions=cp_st, constrain_velocities=cv_st,
                n_constraints=self.n_constraints, force_cap=force_cap,
                cadence=cfg.integrator.cadence)

        def finish(st, x, v, f, k, e_last, terms):
            if cfg.zero_com_drift:
                v = remove_com_drift(v, st.masses, st.dof)
            ke = kinetic_energy(v, st.masses, st.dof)
            return st.replace(x=x, v=v, f=f, rng_key=k,
                              step=st.step + k_steps,
                              pe_last=e_last, ke_last=ke), terms

        is_lang = cfg.integrator.kind == "langevin_middle"

        def period(st: FastState):
            st = self._rebuild(st)
            key = st.rng_key
            if is_lang:
                # draw the whole period's thermostat noise in ONE call:
                # per-step jax.random.normal inside the scan measured
                # ~0.53 ms/step at 25k sites (threefry + erfinv op
                # overhead on a small array); one [k, S, 3] draw
                # amortizes it ~k-fold
                key, sub = jax.random.split(key)
                noise = jax.random.normal(
                    sub, (k_steps,) + st.v.shape, jnp.float32)
            else:
                noise = None

            # st.f carries the force at st.x across chunk boundaries
            # (rebuild permutes it), so each step costs exactly one eval.
            if mts:
                one_a = make_one(st, force_A)
                one_b = make_one(st, force_B)
                ns2 = (None if noise is None else
                       noise.reshape((k_steps // 2, 2) + st.v.shape))

                def body2(carry, ns):
                    x, v, f, k = carry
                    na = None if ns is None else ns[0]
                    nb = None if ns is None else ns[1]
                    x, v, f, e, terms, k = one_a(x, v, f, st.box,
                                                 st.couple, k, noise=na)
                    x, v, f, e, terms, k = one_b(x, v, f, st.box,
                                                 st.couple, k, noise=nb)
                    return (x, v, f, k), (e, terms)

                (x, v, f, k), (es, terms_s) = jax.lax.scan(
                    body2, (st.x, st.v, st.f, key), ns2,
                    length=k_steps // 2)
            else:
                one = make_one(st)

                def body(carry, ns):
                    x, v, f, k = carry
                    x, v, f, e, terms, k = one(x, v, f, st.box, st.couple,
                                               k, noise=ns)
                    return (x, v, f, k), (e, terms)

                (x, v, f, k), (es, terms_s) = jax.lax.scan(
                    body, (st.x, st.v, st.f, key), noise, length=k_steps)
            terms = jax.tree.map(lambda a: a[-1], terms_s)
            st, terms = finish(st, x, v, f, k, es[-1], terms)
            return st, terms, es

        def chunk(st: FastState):
            if periods == 1:
                return period(st)

            def pbody(st, _):
                st, terms, es = period(st)
                return st, (terms, es)

            st, (terms_s, es_s) = jax.lax.scan(
                pbody, st, None, length=periods)
            terms = jax.tree.map(lambda a: a[-1], terms_s)
            return st, terms, es_s.reshape(-1)

        import os
        mode = os.environ.get("MOLCHANICA_FASTSIM_SCAN", "1")
        if mode == "1":
            fn = jax.jit(chunk)
        elif mode == "unroll":
            # Unrolled chunk: the k-step loop is unrolled at trace time, so
            # the compiled program contains k sequential copies of the step
            # body and NO lax.scan around the pallas call — sidesteps the
            # relay's pallas-inside-scan miscompile class while keeping one
            # dispatch per rebuild period (docs/PERF.md "open investigation").
            def chunk_unrolled(st: FastState):
                st = self._rebuild(st)
                one = make_one(st)
                x, v, f, k = st.x, st.v, st.f, st.rng_key
                es = []
                terms = None
                for _ in range(k_steps):
                    x, v, f, e, terms, k = one(x, v, f, st.box, st.couple, k)
                    es.append(e)
                st, terms = finish(st, x, v, f, k, es[-1], terms)
                return st, terms, jnp.stack(es)

            fn = jax.jit(chunk_unrolled)
        else:
            # Host-stepped fallback: one jitted single-step program called
            # k_steps times per rebuild — no pallas call inside lax.scan
            # (the axon relay compiler has been seen to miscompile
            # long-scan pallas programs; see docs/PERF.md). Costs one
            # dispatch per step.
            def single(st: FastState):
                one = make_one(st)
                x, v, f, e, terms, k = one(st.x, st.v, st.f, st.box,
                                           st.couple, st.rng_key)
                return st.replace(x=x, v=v, f=f, rng_key=k,
                                  pe_last=e), e, terms

            single_jit = jax.jit(single)

            def fn_host(st: FastState):
                st = self._rebuild_jit(st)
                es = []
                terms = None
                for _ in range(k_steps):
                    st, e, terms = single_jit(st)
                    es.append(e)
                st, terms = finish(st, st.x, st.v, st.f, st.rng_key,
                                   es[-1], terms)
                return st, terms, jnp.stack(es)

            fn = fn_host
        self._chunk_cache[key] = fn
        return fn

    # ------------------------------------------------------------------
    def _get_baro_fn(self, dt_eff: float):
        """Chunk-boundary Berendsen NPT on the fast path: exact molecular
        (COM-scaling) virial pressure with the dE/ds central difference
        through the Pallas energy (no VJP needed; see
        barostat.scaling_pressure_bar_fd), then a molecular position +
        box scale. Constrained geometries stay exactly on the manifold
        (molecules are translated, never stretched)."""
        key = ("baro", dt_eff)
        if key in self._chunk_cache:
            return self._chunk_cache[key]
        from .barostat import (_mol_com, berendsen_mu,
                               scaling_pressure_bar_fd)

        baro = self.cfg.barostat_cfg
        n_mol = int(self.top.n_mol)
        mol_b = jnp.asarray(np.concatenate(
            [np.asarray(self.top.mol_id), [n_mol]]).astype(np.int32))
        force_e = self._make_force_fn(None, want_energy=True)

        def fn(st: FastState):
            mol_of = mol_b[jnp.clip(st.perm, 0, self.n_base)]

            def e_scalar(x_, b_, _c):
                return force_e(x_, st.replace(box=b_))[1][0]

            p = scaling_pressure_bar_fd(
                e_scalar, st.x, st.box, st.v, st.masses, st.dof,
                st.couple, mol_of, n_mol + 1)
            # keep the state strictly f32 (under x64 test configs the
            # scalar energy path may accumulate in f64)
            mu = berendsen_mu(p, baro.pressure_target, baro.tau,
                              dt_eff).astype(st.x.dtype)
            com, _ = _mol_com(st.x, st.masses, st.dof, mol_of, n_mol + 1)
            x_new = st.x + (mu - 1.0) * com[mol_of]
            return st.replace(x=x_new,
                              box=(st.box * mu).astype(st.box.dtype)), p

        jfn = jax.jit(fn)
        self._chunk_cache[key] = jfn
        return jfn

    # ------------------------------------------------------------------
    def minimize(self, n_iters: int = 400, max_disp: float = 0.02):
        """Clash relaxation: capped-displacement steepest descent with the
        constraint projection after every move (the FastSim analog of the
        reference's init relaxation, src/md/mod.rs max_init_relaxation_iters).
        """
        k_reb = self.cfg.neighbor_rebuild_every

        def make_fn():
            cp, _ = self._make_cp_cv()
            force = self._make_force_fn(None)

            def chunk(st: FastState):
                st = self._rebuild(st)

                def body(x, _):
                    f, (e, _t) = force(x, st)
                    norm = jnp.sqrt(jnp.sum(f * f, axis=-1, keepdims=True))
                    step_v = f * (max_disp / jnp.maximum(norm, 1e-9))
                    step_v = jnp.where(norm > 1e-9, step_v, 0.0)
                    x_new = x + step_v * (st.dof[:, None] > 0)
                    if cp is not None:
                        x_new = cp(x_new, x, st)
                    return x_new, e

                x, es = jax.lax.scan(body, st.x, None, length=k_reb)
                f, (e, _t) = force(x, st)  # keep the carried-force invariant
                return st.replace(x=x, f=f, pe_last=e), es[-1]

            return jax.jit(chunk)

        fn = make_fn()
        snap = self.state
        for attempt in range(5):
            done = 0
            e = None
            while done < n_iters:
                self.state, e = fn(self.state)
                done += k_reb
            ovf = int(self.state.overflow)
            if ovf == 0:
                break
            window = bool(ovf >> 15)
            if attempt == 4 or (window and not self._psk):
                # never return an energy computed with truncated tables
                # (advisor round-4: the corruption would only surface at
                # the NEXT step() call's sync point)
                raise ColpairOverflowError(
                    f"minimize(): overflow (col={ovf & 0x7FFF}, "
                    f"win={ovf >> 15}) persists after replan budget")
            # capacity overflow during the quench: restore, widen the
            # window tables if they are what overflowed, redo
            self.state = snap.replace(overflow=jnp.zeros((), jnp.int32))
            self._replan(per_slice_k=2 * self._psk
                         if (window and self._psk) else None)
            snap = self.state
            fn = make_fn()
        return float(e)

    # ------------------------------------------------------------------
    def _replan(self, per_slice_k=None):
        """Rebuild the engine around the CURRENT state: fresh column plan
        at the current box (NPT drift), optionally wider window tables
        (overflow recovery). Positions/velocities/step/couple/RNG stream
        carry over exactly; kernels and chunk programs recompile."""
        x = self.positions_unsorted()
        v = self.velocities_unsorted()
        box = np.asarray(self.state.box, np.float64)
        keep = dict(_sim_time_ps=getattr(self, "_sim_time_ps", 0.0),
                    _wall_time=self._wall_time,
                    snapshots=self.snapshots)
        carry = dict(step=self.state.step, couple=self.state.couple,
                     rng_key=self.state.rng_key)
        psk = self._psk if per_slice_k is None else per_slice_k
        new = FastSim(self.top, self.cfg, x, box_extent=box,
                      velocities=v, per_slice_k=psk)
        self.__dict__.clear()
        self.__dict__.update(new.__dict__)
        self.__dict__.update(keep)
        self.state = self.state.replace(**carry)

    def step(self, dt_ps: float, n_steps: int = 1, record_energy=False,
             force_cap=None):
        """One MD run request. Recovers automatically from the two
        planned-capacity faults, at CHUNK granularity: window-table /
        column-capacity overflow (restore the last dispatch-verified good
        state — at most ~2 dispatches of redo — widen the window tables
        only if they are what overflowed, replan, resume the remainder)
        and NPT box drift past the plan skin (state is valid — replan at
        the current box and continue the remainder). Simulated time is
        credited only for steps actually completed; a retry budget that
        runs out raises instead of silently under-stepping."""
        energies = []
        completed = 0            # verified-good steps banked so far
        try:
            for attempt in range(8):
                if completed >= n_steps:
                    break
                try:
                    self._step_attempt(dt_ps, n_steps - completed,
                                       record_energy, force_cap, energies)
                    completed = n_steps
                    break
                except ColpairOverflowError as ov:
                    # discard the corrupted tail, resume from the last
                    # good dispatch boundary
                    if ov.good_state is not None:
                        self.state = ov.good_state.replace(
                            overflow=jnp.zeros((), jnp.int32))
                        completed += ov.steps_good
                        del energies[ov.elen_good:]
                    if attempt >= 5 or (ov.window and not self._psk):
                        raise
                    psk = 2 * self._psk if (ov.window and self._psk) \
                        else None
                    self._replan(per_slice_k=psk)
                except _BoxDriftReplan as bd:
                    # dynamics up to the drift check are valid — keep them
                    completed += bd.steps_done
                    self._replan()
            if completed < n_steps:
                raise ColpairOverflowError(
                    f"step(): replan retry budget exhausted with only "
                    f"{completed}/{n_steps} steps completed")
        finally:
            self._sim_time_ps = getattr(self, "_sim_time_ps", 0.0) \
                + dt_ps * completed
        return jnp.concatenate(energies) if energies else None

    def _step_attempt(self, dt_ps: float, n_steps: int, record_energy,
                      force_cap, energies):
        """Dispatch loop for one attempt. Appends per-dispatch energies
        into the caller's shared list. Overflow is verified PER DISPATCH,
        one dispatch behind (the check on dispatch i-1's output runs after
        dispatch i is submitted, so the device pipeline never stalls);
        on overflow the raised error carries the last good state so the
        caller redoes at most ~2 dispatches instead of the whole call."""
        t0 = time.perf_counter()
        k = min(self.cfg.neighbor_rebuild_every, n_steps)
        # multi-period dispatch (scan mode only): fold several rebuild
        # cycles into one program to amortize the ~25 ms relay dispatch
        # floor. Barostat couples to chunk boundaries -> keep periods=1.
        import os as _os
        r_max = int(_os.environ.get("MOLCHANICA_CHUNK_PERIODS", "10"))
        if (self.cfg.barostat_cfg is not None
                or _os.environ.get("MOLCHANICA_FASTSIM_SCAN", "1") != "1"):
            r_max = 1
        done = 0
        # last verified-good resume point; call entry counts (its overflow
        # flag is 0: fresh init, post-replan, or verified by the last call)
        good = (self.state, 0, len(energies))
        pending = None                   # completed but not yet verified

        def verify(entry):
            nonlocal good
            st, dn, el = entry
            ovf = int(st.overflow)       # sync on that dispatch's output
            if ovf:
                self._wall_time += time.perf_counter() - t0
                raise ColpairOverflowError(
                    f"colpair overflow (col={ovf & 0x7FFF}, "
                    f"win={ovf >> 15}) — replan required",
                    good_state=good[0], steps_good=good[1],
                    elen_good=good[2], window=bool(ovf >> 15))
            good = entry

        while done < n_steps:
            rem = n_steps - done
            if rem >= 2 * k and r_max > 1:
                r = min(r_max, rem // k)
                todo = k * r
                fn = self._get_chunk_fn(float(dt_ps), k, record_energy,
                                        force_cap, periods=r)
            else:
                todo = min(k, rem)
                fn = self._get_chunk_fn(float(dt_ps), todo, record_energy,
                                        force_cap)
            self.state, terms, es = fn(self.state)
            self._last_terms = terms
            if record_energy and es is not None:
                energies.append(es)
            done += todo
            if self.cfg.barostat_cfg is not None:
                # the barostat scaling must not run on forces from
                # truncated tables, and the drift check syncs on the box
                # anyway — verify this dispatch eagerly (advisor round-4:
                # a pre-drift overflow must not be swallowed by _replan)
                verify((self.state, done, len(energies)))
                self.state, self._last_pressure = self._get_baro_fn(
                    float(dt_ps) * todo)(self.state)
                good = (self.state, done, len(energies))
                # windows/columns were planned for the initial box; a few
                # percent of isotropic drift stays within the skin, beyond
                # that the engine is rebuilt around the new box (step()
                # catches this, replans, and continues the remainder)
                ratio = float(self.state.box[0]) / self._box0[0]
                if abs(ratio - 1.0) > 0.03:
                    self._wall_time += time.perf_counter() - t0
                    raise _BoxDriftReplan(done)
            else:
                if pending is not None:
                    verify(pending)
                pending = (self.state, done, len(energies))
        if pending is not None:
            verify(pending)
        self._wall_time += time.perf_counter() - t0
        # Fail fast on non-finite energy: a genuine instability (bad
        # state, timestep, or bug) or — rarely on the axon relay — a
        # remote-compiler miscompile. Either way, continuing would only
        # produce NaN garbage; callers can retry in a fresh process to
        # discriminate (a miscompile usually recompiles clean).
        # ke_last is in the gate because hot (non-recording) chunks carry
        # only the bonded/recip remainder in pe_last; a direct-space blowup
        # reaches the velocities within the same chunk.
        bad = (not np.isfinite(float(self.state.pe_last))
               or not np.isfinite(float(self.state.ke_last)))
        if bad and n_steps > 0:
            raise MiscompiledStepError(
                "non-finite energy after step chunk (instability or, "
                "rarely, an axon remote-compile fault — retry in a fresh "
                "process to discriminate)")

    def run(self, dt_ps: float, n_steps: int,
            snapshot_interval: Optional[int] = None, collect=True):
        import contextlib
        trace = (jax.profiler.trace(self.cfg.trace_dir)
                 if self.cfg.trace_dir else contextlib.nullcontext())
        if snapshot_interval is None:
            snapshot_interval = self.cfg.snapshot_handlers.memory or n_steps
        done = 0
        with trace:
            while done < n_steps:
                todo = min(snapshot_interval, n_steps - done)
                self.step(dt_ps, todo)
                done += todo
                if collect:
                    self._record_snapshot(dt_ps)
        return self.snapshots

    def metrics(self) -> dict:
        """Structured run metrics (step rate as a first-class metric —
        SURVEY §5 metrics/observability)."""
        wall = max(self._wall_time, 1e-12)
        sim_ps = getattr(self, "_sim_time_ps", 0.0)
        return {
            "steps": int(self.step_count),
            "wall_s": round(wall, 4),
            "sim_ps": round(sim_ps, 4),
            "ms_per_step": round(1000.0 * wall / max(self.step_count, 1), 4),
            "ns_per_day": round(sim_ps / 1000.0 / wall * 86400.0, 3),
            "n_sites": int(self.top.n_atoms_real),
        }

    # ------------------------------------------------------------------
    def positions_unsorted(self):
        """Positions in original (base) order [n_base, 3], with virtual
        sites refreshed from their parents (st.x stores them stale)."""
        st = self.state
        if not hasattr(self, "_unsort_fn"):
            def unsort(st):
                x = self._apply_vsites(st.x, st.vsite_idx, st.box, st.vm_of)
                out = jnp.zeros((self.n_base + 1, 3), jnp.float32)
                return out.at[st.perm].set(x)
            self._unsort_fn = jax.jit(unsort)
        return np.asarray(self._unsort_fn(st)[: self.n_base])

    def velocities_unsorted(self):
        st = self.state
        out = jnp.zeros((self.n_base + 1, 3), jnp.float32)
        out = out.at[st.perm].set(st.v)
        return np.asarray(out[: self.n_base])

    def _record_snapshot(self, dt_ps):
        from .snapshot import Snapshot, EnergyData
        x = self.positions_unsorted()
        # hot chunks run the force-only kernel (no LJ/Coulomb energies);
        # recompute the full decomposition here — one energy eval per
        # snapshot, amortized to ~0 at any realistic snapshot interval
        if not hasattr(self, "_snap_energy_fn"):
            e_force = self._make_force_fn(None, want_energy=True)
            self._snap_energy_fn = jax.jit(
                lambda st: e_force(st.x, st)[1][1])
        self._last_terms = self._snap_energy_fn(self.state)
        terms = {kk: float(v) for kk, v in self._last_terms.items()}
        ed = EnergyData(
            energy_potential=terms.get("energy_potential", 0.0),
            energy_potential_nonbonded=terms.get(
                "energy_potential_nonbonded", 0.0),
            energy_potential_bonded=terms.get(
                "energy_potential_bonded", 0.0),
        )
        self.snapshots.append(Snapshot(
            time=float(self.step_count) * dt_ps,
            atom_posits=x, energy_data=ed))

    @property
    def step_count(self) -> int:
        return int(self.state.step)

    def computation_time(self) -> float:
        return self._wall_time

    def configure_alchemical_window(self, lam: float):
        self.state = self.state.replace(
            couple=jnp.asarray(1.0 - lam, jnp.float32))

    def dhdl(self) -> float:
        """dH/dlambda at the current state (central finite difference on
        couple — the pallas kernel has no VJP; MdSim's pallas backend uses
        the same scheme, engine.py dhdl_fn). lambda = 1 - couple."""
        if not self._has_alch:
            return 0.0
        if not hasattr(self, "_dhdl_fn"):
            force = self._make_force_fn(None)

            def fn(st):
                h = jnp.asarray(1e-3, jnp.float32)
                ep = force(st.x, st.replace(couple=st.couple + h))[1][0]
                em = force(st.x, st.replace(couple=st.couple - h))[1][0]
                return -(ep - em) / (2.0 * h)

            self._dhdl_fn = jax.jit(fn)
        return float(self._dhdl_fn(self.state))

    def temperature(self) -> float:
        st = self.state
        v = np.asarray(st.v)
        m = np.asarray(st.masses)
        d = np.asarray(st.dof)
        ke = 0.5 * float((m * d * (v * v).sum(-1)).sum()) / ACCEL_FACTOR
        ndof = max(3.0 * d.sum() - self.n_constraints - 3.0, 1.0)
        return 2.0 * ke / (KB * ndof)

    def potential_energy(self) -> float:
        if not hasattr(self, "_efn"):
            force = self._make_force_fn(None)
            self._efn = jax.jit(lambda st: force(st.x, st)[1])
        e, terms = self._efn(self.state)
        self._last_terms = terms
        return float(e)
