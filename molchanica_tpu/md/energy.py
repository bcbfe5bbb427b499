"""Total potential-energy assembly with per-term breakdown.

Equivalent of the reference's force/energy evaluation inside `MdState::step`
plus `compute_energy_snapshot` (/root/reference/src/md/mod.rs:1036), with the
`MdOverrides` ablation switches (src/md/mod.rs:672-681) compiled in.

Forces are obtained by jax.grad of these functions; virtual-site force
redistribution and alchemical dH/dlambda both fall out of autodiff.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..ops import nonbonded as nb
from ..ops.bonded import bonded_energy
from ..topology import Topology
from .config import MdConfig


def apply_virtual_sites(x, top: Topology):
    """Recompute massless-site rows (OPC M) from their parent atoms."""
    if top.vsite_idx is None:
        return x
    m = top.vsite_idx[:, 0]
    o = top.vsite_idx[:, 1]
    h1 = top.vsite_idx[:, 2]
    h2 = top.vsite_idx[:, 3]
    w = top.vsite_weight[:, None]
    xm = x[o] + w * ((x[h1] - x[o]) + (x[h2] - x[o]))
    xm = jnp.where(top.vsite_mask[:, None] > 0, xm, x[m])
    return x.at[m].set(xm)


def make_energy_fn(top: Topology, cfg: MdConfig, method: str = "allpairs",
                   pme_recip_fn=None, direct_space_fn=None):
    """Build energy(x, box_extent, couple) -> (E_total, terms).

    method:
      "allpairs"        : dense NxN, no cutoff — vacuum systems (configs 1-2)
      "allpairs_cutoff" : dense NxN with cutoff + minimum image (small PBC)
      "cells_pme"       : cell-window direct space + PME reciprocal
                          (direct_space_fn and pme_recip_fn supplied by
                          md/engine.py, built in ops/cells.py + ops/pme.py)
    """
    ov = cfg.overrides
    scee = 1.0 / jnp.maximum(top.pair14_scee, 1e-6)
    scnb = 1.0 / jnp.maximum(top.pair14_scnb, 1e-6)
    # couple-intramol=no: intramolecular pairs of the coupled molecule stay
    # at full strength at every lambda (see nb.intramol_recip_compensation)
    _im_idx, _im_mask = nb.intramol_pairs_np(top)
    _has_alch = bool(_im_mask.sum() > 0)
    im_idx = jnp.asarray(_im_idx)
    im_mask = jnp.asarray(_im_mask)

    def energy(x, box_extent, couple):
        x = apply_virtual_sites(x, top)
        box = box_extent  # [3] or None
        e_bonded, bterms = bonded_energy(x, box, top, ov)

        ewald_beta = None
        e_recip = jnp.zeros((), x.dtype)
        e_self = jnp.zeros((), x.dtype)
        overflow = jnp.zeros((), jnp.int32)
        if method == "allpairs":
            e_lj, e_c = nb.allpairs_energy(
                x, None, top, couple,
                lj_enabled=not ov.lj_disabled,
                coulomb_enabled=not ov.coulomb_disabled,
            )
        elif method == "allpairs_cutoff":
            e_lj, e_c = nb.allpairs_energy(
                x, box, top, couple, cutoff=cfg.lj_cutoff,
                lj_switch_start=cfg.lj_switch_start,
                lj_enabled=not ov.lj_disabled,
                coulomb_enabled=not ov.coulomb_disabled,
            )
        elif method == "cells_pme":
            from ..ops.pme import ewald_beta_for

            ewald_beta = ewald_beta_for(cfg.coulomb_cutoff, cfg.ewald_rtol)
            e_lj, e_c, overflow = direct_space_fn(x, box, couple, ewald_beta)
            if ov.lj_disabled:
                e_lj = jnp.zeros_like(e_lj)
            if ov.coulomb_disabled:
                e_c = jnp.zeros_like(e_c)
            if not (ov.long_range_recip_disabled or ov.coulomb_disabled):
                e_recip = pme_recip_fn(x, box, couple)
                e_self = _ewald_self_energy(top, couple, ewald_beta)
                e_c = e_c + nb.ewald_exclusion_correction(
                    x, box, top, couple, ewald_beta,
                )
                if _has_alch:
                    e_c = e_c + nb.intramol_recip_compensation(
                        x, box, top, im_idx, im_mask, couple, ewald_beta)
        elif method == "pme_rest":
            # Everything EXCEPT the direct-space window sums (those come from
            # the Pallas kernel): reciprocal + self + erf exclusion
            # correction, MINUS the kernel-formula contribution of excluded
            # and 1-4 pairs (the kernel computes all close pairs).
            from ..ops.pallas.direct_force import (
                pairlist_kernel_formula_energy,
            )
            from ..ops.pme import ewald_beta_for

            ewald_beta = ewald_beta_for(cfg.coulomb_cutoff, cfg.ewald_rtol)
            rc2 = max(cfg.lj_cutoff, cfg.coulomb_cutoff) ** 2
            el_x, ec_x = pairlist_kernel_formula_energy(
                x, box, top, top.excl_idx, top.excl_mask, couple,
                ewald_beta, rc2)
            el_4, ec_4 = pairlist_kernel_formula_energy(
                x, box, top, top.pair14_idx, top.pair14_mask, couple,
                ewald_beta, rc2)
            e_lj = -(el_x + el_4)
            e_c = -(ec_x + ec_4)
            if ov.lj_disabled:
                e_lj = jnp.zeros_like(e_lj)
            if ov.coulomb_disabled:
                e_c = jnp.zeros_like(e_c)
            if not (ov.long_range_recip_disabled or ov.coulomb_disabled):
                e_recip = pme_recip_fn(x, box, couple)
                e_self = _ewald_self_energy(top, couple, ewald_beta)
                e_c = e_c + nb.ewald_exclusion_correction(
                    x, box, top, couple, ewald_beta,
                )
                if _has_alch:
                    e_c = e_c + nb.intramol_recip_compensation(
                        x, box, top, im_idx, im_mask, couple, ewald_beta)
        else:
            raise ValueError(method)

        # 1-4 scaled pairs: full (undamped) Coulomb at 1/scee + LJ at 1/scnb.
        e14_lj, e14_c = nb.pairlist_energy(
            x, box if method != "allpairs" else None, top,
            top.pair14_idx, top.pair14_mask,
            coulomb_scale=scee, lj_scale=scnb, couple_strength=couple,
            ewald_beta=None,
        )
        if ov.lj_disabled:
            e14_lj = jnp.zeros_like(e14_lj)
        if ov.coulomb_disabled:
            e14_c = jnp.zeros_like(e14_c)

        e_lj_t = e_lj + e14_lj
        e_c_t = e_c + e14_c + e_recip + e_self
        e_nb = e_lj_t + e_c_t
        total = e_bonded + e_nb
        terms = dict(
            bterms,
            lj=e_lj_t,
            coulomb=e_c_t,
            recip=e_recip,
            energy_potential=total,
            energy_potential_bonded=e_bonded,
            energy_potential_nonbonded=e_nb,
            cell_overflow=jax.lax.stop_gradient(overflow),
        )
        return total, terms

    return energy


def _ewald_self_energy(top: Topology, couple, beta):
    """-beta/sqrt(pi) * k * sum q_i^2 (+ neutralizing background term).

    Alchemically-coupled atoms contribute couple-scaled charges to the
    reciprocal sum, so their self energy scales with couple^2.
    """
    from ..constants import COULOMB_CONST

    q = top.charges * top.atom_mask
    q_eff = q * (1.0 - top.couple_mask * (1.0 - couple))
    return -beta / jnp.sqrt(jnp.pi) * COULOMB_CONST * jnp.sum(q_eff * q_eff)


def make_force_fn(energy_fn):
    """forces(x, box, couple) -> (F, (E, terms)); F = -dE/dx."""
    def fwd(x, box, couple):
        (e, terms), g = jax.value_and_grad(energy_fn, has_aux=True)(
            x, box, couple)
        return -g, (e, terms)
    return fwd


def make_dhdl_fn(energy_fn):
    """dH/dlambda at fixed positions; lambda = 1 - couple (reference
    convention, 0 = fully coupled: SURVEY §2.1 alchemical API)."""
    def dhdl(x, box, couple):
        g = jax.grad(lambda c: energy_fn(x, box, c)[0])(couple)
        return -g   # d/dlambda = -d/dcouple
    return dhdl
