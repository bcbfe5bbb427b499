"""Berendsen-style tau-coupled barostat (reference BarostatCfg
{pressure_target, tau}, src/state.rs:850-856).

Instantaneous pressure from the EXACT isotropic scaling derivative:

  P = (2 KE - dE/ds|_{s=1}) / (3 V),   E(s) = U(s x, s box)

dE/ds is obtained by jax.grad through the full potential — pair terms with
minimum-image displacements, bonded terms, AND the PME reciprocal sum (whose
k-vectors contract as the box grows) all contribute their correct virial.
This replaces the atom-wise sum(x . F) form, which is invalid under PBC
(pairs interacting across the boundary contribute box-shift error terms and
the reciprocal-space virial is omitted entirely — round-1 advisor finding).

The weak-coupling update is applied at chunk boundaries (every
`steps_per_chunk` steps) rather than every step: tau is O(ps) >> dt, so the
coupling integral is unchanged while the pressure evaluation (one extra
energy gradient) amortizes to noise.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constants import PRESSURE_KCAL_PER_A3_TO_BAR
from .state import kinetic_energy


def scaling_pressure_bar(e_scalar_fn, x, box, v, masses, dof_mask, couple):
    """Exact virial pressure via the isotropic scaling derivative.

    e_scalar_fn(x, box, couple) -> E must be differentiable (all-XLA
    energy path; the analytic-force kernels are fine as long as their
    energy output is built from traced ops).
    """
    vol = jnp.prod(box)
    ke = kinetic_energy(v, masses, dof_mask)
    one = jnp.asarray(1.0, x.dtype)
    dE_ds = jax.grad(lambda s: e_scalar_fn(x * s, box * s, couple))(one)
    p = (2.0 * ke - dE_ds) / (3.0 * vol)   # kcal/mol/A^3
    return p * PRESSURE_KCAL_PER_A3_TO_BAR


def instantaneous_pressure_bar(x, box, v, masses, dof_mask, forces):
    """Legacy atom-wise estimate sum(r . F): WRONG under PBC (kept only for
    diagnostics; see module docstring). Do not use for coupling."""
    vol = jnp.prod(box)
    ke = kinetic_energy(v, masses, dof_mask)
    virial = jnp.sum(x * forces)
    p = (2.0 * ke + virial) / (3.0 * vol)
    return p * PRESSURE_KCAL_PER_A3_TO_BAR


def berendsen_mu(p_bar, pressure_target_bar, tau_ps, dt_eff_ps,
                 compressibility_per_bar=4.5e-5):
    """Weak-coupling isotropic scale factor for an effective coupling
    interval dt_eff (the chunk length when applied at chunk boundaries)."""
    mu3 = 1.0 - (dt_eff_ps / tau_ps) * compressibility_per_bar * (
        pressure_target_bar - p_bar)
    return jnp.clip(mu3, 0.94, 1.06) ** (1.0 / 3.0)


def berendsen_scale_chunk(e_scalar_fn, x, box, v, masses, dof_mask, couple,
                          pressure_target_bar, tau_ps, dt_eff_ps,
                          compressibility_per_bar=4.5e-5):
    """One barostat application: measure P exactly, scale x and box."""
    p = scaling_pressure_bar(e_scalar_fn, x, box, v, masses, dof_mask,
                             couple)
    mu = berendsen_mu(p, pressure_target_bar, tau_ps, dt_eff_ps,
                      compressibility_per_bar)
    return x * mu, box * mu, p
