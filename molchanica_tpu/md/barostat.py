"""Berendsen-style tau-coupled barostat (reference BarostatCfg
{pressure_target, tau}, src/state.rs:850-856).

Instantaneous pressure from the virial:
  P = (2 KE - Virial) / (3 V),  Virial = -sum_i r_i . F_i  (with PBC, the
pair-wise form is implied by forces from minimum-image displacements; for the
atom-wise form we use the standard sum r.F which is valid when positions are
wrapped consistently — adequate for the weak-coupling barostat this is).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..constants import BAR_TO_KCAL_PER_A3, PRESSURE_KCAL_PER_A3_TO_BAR
from .state import kinetic_energy


def instantaneous_pressure_bar(x, box, v, masses, dof_mask, forces):
    vol = jnp.prod(box)
    ke = kinetic_energy(v, masses, dof_mask)
    virial = jnp.sum(x * forces)
    p = (2.0 * ke + virial) / (3.0 * vol)   # kcal/mol/A^3
    return p * PRESSURE_KCAL_PER_A3_TO_BAR


def berendsen_scale(x, box, v, masses, dof_mask, terms, forces,
                    pressure_target_bar, tau_ps, dt_ps,
                    compressibility_per_bar=4.5e-5):
    """Weak-coupling isotropic box scaling; returns (x_scaled, box_scaled).

    mu = (1 - dt/tau * kappa * (P0 - P))^(1/3), clamped to +-2% per step.
    """
    p = instantaneous_pressure_bar(x, box, v, masses, dof_mask, forces)
    mu3 = 1.0 - (dt_ps / tau_ps) * compressibility_per_bar * (
        pressure_target_bar - p)
    mu = jnp.clip(mu3, 0.94, 1.06) ** (1.0 / 3.0)
    return x * mu, box * mu
