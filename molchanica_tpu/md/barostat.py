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

from ..constants import ACCEL_FACTOR, PRESSURE_KCAL_PER_A3_TO_BAR
from .state import kinetic_energy


def _mol_com(x, masses, dof_mask, mol_id, n_mol):
    """Per-molecule center of mass and mass (integrated dofs only) and the
    per-atom COM gather. Virtual sites / padding (dof 0) are excluded from
    the mass sums but still receive their molecule's COM (they ride along
    when the molecule is translated)."""
    m_eff = masses * dof_mask
    msum = jax.ops.segment_sum(m_eff, mol_id, num_segments=n_mol)
    msum = jnp.maximum(msum, 1e-12)
    com = jax.ops.segment_sum(x * m_eff[:, None], mol_id,
                              num_segments=n_mol) / msum[:, None]
    return com, msum


def scaling_pressure_bar(e_scalar_fn, x, box, v, masses, dof_mask, couple,
                         mol_id=None, n_mol=None):
    """Exact virial pressure via the isotropic scaling derivative.

    e_scalar_fn(x, box, couple) -> E must be differentiable (all-XLA
    energy path; the analytic-force kernels are fine as long as their
    energy output is built from traced ops).

    With mol_id/n_mol supplied, uses MOLECULAR (COM) scaling: E(s) moves
    each molecule's center of mass with the box while internal geometry is
    fixed, and the kinetic term is the molecular translational KE. For
    constrained molecules (SETTLE waters, SHAKE H-clusters) atomic scaling
    requires the constraint-force virial — an O(n_waters kB T / V) ~ 10^3
    bar term; COM scaling makes that term vanish identically, so NPT
    densities are unbiased without ever computing constraint forces."""
    vol = jnp.prod(box)
    one = jnp.asarray(1.0, x.dtype)
    if mol_id is None:
        ke = kinetic_energy(v, masses, dof_mask)
        dE_ds = jax.grad(lambda s: e_scalar_fn(x * s, box * s, couple))(one)
    else:
        com, msum = _mol_com(x, masses, dof_mask, mol_id, n_mol)
        vcom, _ = _mol_com(v, masses, dof_mask, mol_id, n_mol)
        ke = 0.5 * jnp.sum(msum * jnp.sum(vcom * vcom, axis=-1)) \
            / ACCEL_FACTOR
        com_atom = com[mol_id]
        dE_ds = jax.grad(
            lambda s: e_scalar_fn(x + (s - one) * com_atom, box * s,
                                  couple))(one)
    p = (2.0 * ke - dE_ds) / (3.0 * vol)   # kcal/mol/A^3
    return p * PRESSURE_KCAL_PER_A3_TO_BAR


def scaling_pressure_bar_fd(e_scalar_fn, x, box, v, masses, dof_mask,
                            couple, mol_id, n_mol, h=2e-3):
    """Finite-difference variant of scaling_pressure_bar for energy paths
    WITHOUT a VJP (the Pallas colpair kernel): central difference on the
    molecular scaling coordinate, dE/ds ~ [E(1+h) - E(1-h)] / 2h.

    h=2e-3 translates molecules by <= h*L/2 (~0.06 A at 60 A boxes) — far
    inside the neighbor skin, so stale window tables stay valid for both
    evaluations. f32 energy resolution puts ~10-50 bar of noise on a
    single estimate at 25k sites; the Berendsen coupling (tau >> chunk)
    averages it out."""
    vol = jnp.prod(box)
    com, msum = _mol_com(x, masses, dof_mask, mol_id, n_mol)
    vcom, _ = _mol_com(v, masses, dof_mask, mol_id, n_mol)
    ke = 0.5 * jnp.sum(msum * jnp.sum(vcom * vcom, axis=-1)) \
        / ACCEL_FACTOR
    ca = com[mol_id]
    ep = e_scalar_fn(x + h * ca, box * (1.0 + h), couple)
    em = e_scalar_fn(x - h * ca, box * (1.0 - h), couple)
    dE_ds = (ep - em) / (2.0 * h)
    p = (2.0 * ke - dE_ds) / (3.0 * vol)
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
                          compressibility_per_bar=4.5e-5,
                          mol_id=None, n_mol=None):
    """One barostat application: measure P exactly, scale x and box.

    With mol_id/n_mol: molecular pressure + molecular position scaling
    (each molecule translated by (mu-1)*COM, internal geometry untouched —
    so constrained geometries stay exactly on the manifold through the
    scale and no post-scale re-SETTLE is needed)."""
    p = scaling_pressure_bar(e_scalar_fn, x, box, v, masses, dof_mask,
                             couple, mol_id=mol_id, n_mol=n_mol)
    mu = berendsen_mu(p, pressure_target_bar, tau_ps, dt_eff_ps,
                      compressibility_per_bar)
    if mol_id is None:
        x_new = x * mu
    else:
        com, _ = _mol_com(x, masses, dof_mask, mol_id, n_mol)
        x_new = x + (mu - 1.0) * com[mol_id]
    return x_new, box * mu, p
