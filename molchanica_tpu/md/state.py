"""Dynamic simulation state: the traced pytree that flows through jitted steps.

TPU-native redesign of the reference's `MdState` (opaque Rust struct, surface
reconstructed in /root/repo/SURVEY.md §2.1): arrays + pure functions instead of
an object graph. Everything host-visible (snapshots, trajectories, config)
lives outside this pytree.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from ..constants import ACCEL_FACTOR, KB


@struct.dataclass
class SimBox:
    """Orthorhombic periodic cell. `extent` mirrors the reference SimBox's
    `extent` field (src/properties/water_sol.rs:579)."""
    extent: jnp.ndarray         # [3] box lengths (A)

    @property
    def volume(self):
        return jnp.prod(self.extent)


@struct.dataclass
class MdState:
    positions: jnp.ndarray      # [N,3] A
    velocities: jnp.ndarray     # [N,3] A/ps
    box: Optional[SimBox]       # None for vacuum systems
    step: jnp.ndarray           # i32 scalar
    rng_key: jax.Array
    couple: jnp.ndarray         # f32 scalar: alchemical coupling strength
                                # (1 = fully coupled). Reference lambda
                                # convention: lambda = 1 - couple.
    pe_last: jnp.ndarray        # cached potential energy of last force eval
    ke_last: jnp.ndarray        # kinetic energy after last step
    dhdl_last: jnp.ndarray      # dH/d(couple) * (-1) = dH/d(lambda), cached

    @property
    def n_atoms(self) -> int:
        return self.positions.shape[0]


def kinetic_energy(velocities, masses, dof_mask):
    """0.5 m v^2 summed over integrated dofs, in kcal/mol.

    v in A/ps, m in amu: 0.5*m*v^2 [amu A^2/ps^2] / ACCEL_FACTOR -> kcal/mol.
    """
    ke = 0.5 * jnp.sum(masses * dof_mask * jnp.sum(velocities**2, axis=-1))
    return ke / ACCEL_FACTOR


def instantaneous_temperature(velocities, masses, dof_mask, n_constraints=0):
    """2 KE / (kB * ndof); ndof = 3*N_dof - n_constraints - 3 (COM removed)."""
    ndof = 3.0 * jnp.sum(dof_mask) - n_constraints - 3.0
    ke = kinetic_energy(velocities, masses, dof_mask)
    return 2.0 * ke / (KB * jnp.maximum(ndof, 1.0))


def init_velocities(key, masses, dof_mask, temp, dtype=jnp.float32):
    """Maxwell-Boltzmann draw at `temp` K, COM-motion removed.

    sigma_v = sqrt(kB T / m) in engine units: kB T [kcal/mol] * ACCEL_FACTOR
    / m [amu] -> (A/ps)^2.
    """
    n = masses.shape[0]
    sigma = jnp.sqrt(KB * temp * ACCEL_FACTOR / jnp.maximum(masses, 1e-6))
    v = jax.random.normal(key, (n, 3), dtype) * sigma[:, None]
    v = v * dof_mask[:, None]
    # remove COM drift
    m = masses * dof_mask
    p = jnp.sum(v * m[:, None], axis=0)
    v = v - (p / jnp.maximum(jnp.sum(m), 1e-6)) * dof_mask[:, None]
    return v


def remove_com_drift(velocities, masses, dof_mask):
    """Zero total linear momentum (ref MdConfig.zero_com_drift,
    src/docking/mod.rs:111)."""
    m = masses * dof_mask
    p = jnp.sum(velocities * m[:, None], axis=0)
    return velocities - (p / jnp.maximum(jnp.sum(m), 1e-6)) * dof_mask[:, None]
