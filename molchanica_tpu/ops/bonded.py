"""Bonded (valence) energy terms: bonds, angles, proper/improper dihedrals.

Pure functions of positions; forces come from jax.grad of the total energy
(the XLA-idiomatic path — everything fuses into the step program). Functional
forms are the Amber family used by the reference engine
(/root/reference README.md:225-232; parity targets the `dynamics` crate's
bonded terms consumed at /root/reference/src/md/mod.rs:748).

All terms are fixed-shape with multiplicative masks so padded rows contribute
exactly zero energy and zero gradient.
"""
from __future__ import annotations

import jax.numpy as jnp

from .pbc import displacement


def _safe_norm(v, axis=-1, eps=1e-12):
    """Norm with a gradient that is finite at 0."""
    sq = jnp.sum(v * v, axis=axis)
    return jnp.sqrt(jnp.maximum(sq, eps))


def bond_energy(x, box, idx, k, r0):
    """Sum_b k_b (|ri-rj| - r0_b)^2. Padded rows must have k == 0."""
    ri = x[idx[:, 0]]
    rj = x[idx[:, 1]]
    r = _safe_norm(displacement(ri, rj, box))
    dr = r - r0
    return jnp.sum(k * dr * dr)


def angle_energy(x, box, idx, k, theta0):
    """Sum_a k_a (theta - theta0)^2 with theta the i-j-k angle at j."""
    ri = x[idx[:, 0]]
    rj = x[idx[:, 1]]
    rk = x[idx[:, 2]]
    v1 = displacement(ri, rj, box)
    v2 = displacement(rk, rj, box)
    # Sanitize padded rows (k == 0, coincident atoms): degenerate geometry
    # has NaN angle gradients, and 0-cotangent * NaN = NaN. Substitute unit
    # vectors so the masked-out rows are differentiable everywhere.
    m = (k > 0)[:, None]
    ex = jnp.zeros_like(v1).at[:, 0].set(1.0)
    ey = jnp.zeros_like(v2).at[:, 1].set(1.0)
    v1 = jnp.where(m, v1, ex)
    v2 = jnp.where(m, v2, ey)
    # atan2 form: stable gradient at theta ~ 0 and pi (unlike arccos)
    cross = jnp.cross(v1, v2)
    sin_t = _safe_norm(cross)
    cos_t = jnp.sum(v1 * v2, axis=-1)
    theta = jnp.arctan2(sin_t, cos_t)
    dt = theta - theta0
    return jnp.sum(k * dt * dt)


def dihedral_angle(x, box, idx, valid=None):
    """Signed dihedral phi for rows (i, j, k, l), IUPAC sign convention.

    `valid` (bool [D]) sanitizes padded/degenerate rows — see angle_energy.
    """
    ri = x[idx[:, 0]]
    rj = x[idx[:, 1]]
    rk = x[idx[:, 2]]
    rl = x[idx[:, 3]]
    b1 = displacement(rj, ri, box)
    b2 = displacement(rk, rj, box)
    b3 = displacement(rl, rk, box)
    if valid is not None:
        m = valid[:, None]
        b1 = jnp.where(m, b1, jnp.zeros_like(b1).at[:, 0].set(1.0))
        b2 = jnp.where(m, b2, jnp.zeros_like(b2).at[:, 1].set(1.0))
        b3 = jnp.where(m, b3, jnp.zeros_like(b3).at[:, 2].set(1.0))
    n1 = jnp.cross(b1, b2)
    n2 = jnp.cross(b2, b3)
    b2n = b2 / _safe_norm(b2)[..., None]
    m1 = jnp.cross(n1, b2n)
    xc = jnp.sum(n1 * n2, axis=-1)
    yc = jnp.sum(m1 * n2, axis=-1)
    return jnp.arctan2(yc, xc)


def dihedral_energy(x, box, idx, k, n, phase):
    """Sum_d k_d (1 + cos(n_d phi - phase_d)). Impropers use the same form."""
    phi = dihedral_angle(x, box, idx, valid=(k != 0))
    return jnp.sum(k * (1.0 + jnp.cos(n * phi - phase)))


def bonded_energy(x, box, top, overrides=None):
    """Total bonded energy with per-term breakdown.

    Returns (total, dict) — the dict feeds Snapshot.energy_data-style
    reporting (reference /root/reference/src/md/mod.rs:1241-1245).
    """
    disabled = overrides is not None and overrides.bonded_disabled
    if disabled:
        z = jnp.zeros((), x.dtype)
        return z, {"bond": z, "angle": z, "dihedral": z}
    eb = bond_energy(x, box, top.bond_idx, top.bond_k, top.bond_r0)
    ea = angle_energy(x, box, top.angle_idx, top.angle_k, top.angle_theta0)
    ed = dihedral_energy(
        x, box, top.dihedral_idx, top.dihedral_k, top.dihedral_n,
        top.dihedral_phase,
    )
    return eb + ea + ed, {"bond": eb, "angle": ea, "dihedral": ed}
