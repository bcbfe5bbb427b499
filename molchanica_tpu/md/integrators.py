"""Integrators: leapfrog, velocity-Verlet, Langevin-middle; CSVR thermostat.

Parity: the reference's Integrator enum (src/state.rs:837-845 —
Leapfrog{thermostat}, VerletVelocity{thermostat}, LangevinMiddle{gamma}) with
CSVR (Bussi canonical-sampling-velocity-rescaling) for the deterministic
integrators (README.md:229 "CSVR or Langevin Middle").

Each step function is pure: (positions, velocities, key, forces) -> updated,
built to live inside lax.scan/fori_loop. Constraint application (SETTLE /
SHAKE / RATTLE) is injected as two callables:
  constrain_positions(x_new, x_ref)        -> x_new'
  constrain_velocities(v, x)               -> v'
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..constants import ACCEL_FACTOR, KB
from .state import kinetic_energy


def _accel(forces, masses, dof_mask):
    a = forces * (ACCEL_FACTOR / jnp.maximum(masses, 1e-6))[:, None]
    return a * dof_mask[:, None]


def csvr_rescale(key, velocities, masses, dof_mask, temp_target, dt, tau,
                 n_constraints=0):
    """Bussi CSVR stochastic velocity rescaling; returns scaled velocities.

    alpha^2 = c + (1-c) (KEbar/(ndof KE)) (R1^2 + S) + 2 R1 sqrt(c(1-c) KEbar/(ndof KE))
    with c = exp(-dt/tau), S ~ chi^2_(ndof-1), KEbar = ndof kB T / 2.
    """
    ndof = 3.0 * jnp.sum(dof_mask) - n_constraints - 3.0
    ke = kinetic_energy(velocities, masses, dof_mask)
    ke = jnp.maximum(ke, 1e-10)
    ke_bar = 0.5 * ndof * KB * temp_target
    c = jnp.exp(-dt / tau)
    k1, k2 = jax.random.split(key)
    r1 = jax.random.normal(k1, (), velocities.dtype)
    # S ~ chi^2_{ndof-1} = Gamma(shape=(ndof-1)/2, scale=2)
    s = 2.0 * jax.random.gamma(k2, 0.5 * (ndof - 1.0), dtype=velocities.dtype)
    ratio = ke_bar / (ndof * ke)
    alpha2 = c + (1.0 - c) * ratio * (r1 * r1 + s) \
        + 2.0 * r1 * jnp.sqrt(c * (1.0 - c) * ratio)
    alpha = jnp.sqrt(jnp.maximum(alpha2, 1e-12))
    return velocities * alpha


def make_integrator_step(
    force_fn,                 # (x, box, couple) -> (F, (E, terms))
    masses,
    dof_mask,
    kind: str,
    dt: float,
    temp_target: float,
    thermostat_tau: Optional[float],
    gamma: float,
    constrain_positions: Optional[Callable] = None,
    constrain_velocities: Optional[Callable] = None,
    n_constraints: int = 0,
    external_forces_fn: Optional[Callable] = None,
    force_cap: Optional[float] = None,
    cadence: str = "light",
):
    """Build one_step(x, v, forces, box, couple, key[, noise]) ->
    (x, v, forces, E, terms, key).

    `forces` is carried across steps so each step does exactly one force
    evaluation (velocity-Verlet style). external_forces_fn(x, step-like aux)
    implements the reference's `step(dev, dt, Some(external_forces))` hook
    (src/mol_alignment.rs:338) — synthetic per-atom forces added to the field.

    `noise` (langevin_middle only): optional pre-drawn STANDARD normals of
    v.shape. Drawing the whole chunk's noise in one [k, N, 3] call outside
    the scan amortizes the per-step threefry+erfinv op overhead (~0.5 ms at
    25k sites when drawn per step); the caller advances the key itself.

    `cadence` (langevin_middle only): see config.Integrator.cadence.
    """
    cp = constrain_positions or (lambda x_new, x_ref: x_new)
    cv = constrain_velocities or (lambda v, x: v)
    dm = dof_mask[:, None]

    def eval_forces(x, box, couple):
        f, (e, terms) = force_fn(x, box, couple)
        if external_forces_fn is not None:
            f = f + external_forces_fn(x)
        if force_cap is not None:
            # per-atom force clamp — equilibration aid for clashy starts
            # (the GROMACS-style "cap forces" warmup)
            norm = jnp.sqrt(jnp.sum(f * f, axis=-1, keepdims=True))
            f = f * jnp.minimum(1.0, force_cap / jnp.maximum(norm, 1e-9))
        return f, e, terms

    # Constrained drift: SHAKE-style projection PLUS the velocity update
    # implied by the constraint displacement, v += (x_c - x_u)/h. Without
    # the velocity feedback the projection silently destroys the kinetic
    # energy that pushed into the constraint each step, and thermostatted
    # constrained systems equilibrate far below the target temperature
    # (observed: rigid OPC water at ~170 K for a 310 K target).
    def drift(x, v, h):
        xu = x + h * v * dm
        xc = cp(xu, x)
        v = v + (xc - xu) / h
        return xc, v

    if kind == "verlet_velocity":
        def one_step(x, v, f, box, couple, key, noise=None):
            a = _accel(f, masses, dof_mask)
            v_half = v + 0.5 * dt * a
            x_new, v_half = drift(x, v_half, dt)
            f_new, e, terms = eval_forces(x_new, box, couple)
            a_new = _accel(f_new, masses, dof_mask)
            v_new = v_half + 0.5 * dt * a_new
            v_new = cv(v_new, x_new)
            if thermostat_tau is not None:
                key, sub = jax.random.split(key)
                v_new = csvr_rescale(sub, v_new, masses, dof_mask,
                                     temp_target, dt, thermostat_tau,
                                     n_constraints)
            return x_new, v_new, f_new, e, terms, key

    elif kind == "leapfrog":
        def one_step(x, v, f, box, couple, key, noise=None):
            # v is v(t - dt/2); kick to v(t + dt/2), then drift.
            a = _accel(f, masses, dof_mask)
            v_new = v + dt * a
            if thermostat_tau is not None:
                key, sub = jax.random.split(key)
                v_new = csvr_rescale(sub, v_new, masses, dof_mask,
                                     temp_target, dt, thermostat_tau,
                                     n_constraints)
            x_new, v_new = drift(x, v_new, dt)
            v_new = cv(v_new, x_new)
            f_new, e, terms = eval_forces(x_new, box, couple)
            return x_new, v_new, f_new, e, terms, key

    elif kind == "langevin_middle":
        # BAOAB splitting (OpenMM LangevinMiddle): B A O A. Two constraint
        # cadences (config.Integrator.cadence):
        #   "light"  — OpenMM's schedule: RATTLE once after the kick,
        #              SHAKE once (with velocity feedback) after the last
        #              half-drift. The half-drift off the manifold is
        #              O(dt^2) and the final projection restores it.
        #   "strict" — g-BAOAB: projection after every substep.
        c1 = jnp.exp(-gamma * dt)
        sigma = jnp.sqrt(
            KB * temp_target * ACCEL_FACTOR
            / jnp.maximum(masses, 1e-6) * (1.0 - c1 * c1))[:, None]

        def draw(key, noise, like):
            if noise is None:
                key, sub = jax.random.split(key)
                noise = jax.random.normal(sub, like.shape, like.dtype)
            return key, noise * sigma

        if cadence == "light":
            def one_step(x, v, f, box, couple, key, noise=None):
                a = _accel(f, masses, dof_mask)
                v1 = cv(v + dt * a, x)                          # B + RATTLE
                x1 = x + (0.5 * dt) * v1 * dm                   # A
                key, kick = draw(key, noise, v)
                v2 = (c1 * v1 + kick) * dm                      # O
                xu = x1 + (0.5 * dt) * v2 * dm                  # A
                # SHAKE against the start-of-step manifold; the velocity
                # feedback divides by the FULL dt (OpenMM: v += (x-x1)/dt)
                # — dividing by the half-step double-counts the correction
                # and systematically drains kinetic energy (measured:
                # 310 K target equilibrating at ~273 K)
                x2 = cp(xu, x)
                v2 = v2 + (x2 - xu) * (1.0 / dt)
                f_new, e, terms = eval_forces(x2, box, couple)
                return x2, v2, f_new, e, terms, key
        else:
            def one_step(x, v, f, box, couple, key, noise=None):
                a = _accel(f, masses, dof_mask)
                v1 = v + dt * a                                 # B
                x1, v1 = drift(x, v1, 0.5 * dt)                 # A
                v1 = cv(v1, x1)
                key, kick = draw(key, noise, v)
                v2 = (c1 * v1 + kick) * dm                      # O
                v2 = cv(v2, x1)
                x2, v2 = drift(x1, v2, 0.5 * dt)                # A
                v2 = cv(v2, x2)
                f_new, e, terms = eval_forces(x2, box, couple)
                return x2, v2, f_new, e, terms, key

    else:
        raise ValueError(f"unknown integrator kind: {kind}")

    return one_step
