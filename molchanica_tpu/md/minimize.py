"""Energy minimization: jitted FIRE descent.

Fills the role of the reference's initial relaxation
(`max_init_relaxation_iters`, src/docking/mod.rs:115) and `step_energy_min`
(src/mol_alignment.rs:229) — run as a fixed-iteration lax.fori_loop so the
whole minimization is one XLA program.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def fire_minimize(
    force_fn,              # (x, box, couple) -> (F, (E, terms))
    x0,
    box,
    couple,
    dof_mask,
    n_steps: int = 200,
    dt_start: float = 1e-3,
    dt_max: float = 1e-2,
    max_disp: float = 0.1,
    f_inc: float = 1.1,
    f_dec: float = 0.5,
    alpha_start: float = 0.1,
    f_alpha: float = 0.99,
    n_min: int = 5,
    constrain_positions=None,
):
    """FIRE (fast inertial relaxation engine). Returns (x_min, E_min).

    `constrain_positions(x_new, x_ref)` is applied after every move so rigid
    waters / constrained H stay on the constraint manifold during relaxation
    (they carry no bonded restoring terms)."""
    dm = dof_mask[:, None]
    cp = constrain_positions or (lambda x_new, x_ref: x_new)

    def body(_, carry):
        x, v, dt, alpha, n_pos = carry
        f, (e, _) = force_fn(x, box, couple)
        f = f * dm
        p = jnp.sum(f * v)
        f_norm = jnp.sqrt(jnp.sum(f * f)) + 1e-12
        v_norm = jnp.sqrt(jnp.sum(v * v))
        v = (1.0 - alpha) * v + alpha * f / f_norm * v_norm
        uphill = p <= 0.0
        v = jnp.where(uphill, jnp.zeros_like(v), v)
        n_pos = jnp.where(uphill, 0, n_pos + 1)
        grow = jnp.logical_and(jnp.logical_not(uphill), n_pos > n_min)
        dt = jnp.where(grow, jnp.minimum(dt * f_inc, dt_max),
                       jnp.where(uphill, dt * f_dec, dt))
        alpha = jnp.where(grow, alpha * f_alpha,
                          jnp.where(uphill, alpha_start, alpha))
        v = v + dt * f
        dx = dt * v
        # clamp per-atom displacement
        dx_norm = jnp.sqrt(jnp.sum(dx * dx, axis=-1, keepdims=True)) + 1e-12
        dx = dx * jnp.minimum(1.0, max_disp / dx_norm)
        return cp(x + dx * dm, x), v, dt, alpha, n_pos

    v0 = jnp.zeros_like(x0)
    x, _, _, _, _ = jax.lax.fori_loop(
        0, n_steps, body,
        (x0, v0, jnp.asarray(dt_start, x0.dtype),
         jnp.asarray(alpha_start, x0.dtype), jnp.asarray(0)),
    )
    _, (e, _) = force_fn(x, box, couple)
    return x, e


def fire_minimize_hostloop(
    force_fn, x0, box, couple, dof_mask, n_steps: int = 200,
    constrain_positions=None, dt_start=1e-3, dt_max=1e-2, max_disp=0.1,
    f_inc=1.1, f_dec=0.5, alpha_start=0.1, f_alpha=0.99, n_min=5,
):
    """FIRE with a host-side python loop over one jitted iteration.

    Identical math to fire_minimize, but the device program contains a
    single iteration (force at top level, no lax loop around the Pallas
    call) — the reliable shape on the axon remote-compile backend.
    """
    dm = dof_mask[:, None]
    cp = constrain_positions or (lambda x_new, x_ref: x_new)

    def one(x, v, dt, alpha, n_pos):
        f, (e, _) = force_fn(x, box, couple)
        f = f * dm
        p = jnp.sum(f * v)
        f_norm = jnp.sqrt(jnp.sum(f * f)) + 1e-12
        v_norm = jnp.sqrt(jnp.sum(v * v))
        v = (1.0 - alpha) * v + alpha * f / f_norm * v_norm
        uphill = p <= 0.0
        v = jnp.where(uphill, jnp.zeros_like(v), v)
        n_pos = jnp.where(uphill, 0, n_pos + 1)
        grow = jnp.logical_and(jnp.logical_not(uphill), n_pos > n_min)
        dt = jnp.where(grow, jnp.minimum(dt * f_inc, dt_max),
                       jnp.where(uphill, dt * f_dec, dt))
        alpha = jnp.where(grow, alpha * f_alpha,
                          jnp.where(uphill, alpha_start, alpha))
        v = v + dt * f
        dx = dt * v
        dx_norm = jnp.sqrt(jnp.sum(dx * dx, axis=-1, keepdims=True)) + 1e-12
        dx = dx * jnp.minimum(1.0, max_disp / dx_norm)
        return cp(x + dx * dm, x), v, dt, alpha, n_pos, e

    one_jit = jax.jit(one)
    x = x0
    v = jnp.zeros_like(x0)
    dt = jnp.asarray(dt_start, x0.dtype)
    alpha = jnp.asarray(alpha_start, x0.dtype)
    n_pos = jnp.asarray(0)
    e = jnp.zeros((), x0.dtype)
    for it in range(n_steps):
        x, v, dt, alpha, n_pos, e = one_jit(x, v, dt, alpha, n_pos)
        if it % 32 == 31:
            jax.block_until_ready(x)   # keep the dispatch queue shallow
    jax.block_until_ready(x)
    return x, e
