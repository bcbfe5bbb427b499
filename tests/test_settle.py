"""SETTLE: exact rigid geometry after a perturbed step, momentum
preservation, and velocity projection removing bond-rate components."""
import math

import numpy as np
import jax.numpy as jnp

from molchanica_tpu.md.settle import (
    settle_params,
    settle_positions,
    settle_velocities,
)

R_OH = 0.8724
THETA = math.radians(103.6)
M_O, M_H = 15.999, 1.008


def _make_waters(n, seed=0):
    rng = np.random.default_rng(seed)
    ra, rb, rc = settle_params(R_OH, THETA, M_O, M_H)
    xs = []
    for i in range(n):
        # canonical triangle, randomly rotated + translated
        o = np.array([0.0, ra, 0.0])
        h1 = np.array([-rc, -rb, 0.0])
        h2 = np.array([rc, -rb, 0.0])
        A = rng.normal(size=(3, 3))
        Q, _ = np.linalg.qr(A)
        t = rng.uniform(-10, 10, 3)
        xs.append(np.stack([o @ Q.T + t, h1 @ Q.T + t, h2 @ Q.T + t]))
    return np.concatenate(xs), ra, rb, rc


def test_settle_restores_exact_geometry():
    n = 50
    x_old, ra, rb, rc = _make_waters(n)
    rng = np.random.default_rng(1)
    x_new = x_old + rng.normal(0, 0.08, x_old.shape)   # unconstrained drift
    widx = np.arange(3 * n, dtype=np.int32).reshape(n, 3)
    x_fix = np.asarray(settle_positions(
        jnp.asarray(x_new), jnp.asarray(x_old), jnp.asarray(widx),
        ra, rb, rc, M_O, M_H))
    o, h1, h2 = x_fix[widx[:, 0]], x_fix[widx[:, 1]], x_fix[widx[:, 2]]
    d_oh1 = np.linalg.norm(o - h1, axis=1)
    d_oh2 = np.linalg.norm(o - h2, axis=1)
    d_hh = np.linalg.norm(h1 - h2, axis=1)
    r_hh = 2 * R_OH * math.sin(THETA / 2)
    assert np.abs(d_oh1 - R_OH).max() < 1e-5
    assert np.abs(d_oh2 - R_OH).max() < 1e-5
    assert np.abs(d_hh - r_hh).max() < 1e-5
    # COM preserved (constraint forces are internal)
    m = np.array([M_O, M_H, M_H])
    com_new = (x_new.reshape(n, 3, 3) * m[None, :, None]).sum(1) / m.sum()
    com_fix = (x_fix.reshape(n, 3, 3) * m[None, :, None]).sum(1) / m.sum()
    assert np.abs(com_new - com_fix).max() < 1e-5
    # corrections should be small (same order as the perturbation)
    assert np.abs(x_fix - x_new).max() < 0.5


def test_settle_velocity_projection():
    n = 30
    x, ra, rb, rc = _make_waters(n, seed=2)
    rng = np.random.default_rng(3)
    v = rng.normal(0, 1.0, x.shape)
    widx = np.arange(3 * n, dtype=np.int32).reshape(n, 3)
    v_fix = np.asarray(settle_velocities(
        jnp.asarray(v), jnp.asarray(x), jnp.asarray(widx), M_O, M_H))
    o, h1, h2 = x[widx[:, 0]], x[widx[:, 1]], x[widx[:, 2]]
    vo, vh1, vh2 = v_fix[widx[:, 0]], v_fix[widx[:, 1]], v_fix[widx[:, 2]]
    # bond-direction relative velocities vanish
    r1 = ((o - h1) * (vo - vh1)).sum(1)
    r2 = ((o - h2) * (vo - vh2)).sum(1)
    r3 = ((h1 - h2) * (vh1 - vh2)).sum(1)
    assert np.abs(r1).max() < 1e-8
    assert np.abs(r2).max() < 1e-8
    assert np.abs(r3).max() < 1e-8
    # momentum conserved
    m = np.array([M_O, M_H, M_H])
    p0 = (v.reshape(n, 3, 3) * m[None, :, None]).sum((0, 1))
    p1 = (v_fix.reshape(n, 3, 3) * m[None, :, None]).sum((0, 1))
    assert np.abs(p0 - p1).max() < 1e-8
