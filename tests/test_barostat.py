"""Virial pressure via the exact isotropic-scaling derivative.

Regression for the round-1 advisor finding: the atom-wise virial sum(x.F)
is invalid under PBC (boundary pairs contribute box-shift errors, and the
PME reciprocal virial was omitted). The scaling form P = (2KE - dE/ds)/(3V)
is exact and translation-invariant.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from molchanica_tpu.constants import KB, PRESSURE_KCAL_PER_A3_TO_BAR
from molchanica_tpu.md.barostat import scaling_pressure_bar


def test_ideal_gas_pressure():
    """No interactions: P must equal n kB T / V exactly."""
    rng = np.random.default_rng(0)
    n, L, T = 64, 20.0, 300.0
    x = jnp.asarray(rng.uniform(0, L, (n, 3)))
    box = jnp.asarray([L, L, L], jnp.float64)
    masses = jnp.full((n,), 39.9)
    dof = jnp.ones((n,))
    # velocities at exactly T: v^2 = 3 kB T / m per atom (ACCEL units)
    from molchanica_tpu.constants import ACCEL_FACTOR
    v_mag = np.sqrt(3.0 * KB * T / 39.9 * ACCEL_FACTOR)
    vdir = rng.normal(size=(n, 3))
    vdir /= np.linalg.norm(vdir, axis=1, keepdims=True)
    v = jnp.asarray(vdir * v_mag)

    e_fn = lambda x_, b_, c_: jnp.zeros(())
    p = float(scaling_pressure_bar(e_fn, x, box, v, masses, dof,
                                   jnp.asarray(1.0)))
    p_expected = n * KB * T / L ** 3 * PRESSURE_KCAL_PER_A3_TO_BAR
    np.testing.assert_allclose(p, p_expected, rtol=1e-6)


def test_translation_invariance_lj_pbc():
    """Shifting all positions by half a box must not change the pressure
    (pairs re-wrap across the boundary; the atom-wise sum(x.F) form fails
    this, the scaling form cannot)."""
    from molchanica_tpu.ops.pbc import minimum_image

    rng = np.random.default_rng(1)
    n, L = 48, 12.0
    x0 = rng.uniform(0, L, (n, 3))
    box = jnp.asarray([L, L, L], jnp.float64)

    def lj_energy(x, b, c):
        d = minimum_image(x[:, None, :] - x[None, :, :], b)
        r2 = jnp.sum(d * d, -1) + jnp.eye(n) * 1e9
        s6 = (3.4 ** 2 / r2) ** 3
        return jnp.sum(0.5 * 4.0 * 0.24 * (s6 * s6 - s6))

    masses = jnp.full((n,), 39.9)
    dof = jnp.ones((n,))
    v = jnp.zeros((n, 3))
    c = jnp.asarray(1.0)
    p0 = float(scaling_pressure_bar(lj_energy, jnp.asarray(x0), box, v,
                                    masses, dof, c))
    shift = np.array([L / 2, L / 3, L / 7])
    x1 = (x0 + shift) % L
    p1 = float(scaling_pressure_bar(lj_energy, jnp.asarray(x1), box, v,
                                    masses, dof, c))
    assert np.isfinite(p0)
    np.testing.assert_allclose(p0, p1, rtol=1e-8)


def test_molecular_pressure_rigid_ideal_gas():
    """Rigid diatomics with no intermolecular forces: the MOLECULAR
    (COM-scaling) pressure must be n_mol kB T_trans / V — independent of the
    (infinite-frequency) bond constraint. Atomic scaling + full atomic KE
    would instead need the constraint-force virial to cancel the rotational
    KE; the COM form never sees either (round-2 advisor finding)."""
    rng = np.random.default_rng(3)
    n_mol, L, T = 32, 20.0, 300.0
    m = 18.0
    com = rng.uniform(0, L, (n_mol, 3))
    bond = rng.normal(size=(n_mol, 3))
    bond /= np.linalg.norm(bond, axis=1, keepdims=True)
    x = np.stack([com + 0.5 * bond, com - 0.5 * bond], 1).reshape(-1, 3)
    mol_id = jnp.asarray(np.repeat(np.arange(n_mol), 2).astype(np.int32))
    masses = jnp.full((2 * n_mol,), m / 2)
    dof = jnp.ones((2 * n_mol,))
    from molchanica_tpu.constants import ACCEL_FACTOR
    # COM velocities at exactly T (translation) + arbitrary rotation about
    # the COM (must NOT contribute to the molecular pressure)
    v_mag = np.sqrt(3.0 * KB * T / m * ACCEL_FACTOR)
    vdir = rng.normal(size=(n_mol, 3))
    vdir /= np.linalg.norm(vdir, axis=1, keepdims=True)
    v_com = vdir * v_mag
    omega = rng.normal(size=(n_mol, 3)) * 10.0
    v_rot = np.cross(omega, 0.5 * bond)
    v = np.stack([v_com + v_rot, v_com - v_rot], 1).reshape(-1, 3)
    e_fn = lambda x_, b_, c_: jnp.zeros(())
    box = jnp.asarray([L, L, L], jnp.float64)
    p = float(scaling_pressure_bar(
        e_fn, jnp.asarray(x), box, jnp.asarray(v), masses, dof,
        jnp.asarray(1.0), mol_id=mol_id, n_mol=n_mol))
    p_expected = n_mol * KB * T / L ** 3 * PRESSURE_KCAL_PER_A3_TO_BAR
    np.testing.assert_allclose(p, p_expected, rtol=1e-6)


def test_molecular_scaling_preserves_geometry():
    """berendsen_scale_chunk with mol_id translates molecules rigidly:
    intramolecular distances are bit-preserved through the scale."""
    from molchanica_tpu.md.barostat import berendsen_scale_chunk

    rng = np.random.default_rng(4)
    n_mol, L = 16, 15.0
    com = rng.uniform(0, L, (n_mol, 3))
    offs = rng.normal(size=(n_mol, 3, 3)) * 0.5
    x = (com[:, None, :] + offs).reshape(-1, 3)
    mol_id = jnp.asarray(np.repeat(np.arange(n_mol), 3).astype(np.int32))
    masses = jnp.full((3 * n_mol,), 6.0)
    dof = jnp.ones((3 * n_mol,))
    v = jnp.zeros((3 * n_mol, 3))
    box = jnp.asarray([L, L, L], jnp.float64)
    # a strongly repulsive homogeneous energy so mu != 1
    e_fn = lambda x_, b_, c_: 1e3 / jnp.prod(b_ / L)
    x_new, box_new, p = berendsen_scale_chunk(
        e_fn, jnp.asarray(x), box, v, masses, dof, jnp.asarray(1.0),
        pressure_target_bar=1.0, tau_ps=0.5, dt_eff_ps=0.05,
        mol_id=mol_id, n_mol=n_mol)
    assert abs(float(box_new[0]) / L - 1.0) > 1e-5   # scale engaged
    d_old = (np.asarray(x).reshape(n_mol, 3, 3)[:, 0]
             - np.asarray(x).reshape(n_mol, 3, 3)[:, 1])
    d_new = (np.asarray(x_new).reshape(n_mol, 3, 3)[:, 0]
             - np.asarray(x_new).reshape(n_mol, 3, 3)[:, 1])
    np.testing.assert_allclose(d_new, d_old, atol=1e-9)


@pytest.mark.heavy
def test_npt_water_density_sane():
    """Short NPT on a small water box: box stays finite, moves toward
    (not away from) ambient density, pressure finite."""
    from molchanica_tpu.md.config import (
        BarostatCfg, HydrogenConstraint, Integrator, MdConfig)
    from molchanica_tpu.md.engine import MdSim
    from molchanica_tpu.molecules.spec import assemble_system
    from molchanica_tpu.systems.water import TIP3P

    asys = assemble_system(
        [], box_extent=np.array([14.0] * 3), water_model=TIP3P,
        n_waters=60, seed=2)
    cfg = MdConfig(
        integrator=Integrator.langevin_middle(gamma=5.0),
        temp_target=300.0, lj_cutoff=6.0, coulomb_cutoff=6.0,
        hydrogen_constraint=HydrogenConstraint.shake(),
        dtype="float64", max_init_relaxation_iters=60,
        steps_per_chunk=25, barostat_cfg=BarostatCfg(
            pressure_target=1.0, tau=0.5), seed=5)
    sim = MdSim(asys.topology, cfg, asys.positions,
                box_extent=asys.box_extent, method="allpairs_cutoff")
    sim.step(0.001, 50)
    box = np.asarray(sim.state.box)
    assert np.all(np.isfinite(box)) and np.all(box > 8.0) \
        and np.all(box < 20.0)


@pytest.mark.heavy
def test_fastsim_npt_water():
    """NPT on the FAST path: FD molecular-virial pressure through the
    Pallas energy + COM scaling. An under-dense water box (negative
    pressure, attraction-dominated) must shrink toward density under
    P_target = 1 bar, with rigid geometries exactly preserved."""
    from molchanica_tpu.md.config import BarostatCfg, Integrator, MdConfig
    from molchanica_tpu.md.fast_engine import FastSim
    from molchanica_tpu.molecules.spec import assemble_system
    from molchanica_tpu.systems.water import OPC

    box = np.array([24.5] * 3)
    asys = assemble_system([], box_extent=box, water_model=OPC,
                           n_waters=300, seed=4)
    cfg = MdConfig(integrator=Integrator.langevin_middle(gamma=2.0),
                   temp_target=300.0, lj_cutoff=5.5, coulomb_cutoff=5.5,
                   dtype="float32", max_init_relaxation_iters=None,
                   neighbor_rebuild_every=10, seed=3,
                   barostat_cfg=BarostatCfg(pressure_target=1.0, tau=0.5))
    sim = FastSim(asys.topology, cfg, asys.positions, box_extent=box)
    sim.minimize(150)
    v0 = float(jnp.prod(sim.state.box))
    sim.step(0.001, 60)
    v1 = float(jnp.prod(sim.state.box))
    assert np.isfinite(sim.temperature())
    assert v1 < v0 * 0.9995, (v0, v1)      # shrinking toward density
    # rigid OPC water preserved exactly through the molecular scaling
    x = sim.positions_unsorted()
    ws, wc = asys.topology.water_start, asys.topology.water_count
    stride = asys.topology.water_site_count
    o = x[ws:ws + wc * stride:stride]
    h1 = x[ws + 1:ws + wc * stride:stride]
    d = np.linalg.norm(h1 - o, axis=1)
    r_oh = asys.topology.water_r_oh
    assert np.abs(d - r_oh).max() < 5e-3, np.abs(d - r_oh).max()
