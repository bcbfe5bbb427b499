"""FastSim NVE energy conservation on periodic water.

The most sensitive end-to-end detector of pair-force inconsistency in the
production engine (colpair kernel + exclusion subtraction + SETTLE + PME):
the round-3 sigma-clamp kink left ~1e5 kcal/mol/A uncancelled on single
amide pairs — any such class of bug shows up here as a catastrophic energy
jump, while healthy f32 dynamics drift at ~5e-3 kcal/mol/ps/site
(calibrated on this exact system; bound set 5x above)."""
import numpy as np
import pytest

from molchanica_tpu.md.config import Integrator, MdConfig
from molchanica_tpu.md.fast_engine import FastSim
from molchanica_tpu.molecules.spec import assemble_system
from molchanica_tpu.systems.water import OPC

pytestmark = pytest.mark.heavy  # minutes-per-test CPU tier (see README)


def test_fast_nve_water_energy_conservation():
    box = np.array([24.5] * 3)
    asys = assemble_system([], box_extent=box, water_model=OPC,
                           n_waters=300, seed=4)
    cfg_eq = MdConfig(integrator=Integrator.langevin_middle(gamma=2.0),
                      temp_target=300.0, lj_cutoff=5.5, coulomb_cutoff=5.5,
                      dtype="float32", max_init_relaxation_iters=None,
                      neighbor_rebuild_every=10, seed=3)
    sim = FastSim(asys.topology, cfg_eq, asys.positions, box_extent=box)
    sim.minimize(200)
    sim.step(0.001, 500)
    x_eq = sim.positions_unsorted()
    v_eq = sim.velocities_unsorted()

    cfg = MdConfig(integrator=Integrator.verlet_velocity(thermostat=None),
                   temp_target=300.0, lj_cutoff=5.5, coulomb_cutoff=5.5,
                   dtype="float32", max_init_relaxation_iters=None,
                   neighbor_rebuild_every=10, zero_com_drift=False, seed=3)
    nve = FastSim(asys.topology, cfg, x_eq, box_extent=box,
                  velocities=v_eq)
    es = []
    for _ in range(20):
        nve.step(0.001, 10, record_energy=True)
        es.append(float(nve.state.pe_last) + float(nve.state.ke_last))
    es = np.asarray(es)
    n_sites = asys.topology.n_atoms_real
    assert np.isfinite(es).all()
    # secular drift (linear fit over 0.2 ps)
    drift = np.polyfit(np.arange(len(es)) * 0.01, es, 1)[0] / n_sites
    assert abs(drift) < 0.03, f"NVE drift {drift:.4f} kcal/mol/ps/site"
    # no single-step catastrophe (the clamp-kink class injected ~1e3+)
    spread = es.max() - es.min()
    assert spread < 0.01 * abs(es.mean()), \
        f"NVE energy spread {spread:.2f} on |E|~{abs(es.mean()):.0f}"
