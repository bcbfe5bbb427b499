"""Species-split direct-force path parity (round 4).

The split path factors the direct sum into a pure-LJ kernel over water O
sites, a pure-Coulomb kernel over water H/M sites, and a full cross
kernel solute x master (fast_engine.FastSim.__init__, MOLCHANICA_SPLIT).
These tests pin it against the monolithic colpair kernel on the same
state: identical windows' physics, different slot partition/order, so
agreement is limited only by f32 reassociation.

Reference capability: the single CUDA pair kernel path
(/root/reference/src/cuda/util.cu:93) — here split by interaction
signature because OPC's O carries only LJ and H/M only charge.
"""
import numpy as np
import pytest

import jax

pytestmark = pytest.mark.heavy  # minutes-per-test CPU tier (see README)


def _build(seed=3):
    from molchanica_tpu.md.config import (
        HydrogenConstraint, Integrator, MdConfig)
    from molchanica_tpu.systems.bench_systems import build_solvated_protein

    asys = build_solvated_protein(n_residues=10, target_sites=2600,
                                  seed=seed)
    cfg = MdConfig(integrator=Integrator.langevin_middle(gamma=1.0),
                   temp_target=310.0, lj_cutoff=7.0, coulomb_cutoff=7.0,
                   hydrogen_constraint=HydrogenConstraint.shake(),
                   dtype="float32", max_init_relaxation_iters=None,
                   neighbor_rebuild_every=10, seed=7)
    return asys, cfg


def _force_eval(split, monkeypatch):
    monkeypatch.setenv("MOLCHANICA_SPLIT", "1" if split else "0")
    from molchanica_tpu.md.fast_engine import FastSim

    asys, cfg = _build()
    sim = FastSim(asys.topology, cfg, asys.positions,
                  box_extent=asys.box_extent)
    if split:
        assert sim._split is not None, "split path did not activate"
        assert sim._split["has_solute"]
    else:
        assert sim._split is None
    f, (e, terms) = jax.jit(
        lambda st: sim._make_force_fn(None)(st.x, st))(sim.state)
    perm = np.asarray(sim.state.perm)
    fb = np.zeros((sim.n_base, 3), np.float32)
    good = perm < sim.n_base
    fb[perm[good]] = np.asarray(f)[good]
    return float(e), {k: float(v) for k, v in terms.items()}, fb


def test_split_force_energy_parity(monkeypatch):
    e0, t0, f0 = _force_eval(False, monkeypatch)
    e1, t1, f1 = _force_eval(True, monkeypatch)
    assert abs(t0["lj"] - t1["lj"]) / max(abs(t0["lj"]), 1.0) < 1e-5
    assert abs(t0["coulomb"] - t1["coulomb"]) \
        / max(abs(t0["coulomb"]), 1.0) < 1e-5
    scale = np.abs(f0).max()
    assert np.abs(f0 - f1).max() / scale < 5e-4


def test_split_short_dynamics_parity(monkeypatch):
    """A short Langevin run (same seed) must track between the paths —
    catches reaction-force/merge bugs that static parity can miss."""
    outs = []
    for split in (False, True):
        monkeypatch.setenv("MOLCHANICA_SPLIT", "1" if split else "0")
        from molchanica_tpu.md.fast_engine import FastSim
        asys, cfg = _build()
        sim = FastSim(asys.topology, cfg, asys.positions,
                      box_extent=asys.box_extent)
        sim.step(0.001, 30)
        outs.append(np.asarray(sim.positions_unsorted()))
        assert np.isfinite(outs[-1]).all()
    dx = np.abs(outs[0] - outs[1]).max()
    # identical RNG; divergence only from f32 force reassociation
    # amplified over 30 steps
    assert dx < 5e-2, dx


def test_split_pure_water_box(monkeypatch):
    """No-solute system: the cross kernel is skipped statically and the
    split path must still agree with the monolithic kernel."""
    monkeypatch.setenv("MOLCHANICA_SPLIT", "1")
    from molchanica_tpu.md.config import (
        HydrogenConstraint, Integrator, MdConfig)
    from molchanica_tpu.md.fast_engine import FastSim
    from molchanica_tpu.molecules.spec import assemble_system
    from molchanica_tpu.systems.water import OPC

    box = np.array([24.0, 24.0, 24.0])
    asys = assemble_system([], box_extent=box, water_model=OPC, seed=1)
    cfg = MdConfig(integrator=Integrator.langevin_middle(gamma=1.0),
                   temp_target=300.0, lj_cutoff=6.0, coulomb_cutoff=6.0,
                   hydrogen_constraint=HydrogenConstraint.shake(),
                   dtype="float32", max_init_relaxation_iters=None,
                   neighbor_rebuild_every=10, seed=5)
    sim = FastSim(asys.topology, cfg, asys.positions,
                  box_extent=asys.box_extent)
    assert sim._split is not None and not sim._split["has_solute"]
    f1, (e1, t1) = jax.jit(
        lambda st: sim._make_force_fn(None)(st.x, st))(sim.state)

    monkeypatch.setenv("MOLCHANICA_SPLIT", "0")
    sim0 = FastSim(asys.topology, cfg, asys.positions,
                   box_extent=asys.box_extent)
    f0, (e0, t0) = jax.jit(
        lambda st: sim0._make_force_fn(None)(st.x, st))(sim0.state)
    assert abs(float(t0["coulomb"]) - float(t1["coulomb"])) \
        / max(abs(float(t0["coulomb"])), 1.0) < 1e-5
    assert abs(float(t0["lj"]) - float(t1["lj"])) \
        / max(abs(float(t0["lj"])), 1.0) < 1e-5
