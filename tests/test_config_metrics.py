"""MdConfig JSON persistence (reference MdPrefs, prefs/mod.rs:188) and
structured run metrics (SURVEY §5 metrics/observability)."""
import pytest
import numpy as np

from molchanica_tpu.md.config import (BarostatCfg, HydrogenConstraint,
                                      Integrator, MdConfig, MdOverrides,
                                      SimBoxInit, Solvent)


def test_config_json_roundtrip(tmp_path):
    cfg = MdConfig(
        integrator=Integrator.langevin_middle(gamma=3.0),
        temp_target=290.0,
        barostat_cfg=BarostatCfg(pressure_target=2.0, tau=1.5),
        sim_box=SimBoxInit.new_cube(30.0),
        solvent=Solvent.water_opc(),
        hydrogen_constraint=HydrogenConstraint.shake(tol=1e-5),
        lj_cutoff=8.0, coulomb_cutoff=8.0,
        overrides=MdOverrides(lj_disabled=True),
        pme_grid=(32, 32, 32), seed=42)
    p = tmp_path / "cfg.json"
    cfg.save(p)
    back = MdConfig.load(p)
    assert back == cfg


@pytest.mark.heavy
def test_metrics_and_trace_dir(tmp_path):
    import jax
    from molchanica_tpu.md.engine import MdSim
    from molchanica_tpu.systems.testmols import build_ethanol

    top, x0 = build_ethanol()
    cfg = MdConfig(integrator=Integrator.langevin_middle(gamma=2.0),
                   hydrogen_constraint=HydrogenConstraint.flexible(),
                   max_init_relaxation_iters=20, steps_per_chunk=20,
                   seed=3)
    sim = MdSim(top, cfg, x0)
    sim.run(0.001, 40, snapshot_interval=20)
    m = sim.metrics()
    assert m["steps"] >= 40
    assert m["sim_ps"] > 0 and m["wall_s"] > 0
    assert m["ns_per_day"] > 0
    assert m["n_sites"] == 9
