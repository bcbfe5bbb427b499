"""Determinism policy (docs/DETERMINISM.md): bitwise same-seed
reproducibility, seed sensitivity, chunking invariance."""
import pytest
import numpy as np

from molchanica_tpu.md.config import HydrogenConstraint, Integrator, MdConfig
from molchanica_tpu.md.engine import MdSim
from molchanica_tpu.molecules.spec import assemble_system
from molchanica_tpu.systems.water import TIP3P


def _sim(seed, steps_per_chunk=50):
    asys = assemble_system([], box_extent=np.array([14.0] * 3),
                           water_model=TIP3P, n_waters=50, seed=2)
    cfg = MdConfig(integrator=Integrator.langevin_middle(gamma=3.0),
                   temp_target=300.0, lj_cutoff=6.0, coulomb_cutoff=6.0,
                   hydrogen_constraint=HydrogenConstraint.shake(),
                   dtype="float64", max_init_relaxation_iters=50,
                   steps_per_chunk=steps_per_chunk, seed=seed,
                   zero_com_drift=False)
    return MdSim(asys.topology, cfg, asys.positions,
                 box_extent=asys.box_extent, method="allpairs_cutoff")


@pytest.mark.heavy
def test_same_seed_bitwise():
    a = _sim(11)
    b = _sim(11)
    a.step(0.001, 100)
    b.step(0.001, 100)
    np.testing.assert_array_equal(np.asarray(a.state.positions),
                                  np.asarray(b.state.positions))
    np.testing.assert_array_equal(np.asarray(a.state.velocities),
                                  np.asarray(b.state.velocities))


@pytest.mark.heavy
def test_different_seed_diverges():
    a = _sim(11)
    b = _sim(12)
    a.step(0.001, 50)
    b.step(0.001, 50)
    assert not np.allclose(np.asarray(a.state.positions),
                           np.asarray(b.state.positions))


@pytest.mark.heavy
def test_chunking_invariance():
    a = _sim(7, steps_per_chunk=100)
    b = _sim(7, steps_per_chunk=100)
    a.step(0.001, 100)
    for _ in range(4):
        b.step(0.001, 25)
    np.testing.assert_allclose(np.asarray(a.state.positions),
                               np.asarray(b.state.positions), atol=1e-12)
