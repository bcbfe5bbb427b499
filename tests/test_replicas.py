"""Replica farm: batched lambda windows sharded over the virtual CPU mesh."""
import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from molchanica_tpu.md.config import Integrator, MdConfig
from molchanica_tpu.md.engine import MdSim
from molchanica_tpu.molecules.spec import MolSpec, assemble_system
from molchanica_tpu.parallel import ReplicaFarm


@pytest.fixture(scope="module")
def lj_bath_sim():
    rng = np.random.default_rng(1)
    baths = [MolSpec(masses=[39.9], charges=[0.0], lj_sigma=[3.3],
                     lj_eps=[0.25], positions=rng.uniform(0, 12, (1, 3)))
             for _ in range(20)]
    solute = MolSpec(masses=[39.9], charges=[0.0], lj_sigma=[3.3],
                     lj_eps=[0.25], positions=np.array([[6.0, 6.0, 6.0]]))
    asys = assemble_system([solute] + baths, box_extent=np.array([12.0] * 3),
                           alchemical_mol=0)
    cfg = MdConfig(integrator=Integrator.langevin_middle(gamma=2.0),
                   temp_target=120.0, lj_cutoff=5.0, coulomb_cutoff=5.0,
                   dtype="float32", max_init_relaxation_iters=100,
                   zero_com_drift=False, seed=3)
    return MdSim(asys.topology, cfg, asys.positions,
                 box_extent=asys.box_extent, method="allpairs_cutoff")


@pytest.mark.heavy
def test_replica_farm_sharded(lj_bath_sim):
    devices = np.array(jax.devices()[:8])
    mesh = Mesh(devices, axis_names=("replica",))
    lams = np.linspace(0.0, 1.0, 8)
    farm = ReplicaFarm(lj_bath_sim, 8, couples=1.0 - lams, mesh=mesh, seed=1)
    e = farm.step(0.002, 5, record_dhdl=True)
    assert e.shape == (8,)
    assert np.isfinite(e).all()
    # replica axis is actually sharded over the mesh
    assert len(farm.x.sharding.device_set) == 8
    wins = farm.windows()
    assert len(wins) == 8
    np.testing.assert_allclose([w.lam for w in wins], lams, atol=1e-6)
    # fully-decoupled window (lam=1): solute sees nothing; dH/dl finite
    assert all(np.isfinite(w.mean) for w in wins)


@pytest.mark.heavy
def test_replica_divergence(lj_bath_sim):
    """Different couples -> different trajectories/energies."""
    farm = ReplicaFarm(lj_bath_sim, 4, couples=[1.0, 0.6, 0.3, 0.0], seed=2)
    farm.step(0.002, 10)
    x = np.asarray(farm.x)
    assert not np.allclose(x[0], x[3])
