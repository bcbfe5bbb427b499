"""High-level API parity: build_dynamics / launch_md / checkpoint / trajectory."""
import numpy as np
import pytest

from molchanica_tpu.md.config import (
    HydrogenConstraint,
    Integrator,
    MdConfig,
    SimBoxInit,
    Solvent,
)
from molchanica_tpu.md.dynamics import (
    MolDynamics,
    add_copies,
    build_dynamics,
    launch_md,
    run_dynamics_blocking,
)

ETHANOL_ELEMENTS = ["C", "C", "O", "H", "H", "H", "H", "H", "H"]
ETHANOL_POS = np.array([
    [0.0, 0.0, 0.0], [1.53, 0.0, 0.0], [2.0, 1.3, 0.0],
    [-0.4, 1.0, 0.0], [-0.4, -0.5, 0.9], [-0.4, -0.5, -0.9],
    [1.9, -0.5, 0.9], [1.9, -0.5, -0.9], [2.9, 1.3, 0.2]])


@pytest.fixture(scope="module")
def vacuum_sim():
    cfg = MdConfig(
        integrator=Integrator.langevin_middle(gamma=2.0),
        temp_target=300.0, dtype="float64",
        hydrogen_constraint=HydrogenConstraint.flexible(),
        max_init_relaxation_iters=150, zero_com_drift=False, seed=2)
    mol = MolDynamics(ff_mol_type="small_organic",
                      elements=ETHANOL_ELEMENTS, atom_posits=ETHANOL_POS)
    return build_dynamics([mol], cfg)


def test_build_dynamics_vacuum(vacuum_sim):
    assert vacuum_sim.method == "allpairs"
    snaps = run_dynamics_blocking(vacuum_sim, 0.001, 60,
                                  snapshot_interval=20)
    assert len(snaps) == 3
    assert snaps[-1].energy_data is not None


def test_launch_md_async(vacuum_sim):
    h = launch_md(vacuum_sim, 0.001, 40, snapshot_interval=20)
    snaps = h.join(timeout=300)
    assert not h.running
    assert h.step_count >= 100   # cumulative across tests


def test_add_copies_packing():
    from molchanica_tpu.molecules.spec import MolSpec
    spec = MolSpec(masses=np.full(3, 12.0), charges=np.zeros(3),
                   lj_sigma=np.full(3, 3.4), lj_eps=np.full(3, 0.1),
                   positions=np.array([[0.0, 0, 0], [1.5, 0, 0],
                                       [0, 1.5, 0]]))
    copies = add_copies(spec, 8, np.array([24.0, 24.0, 24.0]), seed=1)
    assert len(copies) == 8
    centers = np.stack([c.positions.mean(0) for c in copies])
    d = np.linalg.norm(centers[:, None] - centers[None, :], axis=-1)
    np.fill_diagonal(d, np.inf)
    assert d.min() > 4.0   # separated


@pytest.mark.heavy
def test_checkpoint_roundtrip(tmp_path, vacuum_sim):
    from molchanica_tpu.md.checkpoint import load_checkpoint, save_checkpoint
    sim = vacuum_sim
    sim.step(0.001, 10)
    p = tmp_path / "ck.npz"
    save_checkpoint(p, sim, extra={"note": "test"})
    x_ref = np.asarray(sim.state.positions).copy()
    step_ref = int(sim.state.step)
    sim.step(0.001, 10)   # advance past the checkpoint
    load_checkpoint(p, sim)
    np.testing.assert_array_equal(np.asarray(sim.state.positions), x_ref)
    assert int(sim.state.step) == step_ref
    # resumed run proceeds
    sim.step(0.001, 5)
    assert int(sim.state.step) == step_ref + 5


def test_trajectory_roundtrip(tmp_path, vacuum_sim):
    from molchanica_tpu.md.trajectory import FrameSlice, Trajectory
    sim = vacuum_sim
    sim.snapshots.clear()
    sim.run(0.001, 60, snapshot_interval=20)
    traj = Trajectory.from_memory(sim.snapshots)
    assert traj.n_frames == 3
    p = tmp_path / "t.dcd"
    traj.save_dcd(p, box_extent=np.array([50.0, 50.0, 50.0]))
    t2 = Trajectory.open(p)
    snaps = t2.load_snaps(FrameSlice(start=1))
    assert len(snaps) == 2
    np.testing.assert_allclose(
        snaps[-1].atom_posits,
        traj.snapshots[-1].atom_posits[:len(snaps[-1].atom_posits)],
        atol=1e-4)
