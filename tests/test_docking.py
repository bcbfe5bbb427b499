"""Docking scorer tests: setup culling, pose enumeration, batched scoring."""
import numpy as np
import pytest

from molchanica_tpu.docking import (
    BindingEnergy,
    DockingSetup,
    DockingSite,
    init_poses,
    score_poses,
)
from molchanica_tpu.molecules.spec import MolSpec


def _shell_receptor(radius=6.0, n=60):
    """Spherical shell of carbon-like atoms — a synthetic pocket."""
    i = np.arange(n) + 0.5
    phi = np.arccos(1 - 2 * i / n)
    theta = np.pi * (1 + 5 ** 0.5) * i
    pos = radius * np.stack([np.sin(phi) * np.cos(theta),
                             np.sin(phi) * np.sin(theta), np.cos(phi)], -1)
    return MolSpec(
        masses=np.full(n, 12.01), charges=np.zeros(n),
        lj_sigma=np.full(n, 3.4), lj_eps=np.full(n, 0.1),
        positions=pos)


def _ligand(n=5):
    pos = np.zeros((n, 3))
    pos[:, 0] = np.arange(n) * 1.5
    return MolSpec(
        masses=np.full(n, 12.01), charges=np.zeros(n),
        lj_sigma=np.full(n, 3.4), lj_eps=np.full(n, 0.1),
        positions=pos)


def test_setup_culls_to_site():
    rec = _shell_receptor()
    far = MolSpec(
        masses=np.full(10, 12.01), charges=np.zeros(10),
        lj_sigma=np.full(10, 3.4), lj_eps=np.full(10, 0.1),
        positions=np.full((10, 3), 50.0))
    both = MolSpec(
        masses=np.concatenate([rec.masses, far.masses]),
        charges=np.concatenate([rec.charges, far.charges]),
        lj_sigma=np.concatenate([rec.lj_sigma, far.lj_sigma]),
        lj_eps=np.concatenate([rec.lj_eps, far.lj_eps]),
        positions=np.concatenate([rec.positions, far.positions]))
    setup = DockingSetup.new(both, DockingSite((0.0, 0.0, 0.0), 8.0))
    assert setup.n_rec_real == 60  # far atoms culled


def test_init_poses_budget():
    lig = _ligand()
    poses = init_poses(lig.positions, (0, 0, 0), site_radius=6.0,
                       n_grid=4, n_orientations=10)
    # grid offsets within the sphere x orientations
    assert poses.ndim == 3 and poses.shape[1:] == (5, 3)
    assert len(poses) > 100


def test_scoring_prefers_centered_pose():
    rec = _shell_receptor(radius=6.0)
    lig = _ligand(3)
    setup = DockingSetup.new(rec, DockingSite((0.0, 0.0, 0.0), 8.0))
    centered = lig.positions - lig.positions.mean(0)          # inside pocket
    clashed = centered + np.array([6.0, 0.0, 0.0])            # on the shell
    outside = centered + np.array([40.0, 0.0, 0.0])           # far away
    poses = np.stack([centered, clashed, outside]).astype(np.float32)
    be = score_poses(setup, lig, poses, batch_size=4)
    assert isinstance(be, BindingEnergy)
    assert np.isinf(be.total[1])            # clash culled
    assert be.total[0] < be.total[2]        # pocket beats vacuum
    assert abs(be.total[2]) < 1e-3          # far pose ~ no interaction


def test_torsion_enumeration():
    from molchanica_tpu.docking.poses import apply_torsion
    lig = _ligand(4)
    lig.positions = lig.positions.copy()
    lig.positions[3] += np.array([0.0, 1.2, 0.0])  # off the rotation axis
    rotated = apply_torsion(lig.positions, (1, 2), [3], np.pi / 2)
    # bond lengths preserved
    d0 = np.linalg.norm(lig.positions[3] - lig.positions[2])
    d1 = np.linalg.norm(rotated[3] - rotated[2])
    np.testing.assert_allclose(d0, d1, rtol=1e-10)
    assert not np.allclose(rotated[3], lig.positions[3])
    np.testing.assert_allclose(rotated[:3], lig.positions[:3])
