"""TRR round trip + SnapshotViewer playback model."""
import numpy as np

from molchanica_tpu.io.trr import TrrFrame, read_trr, write_trr
from molchanica_tpu.md.snapshot import Snapshot
from molchanica_tpu.md.trajectory import FrameSlice, Trajectory
from molchanica_tpu.md.viewer import SnapshotViewer


def _frames(n=5, atoms=17, seed=0, vel=True):
    rng = np.random.default_rng(seed)
    out = []
    for k in range(n):
        out.append(TrrFrame(
            step=k * 100, time_ps=k * 0.2,
            box_extent=np.array([25.0, 26.0, 27.0]),
            positions=rng.uniform(0, 25, (atoms, 3)),
            velocities=rng.normal(0, 5, (atoms, 3)) if vel else None))
    return out


def test_trr_roundtrip_f32():
    frames = _frames()
    data = write_trr(frames)
    back = read_trr(data)
    assert len(back) == len(frames)
    for a, b in zip(frames, back):
        assert a.step == b.step
        np.testing.assert_allclose(a.time_ps, b.time_ps, rtol=1e-6)
        np.testing.assert_allclose(a.box_extent, b.box_extent, rtol=1e-6)
        np.testing.assert_allclose(a.positions, b.positions, atol=2e-5)
        np.testing.assert_allclose(a.velocities, b.velocities, atol=2e-5)


def test_trr_roundtrip_double_novel():
    frames = _frames(n=3, vel=False)
    data = write_trr(frames, double=True)
    back = read_trr(data)
    for a, b in zip(frames, back):
        np.testing.assert_allclose(a.positions, b.positions, atol=1e-12)
        assert b.velocities is None


def test_trr_layout_spot_values(tmp_path):
    """Check the binary layout directly: magic, natoms, nm scaling."""
    import struct
    fr = _frames(n=1, atoms=3)[0]
    data = write_trr([fr])
    magic, = struct.unpack_from(">i", data, 0)
    assert magic == 1993
    # header: 8 + string(4+4+13pad->16... ) — find natoms by known offset:
    # magic(4) version(4) + xdr string(8+16) + 10 ints(40) = natoms offset
    slen = struct.unpack_from(">i", data, 8)[0]
    pad = (4 - (slen % 4)) % 4
    off = 8 + 8 + slen + pad + 40
    natoms, = struct.unpack_from(">i", data, off)
    assert natoms == 3


def test_trajectory_trr_open(tmp_path):
    p = str(tmp_path / "t.trr")
    write_trr(_frames(n=4, atoms=8), p)
    traj = Trajectory.open(p)
    assert traj.n_frames == 4
    snaps = traj.load_snaps(FrameSlice(start=1, stop=4, step=2))
    assert len(snaps) == 2
    assert snaps[0].atom_posits.shape == (8, 3)


def test_trajectory_save_trr(tmp_path):
    rng = np.random.default_rng(1)
    snaps = [Snapshot(time=k * 0.1, atom_posits=rng.uniform(0, 9, (5, 3)))
             for k in range(3)]
    traj = Trajectory.from_memory(snaps)
    p = str(tmp_path / "o.trr")
    traj.save_trr(p, box_extent=np.array([9.0] * 3))
    back = read_trr(p)
    assert len(back) == 3
    np.testing.assert_allclose(back[2].positions, snaps[2].atom_posits,
                               atol=2e-6)


def test_viewer_playback():
    snaps = [Snapshot(time=k * 0.5, atom_posits=np.zeros((2, 3)))
             for k in range(10)]
    v = SnapshotViewer()
    v.load_snapshots(snaps)
    assert v.current_snapshot == 0
    v.change_snapshot(4)
    assert v.get_active_snap().time == 2.0
    v.playback_ratio = 10.0          # 10 snaps / s
    v.play()
    assert v.tick(0.05) is None      # below one period
    assert v.tick(0.06) == 5         # crossed one period
    assert v.tick(1.0) == (5 + 10) % 10   # wraps
    v.pause()
    assert v.tick(5.0) is None
    assert v.frame_at_time(3.4) == 7


def test_viewer_load_trajectory(tmp_path):
    p = str(tmp_path / "t.trr")
    write_trr(_frames(n=6, atoms=4), p)
    v = SnapshotViewer().load_trajectory(p)
    assert len(v.snapshots) == 6
    assert v.get_active_snap().atom_posits.shape == (4, 3)
