"""Spatial domain decomposition over the 8-device CPU mesh
(SURVEY §2.4/§7 stage 10; VERDICT round-2 item 6)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from molchanica_tpu.parallel.spatial import (make_spatial_force_fn,
                                             partition_slabs,
                                             spatial_reference_force)


@pytest.fixture(scope="module")
def system():
    rng = np.random.default_rng(5)
    n = 800
    box = np.array([48.0, 16.0, 16.0])    # long x axis: 8 slabs of 6 A
    x = rng.uniform(0, 1, (n, 3)) * box
    q = rng.normal(0, 0.3, n)
    sig = rng.uniform(1.2, 1.7, n)        # sigma/2
    eps = rng.uniform(0.1, 0.6, n)        # 2 sqrt(eps)
    return x, q, sig, eps, box


def test_spatial_forces_match_single_device(system):
    x, q, sig, eps, box = system
    n_dev = len(jax.devices())
    assert n_dev == 8
    mesh = Mesh(np.array(jax.devices()), ("x",))
    rc = 5.5                               # < slab width 6
    xs, mask, owner = partition_slabs(x, box, n_dev)
    cap = xs.shape[1]

    def grp(a):
        out = np.zeros((n_dev, cap), np.float32)
        for d in range(n_dev):
            ids = owner[d][owner[d] >= 0]
            out[d, :len(ids)] = a[ids]
        return jnp.asarray(out)

    qs, ss, es = grp(q), grp(sig), grp(eps)
    fn = jax.jit(make_spatial_force_fn(mesh, "x", box, rc))
    e_sh, f_sh = fn(jnp.asarray(xs), jnp.asarray(mask), qs, ss, es)
    e_sh = np.asarray(e_sh)
    assert np.allclose(e_sh, e_sh[0])      # psum total equal on all shards

    # single-device dense reference on the SAME wrapped coordinates
    flat_ids = owner.reshape(-1)
    keep = flat_ids >= 0
    x_flat = np.asarray(xs).reshape(-1, 3)
    m_flat = np.asarray(mask).reshape(-1)
    e_ref, f_ref = spatial_reference_force(
        jnp.asarray(x_flat), jnp.asarray(m_flat),
        grp(q).reshape(-1), grp(sig).reshape(-1), grp(eps).reshape(-1),
        box, rc)
    assert abs(float(e_sh[0]) - float(e_ref)) / abs(float(e_ref)) < 1e-5

    f_sh_flat = np.asarray(f_sh).reshape(-1, 3)
    f_ref = np.asarray(f_ref)
    scale = np.abs(f_ref).max()
    d = np.abs(f_sh_flat[keep] - f_ref[keep]).max()
    assert d / scale < 1e-5, f"force mismatch {d/scale:.2e}"


def test_partition_slabs_roundtrip(system):
    x, q, sig, eps, box = system
    xs, mask, owner = partition_slabs(x, box, 8)
    ids = owner[owner >= 0]
    assert sorted(ids.tolist()) == list(range(len(x)))
    # every owned atom sits inside its slab
    w = box[0] / 8
    for d in range(8):
        own = owner[d] >= 0
        if own.any():
            assert (xs[d, own, 0] >= d * w - 1e-5).all()
            assert (xs[d, own, 0] <= (d + 1) * w + 1e-5).all()


def test_spatial_md_run_one_sim_over_mesh():
    """Sharded MD of ONE system: 8 slabs, halo forces every step, host
    re-partition (atom migration) at the rebuild cadence. Temperature
    must stay physical and atoms must actually migrate between slabs."""
    import jax
    from molchanica_tpu.parallel.spatial import (partition_slabs,
                                                 spatial_md_run)
    from jax.sharding import Mesh

    n_dev = 8
    devices = np.array(jax.devices()[:n_dev])
    mesh = Mesh(devices, ("x",))
    rng = np.random.default_rng(3)
    rc = 6.0
    box = np.array([8.0 * n_dev, 14.0, 14.0])
    # dilute LJ gas on a jittered lattice: spacing >= 4 A > sigma so the
    # start sits in the attractive basin, not on the repulsive wall
    gx, gy, gz = np.meshgrid(np.linspace(2, box[0] - 2, 15),
                             np.linspace(2, box[1] - 2, 4),
                             np.linspace(2, box[2] - 2, 3), indexing="ij")
    x0 = np.stack([gx, gy, gz], -1).reshape(-1, 3)
    n = len(x0)
    x0 = x0 + rng.uniform(-0.15, 0.15, x0.shape)
    masses = np.full(len(x0), 39.9, np.float32)          # argon
    q = np.zeros(n, np.float32)
    sig = np.full(n, 3.4 / 2, np.float32)          # sigma/2 convention
    eps = np.full(n, 2 * np.sqrt(0.24), np.float32)
    v0 = rng.normal(0, 0.25, (n, 3)).astype(np.float32)

    slab_before = partition_slabs(x0, box, n_dev)[2]
    x1, v1, kes = spatial_md_run(
        x0.copy(), v0.copy(), masses, q, sig, eps, box, mesh, "x",
        rc=rc, dt=0.002, n_steps=60, rebuild_every=10,
        gamma=2.0, temp_target=120.0, seed=1)

    assert np.isfinite(x1).all() and np.isfinite(v1).all()
    assert len(kes) == 6 and np.isfinite(kes).all()
    # temperature from the psum'd KE: physical (not frozen, not exploded)
    from molchanica_tpu.constants import KB
    t_fin = 2.0 * kes[-1] / (3.0 * n * KB)
    assert 20.0 < t_fin < 600.0, t_fin
    # atoms moved, and at least one atom changed slab ownership
    assert np.abs(x1 - x0).max() > 0.05
    slab_after = partition_slabs(x1, box, n_dev)[2]

    def owner_map(owner):
        m = {}
        for dd in range(owner.shape[0]):
            for a in owner[dd]:
                if a >= 0:
                    m[int(a)] = dd
        return m

    before, after = owner_map(slab_before), owner_map(slab_after)
    assert any(before[a] != after[a] for a in before), \
        "no atom migrated between slabs in 60 steps"


@pytest.mark.heavy
def test_spatial_pme_matches_single_device():
    """Full-PME spatial force: erfc direct over halos + replicated-grid
    reciprocal (autodiff through all_gather) must match a single-device
    evaluation of the identical Ewald sum."""
    from molchanica_tpu.constants import COULOMB_CONST
    from molchanica_tpu.ops.pme2 import make_pme2_recip_fn
    from molchanica_tpu.parallel.spatial import (_pair_energy_force,
                                                 make_spatial_force_fn,
                                                 partition_slabs)

    rng = np.random.default_rng(11)
    n_dev = 8
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("x",))
    box = np.array([48.0, 16.0, 16.0])
    rc = 5.5
    beta = 0.45
    # ionic lattice with jitter (no deep clashes: clash-scale forces
    # amplify f32 reduction-order noise and would swamp the parity gate)
    gx, gy, gz = np.meshgrid(np.linspace(1.5, box[0] - 2, 13),
                             np.linspace(1.5, box[1] - 2, 4),
                             np.linspace(1.5, box[2] - 2, 4),
                             indexing="ij")
    x = np.stack([gx, gy, gz], -1).reshape(-1, 3)
    x = x + rng.uniform(-0.4, 0.4, x.shape)
    n = len(x)
    q = np.where(np.arange(n) % 2 == 0, 0.5, -0.5).astype(np.float32)
    sig = np.full(n, 1.6, np.float32)
    eps = np.full(n, 0.6, np.float32)

    xs, mask, owner = partition_slabs(x, box, n_dev)
    cap = xs.shape[1]

    def grp(a):
        out = np.zeros((n_dev, cap), np.float32)
        for d in range(n_dev):
            ids = owner[d][owner[d] >= 0]
            out[d, :len(ids)] = a[ids]
        return jnp.asarray(out)

    grid = (16, 16, 16)
    fn = jax.jit(make_spatial_force_fn(mesh, "x", box, rc, beta=beta,
                                       pme_grid=grid))
    e_sh, f_sh = fn(jnp.asarray(xs), jnp.asarray(mask), grp(q), grp(sig),
                    grp(eps))
    e_sh = np.asarray(e_sh)
    assert np.allclose(e_sh, e_sh[0], rtol=1e-6)

    # single-device reference: same erfc direct + same recip + self
    x_flat = jnp.asarray(np.asarray(xs).reshape(-1, 3))
    m_flat = jnp.asarray(np.asarray(mask).reshape(-1))
    qf = grp(q).reshape(-1)
    qk = qf * np.sqrt(COULOMB_CONST)
    sf = grp(sig).reshape(-1)
    ef = grp(eps).reshape(-1)
    e_dir, f_dir = _pair_energy_force(
        x_flat, m_flat, x_flat, m_flat, qk, qk, sf, sf, ef, ef,
        jnp.asarray(box, jnp.float32), rc, beta=beta)
    recip = make_pme2_recip_fn(grid, beta)
    q_real = qf * (m_flat > 0)
    e_rec, fr_neg = jax.value_and_grad(
        lambda xx: recip(xx, q_real, jnp.asarray(box, jnp.float32)))(
        x_flat)
    e_self = -beta / np.sqrt(np.pi) * COULOMB_CONST \
        * float(jnp.sum(q_real * q_real))
    e_ref = float(e_dir) + float(e_rec) + e_self
    f_ref = np.asarray(f_dir) - np.asarray(fr_neg)

    assert abs(float(e_sh[0]) - e_ref) / abs(e_ref) < 1e-5, \
        (float(e_sh[0]), e_ref)
    keep = owner.reshape(-1) >= 0
    f_sh_flat = np.asarray(f_sh).reshape(-1, 3)
    scale = np.abs(f_ref).max()
    d = np.abs(f_sh_flat[keep] - f_ref[keep]).max()
    assert d / scale < 2e-5, f"PME spatial force mismatch {d/scale:.2e}"


@pytest.mark.heavy
def test_spatial_md_run_with_pme():
    """Sharded MD with full PME electrostatics: a jittered ionic lattice
    stays bound and thermal over a short NVT run."""
    from molchanica_tpu.constants import KB
    from molchanica_tpu.parallel.spatial import spatial_md_run

    n_dev = 8
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("x",))
    rng = np.random.default_rng(7)
    box = np.array([48.0, 14.0, 14.0])
    gx, gy, gz = np.meshgrid(np.linspace(2, box[0] - 2, 12),
                             np.linspace(2, box[1] - 2, 3),
                             np.linspace(2, box[2] - 2, 3), indexing="ij")
    x0 = np.stack([gx, gy, gz], -1).reshape(-1, 3)
    x0 = x0 + rng.uniform(-0.2, 0.2, x0.shape)
    n = len(x0)
    q = np.where(np.arange(n) % 2 == 0, 0.4, -0.4).astype(np.float32)
    masses = np.full(n, 30.0, np.float32)
    sig = np.full(n, 1.55, np.float32)
    eps = np.full(n, 0.7, np.float32)
    v0 = np.zeros((n, 3), np.float32)

    x1, v1, kes = spatial_md_run(
        x0.copy(), v0, masses, q, sig, eps, box, mesh, "x",
        rc=5.5, dt=0.002, n_steps=40, rebuild_every=10,
        gamma=2.0, temp_target=150.0, seed=2,
        beta=0.45, pme_grid=(16, 16, 16))
    assert np.isfinite(x1).all() and np.isfinite(v1).all()
    t_fin = 2.0 * kes[-1] / (3.0 * n * KB)
    assert 10.0 < t_fin < 800.0, t_fin
