"""Cell-window direct-space validation against dense references, and
solvated-water dynamics smoke tests (SETTLE + M-site + PME)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.special import erfc

from molchanica_tpu.constants import COULOMB_CONST
from molchanica_tpu.md.config import HydrogenConstraint, Integrator, MdConfig
from molchanica_tpu.ops.cells import bin_atoms, make_cell_direct_space_fn, plan_cells
from molchanica_tpu.topology import make_topology


def _random_system(n, box, seed=0, charged=True):
    rng = np.random.default_rng(seed)
    pos = rng.uniform(0, 1, (n, 3)) * box
    q = rng.normal(size=n) * 0.3 if charged else np.zeros(n)
    if charged:
        q -= q.mean()
    sig = rng.uniform(2.5, 3.5, n)
    eps = rng.uniform(0.05, 0.3, n)
    top = make_topology(np.ones(n) * 12.0, q, sig, eps, dtype=jnp.float64)
    return top, jnp.asarray(pos), q, sig, eps


def _dense_reference(pos, q, sig, eps, box, cutoff, beta):
    """f64 numpy dense LJ + erfc-Coulomb with min image and hard cutoff."""
    d = np.asarray(pos)[:, None, :] - np.asarray(pos)[None, :, :]
    d -= box * np.round(d / box)
    r2 = (d * d).sum(-1)
    np.fill_diagonal(r2, np.inf)
    from molchanica_tpu.ops.nonbonded import LJ_CLIP
    s = 0.5 * (sig[:, None] + sig[None, :])
    e = np.sqrt(eps[:, None] * eps[None, :])
    s6 = (s * s / np.maximum(r2, 1e-4)) ** 3
    elj = np.clip(4 * e * (s6 * s6 - s6), -LJ_CLIP, LJ_CLIP)
    r = np.sqrt(r2)
    ec = COULOMB_CONST * q[:, None] * q[None, :] * erfc(beta * r) / r
    m = r2 < cutoff * cutoff
    return 0.5 * elj[m].sum(), 0.5 * ec[m].sum()


def test_cell_window_matches_dense():
    box = np.array([30.0, 27.0, 33.0])
    n = 600
    top, pos, q, sig, eps = _random_system(n, box, seed=1)
    cfg = MdConfig(lj_cutoff=9.0, coulomb_cutoff=9.0, dtype="float64")
    fn = make_cell_direct_space_fn(top, cfg, box, x0=np.asarray(pos))
    beta = 0.35
    e_lj, e_c, ovf = fn(pos, jnp.asarray(box), jnp.asarray(1.0),
                        jnp.asarray(beta))
    assert int(ovf) == 0
    ref_lj, ref_c = _dense_reference(pos, q, sig, eps, box, 9.0, beta)
    np.testing.assert_allclose(float(e_lj), ref_lj, rtol=1e-9)
    np.testing.assert_allclose(float(e_c), ref_c, rtol=1e-9)


def test_cell_window_excludes_pairs():
    """Excluded pair contributions must vanish exactly (bitwise subtraction)."""
    box = np.array([24.0, 24.0, 24.0])
    n = 64
    rng = np.random.default_rng(3)
    pos = rng.uniform(0, 1, (n, 3)) * box
    q = rng.normal(size=n) * 0.2
    sig = np.full(n, 3.2); eps = np.full(n, 0.15)
    # exclude pair (0, 1) placed very close (bonded distance)
    pos[1] = pos[0] + np.array([1.0, 0.0, 0.0])
    top_ex = make_topology(np.ones(n), q, sig, eps,
                           exclusions=[(0, 1)], dtype=jnp.float64)
    top_no = make_topology(np.ones(n), q, sig, eps,
                           exclusions=[], dtype=jnp.float64)
    cfg = MdConfig(lj_cutoff=8.0, coulomb_cutoff=8.0, dtype="float64")
    f_ex = make_cell_direct_space_fn(top_ex, cfg, box, x0=pos)
    f_no = make_cell_direct_space_fn(top_no, cfg, box, x0=pos)
    args = (jnp.asarray(pos), jnp.asarray(box), jnp.asarray(1.0),
            jnp.asarray(0.35))
    lj_ex, c_ex, _ = f_ex(*args)
    lj_no, c_no, _ = f_no(*args)
    # dense reference for just the (0,1) pair
    r = 1.0
    s6 = (3.2 / r) ** 6
    pair_lj = 4 * 0.15 * (s6 * s6 - s6)
    pair_c = COULOMB_CONST * q[0] * q[1] * erfc(0.35 * r) / r
    np.testing.assert_allclose(float(lj_no) - float(lj_ex), pair_lj, rtol=1e-6)
    np.testing.assert_allclose(float(c_no) - float(c_ex), pair_c, rtol=1e-6)


def test_bin_atoms_no_overflow():
    box = np.array([30.0, 30.0, 30.0])
    n = 500
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.uniform(0, 1, (n, 3)) * box)
    nc, cap, _ = plan_cells(box, 9.0, n, 1.7)
    mask = jnp.ones(n)
    grid, overflow = bin_atoms(pos, jnp.asarray(box), mask, nc, cap)
    assert int(overflow) == 0
    # every atom appears exactly once
    g = np.asarray(grid).reshape(-1)
    assert sorted(g[g >= 0].tolist()) == list(range(n))


def test_full_coulomb_vs_dense_ewald_waterbox():
    """End-to-end electrostatics (window + PME + self + exclusions) vs a
    dense f64 Ewald reference with molecular exclusions — including the
    wrapped-stencil small-box case (18 A box, 8 A cutoff)."""
    from molchanica_tpu.md.engine import compute_energy_snapshot
    from molchanica_tpu.molecules.spec import assemble_system
    from molchanica_tpu.ops.pme import ewald_beta_for
    from molchanica_tpu.systems.water import OPC

    box = np.array([18.0, 18.0, 18.0])
    asys = assemble_system([], box_extent=box, water_model=OPC,
                           n_waters=60, seed=2)
    cfg = MdConfig(lj_cutoff=8.0, coulomb_cutoff=8.0, dtype="float64")
    t = compute_energy_snapshot(asys.topology, cfg, asys.positions, box,
                                method="cells_pme")
    assert t["cell_overflow"] == 0

    top = asys.topology
    n = top.n_atoms_real
    x = np.asarray(asys.positions)[:n]
    q = np.asarray(top.charges)[:n]
    mol = np.asarray(top.mol_id)[:n]
    beta = ewald_beta_for(8.0, cfg.ewald_rtol)
    d = x[:, None, :] - x[None, :, :]
    d -= box * np.round(d / box)
    r = np.sqrt((d * d).sum(-1)); np.fill_diagonal(r, np.inf)
    same = mol[:, None] == mol[None, :]
    e_dir = 0.5 * np.sum(np.where(
        (~same) & (r < 8.0),
        COULOMB_CONST * q[:, None] * q[None, :] * erfc(beta * r) / r, 0.0))
    mmax, vol, e_rec = 14, box.prod(), 0.0
    for mx in range(-mmax, mmax + 1):
        for my in range(-mmax, mmax + 1):
            for mz in range(-mmax, mmax + 1):
                if mx == my == mz == 0:
                    continue
                k = 2 * np.pi * np.array([mx, my, mz]) / box
                k2 = (k * k).sum()
                if k2 / (4 * beta ** 2) > 35:
                    continue
                s = (q * np.exp(1j * x @ k)).sum()
                e_rec += 4 * np.pi / k2 * np.exp(-k2 / (4 * beta ** 2)) * abs(s) ** 2
    e_rec *= COULOMB_CONST / (2 * vol)
    e_self = -beta / np.sqrt(np.pi) * COULOMB_CONST * np.sum(q * q)
    e_intra = 0.5 * np.sum(np.where(
        same & np.isfinite(r),
        COULOMB_CONST * q[:, None] * q[None, :] * (1 - erfc(beta * r)) / r,
        0.0))
    ref = e_dir + e_rec + e_self - e_intra
    # |ref| here is ~1 kcal/mol (random orientations) but it's a difference
    # of ~12000-scale terms; compare on that scale (PME spline error ~1e-4)
    assert abs(t["coulomb"] - ref) < 3.0, (t["coulomb"], ref)


@pytest.fixture(scope="module")
def water_box():
    """60-water OPC box (18 A — exercises the wrapped stencil), cells+PME."""
    from molchanica_tpu.molecules.spec import assemble_system
    from molchanica_tpu.systems.water import OPC
    box = np.array([18.0, 18.0, 18.0])
    asys = assemble_system([], box_extent=box, water_model=OPC,
                           n_waters=60, seed=2)
    return asys, box


@pytest.fixture(scope="module")
def water_sim(water_box):
    from molchanica_tpu.md.engine import MdSim
    asys, box = water_box
    cfg = MdConfig(
        integrator=Integrator.langevin_middle(gamma=2.0),
        temp_target=300.0, lj_cutoff=8.0, coulomb_cutoff=8.0,
        dtype="float64", max_init_relaxation_iters=60,
        steps_per_chunk=15, seed=11,
    )
    sim = MdSim(asys.topology, cfg, asys.positions, box_extent=box,
                method="cells_pme")
    return sim


@pytest.mark.heavy
def test_water_box_energy_reasonable(water_box, water_sim):
    asys, box = water_box
    e0 = water_sim.potential_energy()
    n_w = asys.n_waters
    # after (short) relaxation, water should be bound and not absurd
    assert e0 / n_w < -1.0, e0 / n_w
    assert e0 / n_w > -25.0, e0 / n_w


@pytest.mark.heavy
def test_water_box_dynamics_stable(water_box, water_sim):
    asys, box = water_box
    sim = water_sim
    sim.step(0.002, 30)   # 2 fs steps under SETTLE
    t = sim.temperature()
    assert 100.0 < t < 600.0, t
    x = np.asarray(sim.state.positions)
    top = asys.topology
    # rigid geometry held
    w0 = top.water_start
    oh1 = np.linalg.norm(x[w0] - x[w0 + 1])
    from molchanica_tpu.systems.water import OPC
    np.testing.assert_allclose(oh1, OPC.r_oh, rtol=1e-5)
    # M-site on its virtual position
    import math
    w = OPC.vsite_weight
    m_expect = x[w0] + w * ((x[w0 + 1] - x[w0]) + (x[w0 + 2] - x[w0]))
    np.testing.assert_allclose(x[w0 + 3], m_expect, atol=1e-8)
    assert np.isfinite(x[:top.n_atoms_real]).all()
