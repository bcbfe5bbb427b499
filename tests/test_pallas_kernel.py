"""Pallas direct-force kernel logic validation (interpret mode on CPU).

The compiled kernel is additionally cross-validated against the XLA path on
real TPU hardware by the verify-skill drive scripts; this test guards the
kernel math and the cell-plan/rebuild machinery platform-independently.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.special import erfc as s_erfc

import molchanica_tpu.ops.pallas.direct_force as DF
from molchanica_tpu.constants import COULOMB_CONST
from molchanica_tpu.md.config import MdConfig
from molchanica_tpu.topology import make_topology


@pytest.fixture(scope="module")
def system():
    rng = np.random.default_rng(1)
    box = np.array([28.0, 28.0, 28.0])
    n = 400
    pos = rng.uniform(0, 1, (n, 3)) * box
    q = rng.normal(size=n) * 0.3
    q -= q.mean()
    sig = rng.uniform(2.5, 3.5, n)
    eps = rng.uniform(0.05, 0.3, n)
    npad = 512
    top = make_topology(np.ones(n) * 12, q, sig, eps,
                        pad_atoms_to=npad, dtype=jnp.float32)
    x = np.full((npad, 3), 1e6, np.float32)
    x[:n] = pos
    return top, x, box, q, sig, eps, n


def test_kernel_matches_dense(system):
    top, x, box, q, sig, eps, n = system
    cfg = MdConfig(lj_cutoff=9.0, coulomb_cutoff=9.0, dtype="float32")
    plan = DF.plan_window(box, 9.0, n, top.n_atoms, x0=x)
    rebuild = DF.make_rebuild_fn(plan, top.atom_mask)
    xj = jnp.asarray(x)
    bj = jnp.asarray(box, jnp.float32)
    sa, inv, ovf = jax.jit(rebuild)(xj, bj)
    assert int(ovf) == 0
    pdir = DF.make_pallas_direct_fn(top, cfg, plan, interpret=True)
    beta = 0.35
    F, elj, ec, _ = pdir(xj, bj, jnp.asarray(1.0, jnp.float32), beta, sa, inv)

    pos = x[:n].astype(np.float64)
    d = pos[:, None, :] - pos[None, :, :]
    d -= box * np.round(d / box)
    r2 = (d * d).sum(-1)
    np.fill_diagonal(r2, np.inf)
    m = r2 < 81.0
    s = 0.5 * (sig[:, None] + sig[None, :])
    e4 = 4 * np.sqrt(eps[:, None] * eps[None, :])
    s6 = (s * s / np.maximum(r2, 1e-4)) ** 3
    ref_lj = 0.5 * np.where(
        m, np.clip(e4 * (s6 * s6 - s6), -DF.LJ_CLIP, DF.LJ_CLIP), 0).sum()
    r = np.sqrt(np.maximum(r2, 1e-4))
    ref_c = 0.5 * np.where(
        m, COULOMB_CONST * q[:, None] * q[None, :] * s_erfc(beta * r) / r,
        0).sum()
    np.testing.assert_allclose(float(elj), ref_lj, rtol=2e-4)
    np.testing.assert_allclose(float(ec), ref_c, rtol=2e-4)

    # forces: compare against the analytic dense gradient
    e_lj_raw = e4 * (s6 * s6 - s6)
    unclipped = np.abs(e_lj_raw) < DF.LJ_CLIP
    coeff_lj = np.where(m & unclipped, e4 * (12 * s6 * s6 - 6 * s6)
                        / np.maximum(r2, 1e-4), 0.0)
    x_ = beta * r
    coeff_c = np.where(m, COULOMB_CONST * q[:, None] * q[None, :] * (
        s_erfc(x_) / r + 2 * beta / np.sqrt(np.pi) * np.exp(-x_ * x_))
        / np.maximum(r2, 1e-4), 0.0)
    # F_i = sum_j (coeff_lj + coeff_c) * d_ij  (repulsive positive along d)
    ref_F = ((coeff_lj + coeff_c)[:, :, None] * d).sum(axis=1)
    Fn = np.asarray(F)[:n]
    np.testing.assert_allclose(Fn, ref_F, rtol=2e-3, atol=2e-3)


def test_kernel_wrapped_positions(system):
    """Atoms drifted outside the box must still interact correctly."""
    top, x, box, q, sig, eps, n = system
    cfg = MdConfig(lj_cutoff=9.0, coulomb_cutoff=9.0, dtype="float32")
    plan = DF.plan_window(box, 9.0, n, top.n_atoms, x0=x)
    rebuild = DF.make_rebuild_fn(plan, top.atom_mask)
    pdir = DF.make_pallas_direct_fn(top, cfg, plan, interpret=True)
    bj = jnp.asarray(box, jnp.float32)
    c1 = jnp.asarray(1.0, jnp.float32)
    sa, inv, _ = jax.jit(rebuild)(jnp.asarray(x), bj)
    _, e0, c0, _ = pdir(jnp.asarray(x), bj, c1, 0.35, sa, inv)
    x2 = x.copy()
    x2[:n] += box * np.array([1.0, -2.0, 3.0])  # whole-box translations
    sa2, inv2, _ = jax.jit(rebuild)(jnp.asarray(x2), bj)
    _, e1, c1_, _ = pdir(jnp.asarray(x2), bj, c1, 0.35, sa2, inv2)
    np.testing.assert_allclose(float(e0), float(e1), rtol=1e-5)
    np.testing.assert_allclose(float(c0), float(c1_), rtol=1e-5)
